"""Parity for the SimpleViT-based alternative zoo (vit_sac_network.py).

The reference's simple_vit.py imports `visualizer` (a bytecode-rewriting
tool whose `bytecode` dependency isn't installed); a no-op stub with the same
decorator API is injected so the reference modules import unmodified."""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dgvit_tpu.models import SimpleViT
from dgvit_tpu.models.policies import ViTGaussianPolicy, ViTQNetwork
from dgvit_tpu.models.torch_io import (
    _conv,
    _layernorm,
    _linear,
    _np,
)


@pytest.fixture(scope="module")
def ref_vit(reference_modules):
    """Import simple_vit/vit_sac_network with a stubbed visualizer."""
    if "visualizer" not in sys.modules:
        stub = types.ModuleType("visualizer")

        def get_local(name):
            def deco(fn):
                return fn
            return deco

        get_local.is_activate = False
        stub.get_local = get_local
        sys.modules["visualizer"] = stub
    import simple_vit
    import vit_sac_network
    return simple_vit, vit_sac_network


def simple_vit_params_from_torch(sd, prefix="trans.", depth=2):
    """Map simple_vit.py module paths onto our SimpleViT tree."""
    p = {"patch_embed": _linear(sd, prefix + "to_patch_embedding.1")}
    blocks = {}
    for i in range(depth):
        lp = f"{prefix}transformer.layers.{i}."
        blocks[f"block_{i}"] = {
            "attn_norm": _layernorm(sd, lp + "0.norm"),
            "attn": {
                "to_qkv": _linear(sd, lp + "0.to_qkv", bias=False),
                "to_out": _linear(sd, lp + "0.to_out", bias=False),
            },
            "ff": {
                "norm": _layernorm(sd, lp + "1.net.0"),
                "fc1": _linear(sd, lp + "1.net.1"),
                "fc2": _linear(sd, lp + "1.net.3"),
            },
        }
    p["transformer"] = blocks
    p["norm_out"] = _layernorm(sd, prefix + "layer_norm")
    return p


def test_simple_vit_trunk_parity(ref_vit):
    import torch

    simple_vit, _ = ref_vit
    torch.manual_seed(0)
    tv = simple_vit.SimpleViT(
        image_size=(128, 160), patch_size=(16, 20), num_classes=2,
        dim=256, depth=2, heads=8, mlp_dim=2048, channels=4).eval()
    obs = np.random.default_rng(0).random((2, 4, 128, 160)).astype(np.float32)

    with torch.no_grad():
        t_out = tv.forward(torch.tensor(obs)).numpy()

    params = simple_vit_params_from_torch(tv.state_dict(), prefix="", depth=2)
    model = SimpleViT(dim=256, depth=2, heads=8, mlp_dim=2048, channels=4,
                      attn_impl="xla")
    j_out = model.apply({"params": params}, jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=3e-5, rtol=1e-4)


def test_vit_policy_parity(ref_vit):
    import torch

    _, vit_sac = ref_vit
    torch.manual_seed(1)
    tp = vit_sac.GaussianTransformerPolicy(2, 2).eval()
    obs = np.random.default_rng(1).random((2, 4, 128, 160)).astype(np.float32)
    goal = np.random.default_rng(2).random((2, 2)).astype(np.float32)

    with torch.no_grad():
        t_mean, t_logstd = tp.forward([torch.tensor(obs), torch.tensor(goal)])

    sd = tp.state_dict()
    params = {
        "trans": simple_vit_params_from_torch(sd, "trans.", depth=2),
        "fc_embed": _linear(sd, "fc_embed"),
        "fc1": _linear(sd, "fc1"),
        "fc2": _linear(sd, "fc2"),
        "mean_linear": _linear(sd, "mean_linear"),
        "log_std_linear": _linear(sd, "log_std_linear"),
    }
    model = ViTGaussianPolicy(attn_impl="xla")
    j_mean, j_logstd = model.apply({"params": params}, jnp.asarray(obs),
                                   jnp.asarray(goal))
    np.testing.assert_allclose(np.asarray(j_mean), t_mean.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_logstd), t_logstd.numpy(),
                               atol=3e-5, rtol=1e-4)


def test_vit_deterministic_policy_parity(ref_vit):
    """vit_sac_network.DeterministicTransformerPolicy (:375-441) vs
    ViTDeterministicPolicy: transplanted weights, identical actions."""
    import torch

    from dgvit_tpu.models.policies import ViTDeterministicPolicy

    _, vit_sac = ref_vit
    torch.manual_seed(3)
    tp = vit_sac.DeterministicTransformerPolicy(2, 2).eval()
    obs = np.random.default_rng(3).random((2, 4, 128, 160)).astype(np.float32)
    goal = np.random.default_rng(4).random((2, 2)).astype(np.float32)

    with torch.no_grad():
        t_act = tp.forward([torch.tensor(obs), torch.tensor(goal)]).numpy()

    sd = tp.state_dict()
    params = {
        "trans": simple_vit_params_from_torch(sd, "trans.", depth=2),
        "fc_embed": _linear(sd, "fc_embed"),
        "fc1": _linear(sd, "fc1"),
        "fc2": _linear(sd, "fc2"),
        "mean_linear": _linear(sd, "mean_linear"),
    }
    model = ViTDeterministicPolicy(attn_impl="xla")
    j_act = model.apply({"params": params}, jnp.asarray(obs),
                        jnp.asarray(goal))
    np.testing.assert_allclose(np.asarray(j_act), t_act, atol=3e-5, rtol=1e-4)
