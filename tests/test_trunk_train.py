"""Whole-trunk TRAIN-path kernel (ops/trunk_train.py): one recompute-
everything backward launch for blocks -> CLS pool -> final norm.

With DGVIT_TRUNK_GRAD=1, gradient-bearing GoT passes route through
`blocks_cls_forward_fused` (models/got.py `blocks_ok`), whose custom-vjp
backward is the single trunk kernel. (Default routing keeps the per-block
custom-vjp kernels for gradients — they measured faster on this chip,
BENCH.md round 3 — so these gates opt in explicitly.) The gates run the
REAL kernels in Pallas interpret mode on CPU (DGVIT_FUSED_INTERPRET=1) and
require the fused-path gradients to match the composed flax model's.

Reference anchor: DRL.py:373-437 (the SAC learn hot loop this accelerates).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvit_tpu.models.got import GoT

SMALL = dict(dim=64, depth=2, heads=2, dim_head=16, mlp_dim=64,
             emb_dropout=0.0, image_size=(32, 40), patch_size=(16, 20))
IH, IW = SMALL["image_size"]


def _setup(final_norm="rms", patch_mode="2d", batch=4, hw=None, **over):
    cfg = dict(SMALL, final_norm=final_norm, patch_mode=patch_mode, **over)
    got = GoT(**cfg)
    h, w = hw or (IH, IW)
    if patch_mode == "channels":
        img = jax.random.uniform(jax.random.PRNGKey(0), (batch, 2, h, w))
    else:
        img = jax.random.uniform(jax.random.PRNGKey(0), (batch, h, w))
    goal = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg["dim"]))
    params = got.init(jax.random.PRNGKey(2), img, goal)
    return got, params, img, goal


def _grads(got, params, img, goal, fused: bool):
    def loss(p, g):
        out = got.apply(p, img, g)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    if not fused:
        return jax.grad(loss, argnums=(0, 1))(params, goal)
    os.environ["DGVIT_FUSED_INTERPRET"] = "1"
    os.environ["DGVIT_TRUNK_GRAD"] = "1"
    try:
        return jax.grad(loss, argnums=(0, 1))(params, goal)
    finally:
        del os.environ["DGVIT_FUSED_INTERPRET"]
        del os.environ["DGVIT_TRUNK_GRAD"]


def _assert_close(g_out, g_ref, rtol=1e-4, atol=1e-4):
    flat_ref, tdef_ref = jax.tree_util.tree_flatten(g_ref)
    flat_out, tdef_out = jax.tree_util.tree_flatten(g_out)
    assert tdef_ref == tdef_out
    for a, b in zip(flat_out, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("final_norm", [
    "rms",
    pytest.param("layer", marks=pytest.mark.slow),  # OPT-IN path; rms (depth
    # 3, >1 reversed-loop iteration) is the default-tier gradient gate
])
def test_trunk_bwd_matches_composed(final_norm):
    """Full param-tree + goal gradients through the fused path (blocks
    kernel fwd, ONE trunk kernel bwd) vs the composed flax model. The rms
    case runs depth 3 so the reversed full-block loop iterates >1 time."""
    got, params, img, goal = _setup(final_norm=final_norm,
                                    depth=3 if final_norm == "rms" else 2)
    _assert_close(_grads(got, params, img, goal, fused=True),
                  _grads(got, params, img, goal, fused=False))


@pytest.mark.slow  # OPT-IN trunk path; composed-model gate covers default tier
def test_trunk_bwd_matches_xla_twin():
    """Same fused forward, backward via the trunk kernel vs jax.vjp of the
    unfused XLA twin (DGVIT_TRUNK_BWD=xla debugging fallback)."""
    got, params, img, goal = _setup()
    g_kern = _grads(got, params, img, goal, fused=True)
    os.environ["DGVIT_TRUNK_BWD"] = "xla"
    try:
        g_twin = _grads(got, params, img, goal, fused=True)
    finally:
        del os.environ["DGVIT_TRUNK_BWD"]
    _assert_close(g_kern, g_twin, rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # shape-variant compile of the OPT-IN trunk path
def test_trunk_bwd_odd_batch():
    """b=3 pads up to the 8-frame tile; padded frames carry dy=0 and must
    not perturb weight grads."""
    got, params, img, goal = _setup(batch=3)
    _assert_close(_grads(got, params, img, goal, fused=True),
                  _grads(got, params, img, goal, fused=False))


@pytest.mark.slow  # shape-variant compile of the OPT-IN trunk path
def test_trunk_bwd_smaller_image():
    """Input smaller than the configured image_size: in_patches (2) !=
    num_patches (4) — the blocks path pads tokens and slices pos[:, :n+1];
    masked pad-token columns must contribute zero gradient."""
    got, params, img, goal = _setup(hw=(16, 40))
    _assert_close(_grads(got, params, img, goal, fused=True),
                  _grads(got, params, img, goal, fused=False))


@pytest.mark.slow  # shape-variant compile of the OPT-IN trunk path
def test_trunk_bwd_channels_mode():
    """Frame-stacked (B, C, H, W) input (Imitation_learning.py:118-121
    fork) with the layer final norm."""
    got, params, img, goal = _setup(patch_mode="channels", final_norm="layer")
    _assert_close(_grads(got, params, img, goal, fused=True),
                  _grads(got, params, img, goal, fused=False))


def test_trunk_bwd_with_emb_dropout():
    """Live emb-dropout train pass: embed+dropout run in XLA with the same
    PRNG stream either way; the trunk bwd sees the dropped token stream."""
    got, params, img, goal = _setup(emb_dropout=0.3)
    rngs = {"dropout": jax.random.PRNGKey(7)}

    def loss(p, g):
        return jnp.sum(got.apply(p, img, g, deterministic=False,
                                 rngs=rngs) ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1))(params, goal)
    os.environ["DGVIT_FUSED_INTERPRET"] = "1"
    os.environ["DGVIT_TRUNK_GRAD"] = "1"
    try:
        g_out = jax.grad(loss, argnums=(0, 1))(params, goal)
    finally:
        del os.environ["DGVIT_FUSED_INTERPRET"]
        del os.environ["DGVIT_TRUNK_GRAD"]
    _assert_close(g_out, g_ref)
