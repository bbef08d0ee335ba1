"""Transplant reference PyTorch checkpoints into dgvit_tpu param trees.

The fidelity gate (BASELINE.md) replays logged trajectories through the
PyTorch reference and this framework with the SAME weights and demands fp32
action parity. This module maps reference state-dict keys
(got_sac_network.py / GoalFormer.py module paths) onto our flax param trees.

Key map (GoT trunk, GoalFormer.py):
  trans.to_patch_embedding.1.{weight,bias} -> trans/patch_embed  (transposed)
  trans.pos_embedding                      -> trans/pos_embedding
  trans.transformer.layers.{i}.0.norm.*    -> trans/transformer/block_i/attn_norm
  trans.transformer.layers.{i}.0.fn.to_qkv.weight   -> .../attn/to_qkv/kernel
  trans.transformer.layers.{i}.0.fn.to_out.0.*      -> .../attn/to_out
  trans.transformer.layers.{i}.1.norm.*    -> .../ff_norm
  trans.transformer.layers.{i}.1.fn.net.0.* -> .../ff/fc1
  trans.transformer.layers.{i}.1.fn.net.3.* -> .../ff/fc2
  trans.layer_norm.g                        -> trans/norm_out/g   (RMSNorm)
  trans.cls_token / trans.mlp_head.*        -> unused by the reference forward
                                               (GoalFormer.py:156-171), dropped

Torch Linear weights are (out, in) -> flax kernels (in, out): transposed.
Torch Conv2d weights are (out, in, kh, kw) -> flax (kh, kw, in, out).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _linear(sd: Mapping[str, Any], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if bias and prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _conv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    w = _np(sd[prefix + ".weight"])  # (out, in, kh, kw)
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": _np(sd[prefix + ".bias"])}


def got_params_from_torch(sd: Mapping[str, Any], prefix: str = "trans.",
                          depth: int = 4, final_norm: str = "rms") -> Dict[str, Any]:
    """Build the GoT submodule param dict from a torch state dict."""
    p: Dict[str, Any] = {
        "patch_embed": _linear(sd, prefix + "to_patch_embedding.1"),
        "pos_embedding": _np(sd[prefix + "pos_embedding"]),
    }
    blocks = {}
    for i in range(depth):
        lp = f"{prefix}transformer.layers.{i}."
        blocks[f"block_{i}"] = {
            "attn_norm": _layernorm(sd, lp + "0.norm"),
            "attn": {
                "to_qkv": _linear(sd, lp + "0.fn.to_qkv", bias=False),
                "to_out": _linear(sd, lp + "0.fn.to_out.0"),
            },
            "ff_norm": _layernorm(sd, lp + "1.norm"),
            "ff": {
                "fc1": _linear(sd, lp + "1.fn.net.0"),
                "fc2": _linear(sd, lp + "1.fn.net.3"),
            },
        }
    p["transformer"] = blocks
    if final_norm == "rms":
        p["norm_out"] = {"g": _np(sd[prefix + "layer_norm.g"])}
    else:
        p["norm_out"] = _layernorm(sd, prefix + "layer_norm")
    return p


def got_policy_params_from_torch(sd: Mapping[str, Any], depth: int = 4,
                                 final_norm: str = "rms") -> Dict[str, Any]:
    """GoTPolicy (got_sac_network.py:172-256) state dict -> flax params."""
    return {
        "fc_embed": _linear(sd, "fc_embed"),
        "trans": got_params_from_torch(sd, "trans.", depth, final_norm),
        "fc1": _linear(sd, "fc1"),
        "fc2": _linear(sd, "fc2"),
        "mean_linear": _linear(sd, "mean_linear"),
        "log_std_linear": _linear(sd, "log_std_linear"),
    }


def got_q_params_from_torch(sd: Mapping[str, Any], depth: int = 4) -> Dict[str, Any]:
    """GoTQNetwork (got_sac_network.py:75-123) state dict -> flax params."""
    return {
        "fc_embed": _linear(sd, "fc_embed"),
        "trans": got_params_from_torch(sd, "trans.", depth),
        "fc1": _linear(sd, "fc1"),
        "fc2": _linear(sd, "fc2"),
        "fc3": _linear(sd, "fc3"),
        "fc11": _linear(sd, "fc11"),
        "fc21": _linear(sd, "fc21"),
        "fc31": _linear(sd, "fc31"),
    }


def cnn_policy_params_from_torch(sd: Mapping[str, Any],
                                 mean_key: str = "mean_linear") -> Dict[str, Any]:
    """GaussianPolicy / DeterministicPolicy (got_sac_network.py:258-387)."""
    p = {
        "trunk": {f"conv{i}": _conv(sd, f"conv{i}") for i in (1, 2, 3)},
        "fc_embed": _linear(sd, "fc_embed"),
        "fc1": _linear(sd, "fc1"),
        "fc2": _linear(sd, "fc2"),
    }
    if "log_std_linear.weight" in sd:
        p["log_std_linear"] = _linear(sd, "log_std_linear")
    p[mean_key] = _linear(sd, mean_key if mean_key + ".weight" in sd else "mean")
    return p


def cnn_q_params_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """QNetwork (got_sac_network.py:125-170)."""
    return {
        "trunk": {f"conv{i}": _conv(sd, f"conv{i}") for i in (1, 2, 3)},
        "fc_embed": _linear(sd, "fc_embed"),
        "fc1": _linear(sd, "fc1"),
        "fc2": _linear(sd, "fc2"),
        "fc3": _linear(sd, "fc3"),
        "fc11": _linear(sd, "fc11"),
        "fc21": _linear(sd, "fc21"),
        "fc31": _linear(sd, "fc31"),
    }


def load_actor_pth(path: str, depth: int = 4) -> Dict[str, Any]:
    """Load a reference `*_actor.pth` checkpoint (DRL.py:489-503) into
    GoTPolicy params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return got_policy_params_from_torch(sd, depth=depth)


def load_critic_pth(path: str, depth: int = 4) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return got_q_params_from_torch(sd, depth=depth)
