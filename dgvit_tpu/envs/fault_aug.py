"""In-graph sensor-fault transforms — shared by evaluation sweeps and
training-time augmentation.

The reference's five-fault perturbation family (env_lab.py:33-90: Gaussian
noise, Gaussian blur, pixel occlusion, superpixel/contiguous occlusion,
greying) expressed as jit-friendly dynamic scalars: every knob is a traced
float, `where`-gated so a 0.0 knob is BIT-IDENTICAL to the clean path while
one compile serves any knob setting. `blur` blends toward the 5x5-Gaussian
frame (a dynamic kernel size would recompile) and `patch_occlusion` zeroes
ONE random contiguous rectangle of that area fraction per lane per step
(the jittable analog of superpixel_occlusion's contiguous-region dropout,
env_lab.py:49-59).

Two consumers:
  * `train.evaluate.run_eval_vec(sweep=...)` — the robustness study
    (BENCH.md round 4), where the RNG split count being independent of the
    knob values PAIRS noise realizations across sweep points;
  * `train.vec_rollout.make_collect_fn(fault_knobs=...)` — sensor-fault
    AUGMENTATION during fused training: the policy acts on (and the replay
    ring stores) perturbed frames, training robustness in directly. The
    round-4 sweeps motivated this: domain randomization over LAYOUTS buys
    flat additive-fault curves but collapses under structural dropout
    (robustness_rand8: patch_occlusion=0.25 -> 16% RRC / 0% hospital);
    dropout robustness has to come from seeing dropout in training.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

# canonical knob order — evaluate.py sweeps and collect-time augmentation
# both pack knob dicts into a (5,) array with this layout
KNOB_KEYS = ("obs_noise", "blur", "occlusion", "patch_occlusion", "greying")


def knobs_array(pt: Optional[Dict[str, float]]) -> jnp.ndarray:
    """{knob: value} (missing keys = 0.0) -> (5,) f32 in KNOB_KEYS order."""
    pt = pt or {}
    unknown = set(pt) - set(KNOB_KEYS)
    assert not unknown, f"unknown fault knobs: {sorted(unknown)}"
    return jnp.asarray([float(pt.get(k, 0.0)) for k in KNOB_KEYS],
                       jnp.float32)


def perturb_obs(obs: jax.Array, key: jax.Array,
                knobs: jax.Array) -> jax.Array:
    """Apply the five-fault family to a batch of depth frames.

    `obs`: (B, H, W) or (B, C, H, W) frame stacks on the [0, 1] depth
    scale; `knobs`: (5,) f32 in KNOB_KEYS order. All knobs are where-gated
    (0.0 == clean, bit-identical) and the RNG split sequence is fixed, so
    realizations are paired across knob settings — the sweep-pairing
    contract test_vec_eval_sweep_matches_static pins. The patch rectangle
    is drawn once per LANE and broadcast over frame-stack dims (one
    occluder blankets the whole stack, like a physical obstruction)."""
    from dgvit_tpu.ops.preprocess import gaussian_blur

    b = obs.shape[0]
    noise, blur, occ, patch, grey = (knobs[i] for i in range(5))
    key, k = jax.random.split(key)
    obs = jnp.where(
        noise > 0.0,
        jnp.clip(obs + noise * jax.random.normal(k, obs.shape), 0.0, 1.0),
        obs)
    obs = jnp.where(blur > 0.0,
                    (1.0 - blur) * obs + blur * gaussian_blur(obs, 5), obs)
    key, k = jax.random.split(key)
    obs = jnp.where(occ > 0.0,
                    obs * (jax.random.uniform(k, obs.shape) >= occ), obs)
    # one random rectangle of `patch` area fraction per lane
    key, k = jax.random.split(key)
    ih, iw = obs.shape[-2], obs.shape[-1]
    side = jnp.sqrt(jnp.maximum(patch, 0.0))
    ph, pw = side * ih, side * iw
    ky, kx = jax.random.split(k)
    y0 = jax.random.uniform(ky, (b,)) * (ih - ph)
    x0 = jax.random.uniform(kx, (b,)) * (iw - pw)
    yy = jax.lax.broadcasted_iota(jnp.float32, (ih, iw), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (ih, iw), 1)
    ex = (1,) * (obs.ndim - 3)  # broadcast over frame-stack dim
    y0 = y0.reshape((b,) + ex)[..., None, None]
    x0 = x0.reshape((b,) + ex)[..., None, None]
    keep = ~((yy >= y0) & (yy < y0 + ph) & (xx >= x0) & (xx < x0 + pw))
    obs = jnp.where(patch > 0.0, obs * keep, obs)
    obs = jnp.where(grey > 0.0, obs * (1.0 - grey) + 0.5 * grey, obs)
    return obs
