"""Component attribution for the fused block kernel: time the headline
forward (B=2048 megakernel) with individual component families nulled out
(monkeypatched), to locate the non-MXU time at the GoT geometry.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_block.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dgvit_tpu.utils.compcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import dgvit_tpu.ops.fused_transformer as ft
from dgvit_tpu.config import Config
from dgvit_tpu.models import build_actor

BATCH, N_INNER = 2048, 32


def measure(tag):
    cfg = Config()
    actor = build_actor(cfg, dtype=jnp.bfloat16)
    params = actor.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 160)),
                        jnp.zeros((1, 2)))

    @jax.jit
    def rollout(params, obs, goal0):
        def body(goal, _):
            mean, _ls = actor.apply(params, obs, goal, inference=True)
            act = jnp.tanh(mean.astype(jnp.float32))
            return act, act[0, 0]
        final, trace = jax.lax.scan(body, goal0, None, length=N_INNER)
        return final, trace.sum()

    obs = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 128, 160))
    goal0 = jnp.zeros((BATCH, 2), jnp.float32)
    _, s = rollout(params, obs, goal0)
    float(s)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        _, s = rollout(params, obs, goal0)
        float(s)
        best = min(best, time.perf_counter() - t0)
    fps = BATCH * N_INNER / best
    print(json.dumps({"config": tag, "frames/s": round(fps, 0),
                      "us/frame": round(1e6 * best / (BATCH * N_INNER), 3)}),
          flush=True)


if __name__ == "__main__":
    measure("full")

    # gelu -> identity
    orig_gelu = ft._gelu32
    ft._gelu32 = lambda x, cdt: x
    measure("no-gelu")
    ft._gelu32 = orig_gelu

    # LN -> affine only (skip mean/var/rsqrt)
    orig_ln = ft._ln
    ft._ln = lambda x, s, b: x * s + b
    measure("no-ln-stats")
    ft._ln = orig_ln

    # softmax -> plain scale (skip max/exp/div)
    orig_sm = getattr(ft, "_softmax32", None)
    if orig_sm is not None:
        ft._softmax32 = lambda s: s * 0.01
        measure("no-softmax")
        ft._softmax32 = orig_sm
    else:
        print(json.dumps({"config": "no-softmax",
                          "note": "softmax inline, not patchable"}),
              flush=True)

    ft._gelu32 = lambda x, cdt: x
    ft._ln = lambda x, s, b: x * s + b
    if orig_sm is not None:
        ft._softmax32 = lambda s: s * 0.01
    measure("no-gelu+no-ln" + ("+no-softmax" if orig_sm else ""))
    ft._gelu32 = orig_gelu
    ft._ln = orig_ln
    if orig_sm is not None:
        ft._softmax32 = orig_sm
