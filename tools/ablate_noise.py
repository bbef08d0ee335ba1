"""Noise-scheme ablation for the fused preprocessing kernel (NEXT.md #3).

Swaps dgvit_tpu.ops.pallas_preprocess._add_noise between candidate schemes
and measures each with bench.py's seed-serialized harness (batch 256, 8
chained iterations per dispatch, best of 3) across frame tiles fb in
{1, 2, 4, 8}. Variants:

  ih12  the SHIPPED scheme (pallas_preprocess._add_noise): Irwin-Hall(12)
        from 12 unpacked BYTES of three 32-bit draws (36 mask/shift/add
        passes + full-res int32 accumulator) — measured fastest, it stays
  ih3   Irwin-Hall(3) from three full int32 draws, fma'd into x in place
        (full-res transients: OOMs scoped VMEM at fb=4) — rejected
  ih3h  ih3 with draws in (H/2, W) halves — rejected (66.3k < 67.7k)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_noise.py
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
import numpy as np
from jax.experimental import pallas as pl  # noqa: F401  (kernel context)
from jax.experimental.pallas import tpu as pltpu

import dgvit_tpu.ops.pallas_preprocess as pp


def ih3(x, noise_level):
    k = noise_level * (1.0 / 2147483648.0)
    for _ in range(3):
        bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.int32)
        x = x + k * bits.astype(jnp.float32)
    return jnp.clip(x + 1.5 * k, 0.0, 255.0)


def ih3h(x, noise_level):
    h, w = x.shape
    k = noise_level * (1.0 / 2147483648.0)
    halves = []
    for r0 in range(0, h, h // 2):
        xh = jax.lax.slice(x, (r0, 0), (r0 + h // 2, w))
        for _ in range(3):
            bits = pltpu.bitcast(pltpu.prng_random_bits((h // 2, w)),
                                 jnp.int32)
            xh = xh + k * bits.astype(jnp.float32)
        halves.append(xh)
    return jnp.clip(jnp.concatenate(halves, 0) + 1.5 * k, 0.0, 255.0)


# ih12 is the shipped scheme (pp._add_noise); measured 2026-08-18 on a quiet
# v5e (batch 256): ih12 62.9/64.3/67.7k frames/s at fb=1/2/4 (fb=8 fails to
# compile), ih3 60.1/59.2k at fb=1/2 (fb>=4 scoped-VMEM OOM), ih3h
# 66.0/66.3/65.8k at fb=1/2/4. All variants pass the post-chain mean/std
# gate (drift <= 3e-4). The byte-unpack scheme stays.
VARIANTS = {"ih12": pp._add_noise, "ih3": ih3, "ih3h": ih3h}


def measure(b=256, n_in=8):
    raw = jax.random.uniform(jax.random.PRNGKey(0), (b, 512, 640),
                             jnp.float32, 0.3, 8.0)

    @jax.jit
    def pp_loop(raw):
        def body(carry, i):
            out = pp.preprocess_depth_pallas(raw, i + carry)
            return (out[0, 0, 0] * 0.0).astype(jnp.int32), ()
        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_in))
        return c

    float(pp_loop(raw))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(pp_loop(raw))
        best = min(best, time.perf_counter() - t0)
    return b * n_in / best


def stats_gate():
    """Post-chain mean/std vs the jax.random.normal XLA pipeline."""
    from dgvit_tpu.ops.preprocess import preprocess_depth

    raw = jax.random.uniform(jax.random.PRNGKey(0), (8, 512, 640),
                             jnp.float32, 0.3, 8.0)
    out = np.asarray(pp.preprocess_depth_pallas(raw, jnp.int32(7),
                                                noise_level=50.0))
    ref = np.asarray(preprocess_depth(raw, jax.random.PRNGKey(7),
                                      noise_level=50.0))
    return float(abs(out.mean() - ref.mean())), float(abs(out.std() - ref.std()))


def main():
    import os
    for name, fn in VARIANTS.items():
        pp._add_noise = fn
        for fb in (1, 2, 4, 8):
            os.environ["DGVIT_PP_FB"] = str(fb)
            jax.clear_caches()
            try:
                fps = measure()
                dm, ds = stats_gate()
                print(json.dumps({"variant": name, "fb": fb,
                                  "frames_per_s": round(fps, 1),
                                  "mean_drift": round(dm, 5),
                                  "std_drift": round(ds, 5)}), flush=True)
            except Exception as e:
                print(json.dumps({"variant": name, "fb": fb,
                                  "error": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
