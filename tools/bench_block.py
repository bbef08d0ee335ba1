"""Micro-bench: fused transformer block fwd / fwd+bwd at different frame
tiles (tb) — finds the grid-overhead knee. Usage: python tools/bench_block.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from dgvit_tpu.ops import fused_transformer as ft

import os
B = int(os.environ.get("BB_B", "256"))
N, D, H, DH, MLP = 65, 64, 4, 64, 2048
NIT = 20


def flat_params(key, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 11)
    inner = H * DH
    mk = lambda k, s: jax.random.normal(k, s, jnp.float32).astype(dtype) * 0.05
    return (mk(ks[0], (1, D)) + 1, mk(ks[1], (1, D)),
            mk(ks[2], (D, 3 * inner)), mk(ks[3], (inner, D)), mk(ks[4], (1, D)),
            mk(ks[5], (1, D)) + 1, mk(ks[6], (1, D)),
            mk(ks[7], (D, MLP)), mk(ks[8], (1, MLP)),
            mk(ks[9], (MLP, D)), mk(ks[10], (1, D)))


def timeit(name, fn, *args):
    r = fn(*args)
    jax.tree_util.tree_leaves(r)[0].block_until_ready()
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best / NIT * 1e3:7.3f} ms")


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D)).astype(jnp.bfloat16)
    flat = flat_params(jax.random.PRNGKey(1))

    @jax.jit
    def fwd_loop(x, flat):
        def body(c, _):
            y = ft.fused_transformer_block(c, flat, H, DH)
            return y, ()
        y, _ = jax.lax.scan(body, x, None, length=NIT)
        return y

    @jax.jit
    def bwd_loop(x, flat):
        def body(c, _):
            def loss(x):
                return ft.fused_transformer_block(x, flat, H, DH)\
                    .astype(jnp.float32).sum()
            v, g = jax.value_and_grad(loss)(c)
            return g.astype(c.dtype), ()
        y, _ = jax.lax.scan(body, x, None, length=NIT)
        return y

    timeit("fwd", fwd_loop, x, flat)
    timeit("fwd+bwd", bwd_loop, x, flat)


if __name__ == "__main__":
    main()
