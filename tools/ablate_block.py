"""Ablate the fused block kernel: time full / no-attention / no-MLP variants
to attribute per-program cost. Run on TPU: python tools/ablate_block.py"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgvit_tpu.ops import fused_transformer as ft

B, N, D, H, DH, MLP = 2048, 65, 64, 4, 64, 2048
NIT = 20
INNER = H * DH


def make_kernel(mode):
    def kern(x_ref, an_s, an_b, wqkv_ref, wout_ref, bout_ref, fn_s, fn_b,
             w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, tb, np_):
        cdt = x_ref.dtype
        rows = tb * np_
        x32 = x_ref[...].reshape(rows, D).astype(jnp.float32)
        h = ft._ln(x32, an_s[...].astype(jnp.float32),
                   an_b[...].astype(jnp.float32)).astype(cdt)
        qkv = jnp.dot(h, wqkv_ref[...],
                      preferred_element_type=jnp.float32).astype(cdt)
        if mode in ("full", "no_mlp"):
            mask_c = ft._block_diag_mask(tb, np_, N)
            o = ft._attention_block_diag(qkv, mask_c, heads=H, dim_head=DH,
                                         scale=DH ** -0.5, cdt=cdt)
        else:  # no_attn
            o = jnp.concatenate([qkv[:, :INNER // 2], qkv[:, :INNER // 2]], 1)
        attn = jnp.dot(o, wout_ref[...], preferred_element_type=jnp.float32) \
            + bout_ref[...].astype(jnp.float32)
        x32 = x32 + attn
        if mode in ("full", "no_attn"):
            h2 = ft._ln(x32, fn_s[...].astype(jnp.float32),
                        fn_b[...].astype(jnp.float32)).astype(cdt)
            out = b2_ref[...].astype(jnp.float32)
            for c0 in range(0, MLP, 512):
                w1c = w1_ref[:, c0:c0 + 512]
                b1c = b1_ref[:, c0:c0 + 512]
                w2c = w2_ref[c0:c0 + 512, :]
                hid = jnp.dot(h2, w1c, preferred_element_type=jnp.float32) \
                    + b1c.astype(jnp.float32)
                hid = (0.5 * hid * (1.0 + ft._erf32(
                    hid * np.float32(0.7071067811865476)))).astype(cdt)
                out = out + jnp.dot(hid, w2c,
                                    preferred_element_type=jnp.float32)
            x32 = x32 + out
        o_ref[...] = x32.reshape(tb, np_, D).astype(o_ref.dtype)
    return kern


def build(mode, tb=8):
    np_ = 72
    kern = functools.partial(make_kernel(mode), tb=tb, np_=np_)
    full = lambda s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM)
    tile = lambda s: pl.BlockSpec(s, lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)

    def apply(xp, flat):
        return pl.pallas_call(
            kern, grid=(B // tb,),
            in_specs=[tile((tb, np_, D)), full((1, D)), full((1, D)),
                      full((D, 3 * INNER)), full((INNER, D)), full((1, D)),
                      full((1, D)), full((1, D)), full((D, MLP)),
                      full((1, MLP)), full((MLP, D)), full((1, D))],
            out_specs=tile((tb, np_, D)),
            out_shape=jax.ShapeDtypeStruct((B, np_, D), xp.dtype),
        )(xp, *flat)
    return apply


def main():
    from tools.bench_block import flat_params

    x = jax.random.normal(jax.random.PRNGKey(0), (B, 72, D)).astype(jnp.bfloat16)
    flat = flat_params(jax.random.PRNGKey(1))
    for tb in (8, 16):
        for mode in ("full", "no_attn", "no_mlp"):
            apply = build(mode, tb)

            @jax.jit
            def loop(x, flat, apply=apply):
                def body(c, _):
                    return apply(c, flat), ()
                y, _ = jax.lax.scan(body, x, None, length=NIT)
                return y

            y = loop(x, flat)
            float(jnp.sum(y.astype(jnp.float32)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                y = loop(x, flat)
                float(jnp.sum(y.astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            per_prog = best / NIT / (B // tb) * 1e6
            print(f"tb={tb:2d} {mode:8s} {best / NIT * 1e3:7.3f} ms "
                  f"({per_prog:5.1f} us/program)")


if __name__ == "__main__":
    main()
