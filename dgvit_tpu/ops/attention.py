"""Fused multi-head attention for the GoT/ViT token stream.

The reference computes attention as four separate torch ops (matmul, softmax,
dropout, matmul; reference GoalFormer.py:71-82). Here the numerics are identical
but the op is a single fused kernel:

  * `_attention_xla`    — einsum reference path (XLA fuses this well on its own;
                          used on CPU, under vmap-of-grad, and as the oracle).
  * `_attention_pallas` — Pallas TPU kernel; one grid step per block of
                          (batch*heads), scores+softmax+PV in VMEM. Token count
                          is padded to the 128-lane boundary and masked.

At 65 tokens the whole score matrix fits in VMEM, so a flash-style streaming
softmax would only add overhead; the kernel computes the exact softmax in one
shot. The `seq` mesh axis (core/mesh.py) is where longer streams would shard.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attention_xla(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """(B, H, N, D) reference path."""
    dots = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    probs = jax.nn.softmax(dots, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", probs, v)


def attention_probs(q: jax.Array, k: jax.Array, scale: float) -> jax.Array:
    """Materialized attention maps for the visualizer path (reference
    visualizer.py:3-42 captured `attn` at simple_vit.py:61-70)."""
    return jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, axis=-1)


def reduce_attn(attn: jax.Array, reduction: float = 0.1,
                threshold: float = 0.5) -> jax.Array:
    """Attention-redistribution experiment helper (GoalFormer.py:21-26,
    unused by the reference main path): damp weights above `threshold` by
    `reduction` and renormalize rows."""
    damped = jnp.where(attn > threshold, attn * (1.0 - reduction), attn)
    return damped / jnp.sum(damped, axis=-1, keepdims=True)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int, bb: int):
    """One program: `bb` (batch*head) slices of padded (Np, D) attention."""
    np_ = q_ref.shape[1]
    neg = jnp.finfo(jnp.float32).min
    # static key-padding mask (columns >= n_valid are padding)
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), dimension=1)
    mask = col < n_valid
    for i in range(bb):  # static unroll; bb is small
        q = q_ref[i].astype(jnp.float32)
        k = k_ref[i].astype(jnp.float32)
        v = v_ref[i].astype(jnp.float32)
        dots = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dots = jnp.where(mask, dots, neg)
        m = jnp.max(dots, axis=-1, keepdims=True)
        e = jnp.exp(dots - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        out = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[i] = out.astype(o_ref.dtype)


def _attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                      interpret: bool = False) -> jax.Array:
    b, h, n, d = q.shape
    bh = b * h
    np_ = _round_up(n, _LANE)
    dp = _round_up(d, _LANE)

    def fold(x):
        x = x.reshape(bh, n, d)
        return jnp.pad(x, ((0, 0), (0, np_ - n), (0, dp - d)))

    qf, kf, vf = fold(q), fold(k), fold(v)

    bb = 8
    while bh % bb != 0:
        bb //= 2
    grid = (bh // bb,)
    kern = functools.partial(_attn_kernel, scale=scale, n_valid=n, bb=bb)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, np_, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, np_, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, np_, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, np_, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, np_, dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * np_ * np_ * dp,
            bytes_accessed=4 * bh * np_ * dp * 4,
            transcendentals=bh * np_ * np_,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :n, :d].reshape(b, h, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_pallas_diff(q, k, v, scale: float, interpret: bool):
    """Pallas forward with an analytic backward: the bwd recomputes through the
    XLA path (cheap at 65 tokens) so the kernel stays usable under jax.grad."""
    return _attention_pallas(q, k, v, scale, interpret)


def _attention_pallas_fwd(q, k, v, scale: float, interpret: bool):
    return _attention_pallas(q, k, v, scale, interpret), (q, k, v)


def _attention_pallas_bwd(scale: float, interpret: bool, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _attention_xla(a, b, c, scale), q, k, v)
    return vjp(g)


_attention_pallas_diff.defvjp(_attention_pallas_fwd, _attention_pallas_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    *,
    impl: str = "auto",  # auto | xla | pallas | pallas_interpret
) -> jax.Array:
    """Multi-head attention over (B, H, N, D) with the reference's scaling
    (dim_head ** -0.5, GoalFormer.py:59)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "auto":
        # Measured on v5e (GoT dim 64, 65 tokens): XLA's fused attention beats
        # the Pallas kernel 68k vs 42k frames/s because lane/token padding
        # (65->128, 64->128) costs more than kernel fusion saves at this size.
        # The Pallas path wins once real tiles fill the MXU — long token
        # streams / larger dim_head — so dispatch on shape.
        n, d = q.shape[-2], q.shape[-1]
        use_pallas = _on_tpu() and (n > 128 or d > 128)
        impl = "pallas" if use_pallas else "xla"
    if impl == "xla":
        return _attention_xla(q, k, v, scale)
    if impl == "pallas":
        return _attention_pallas_diff(q, k, v, scale, False)
    if impl == "pallas_interpret":
        return _attention_pallas_diff(q, k, v, scale, True)
    raise ValueError(f"unknown attention impl {impl!r}")
