"""Fused attention-section Pallas kernel for the GoT/ViT geometry.

The ablation (BENCH.md) shows the attention section — qkv projection,
per-head scores/softmax/PV, output projection — dominating the block at
4.28 ms vs 1.45 ms for the MLP (B=2048, v5e): XLA materializes transposed
(B, H, N, D) copies and runs 2*B*H tiny batched matmuls at low MXU
utilization. This kernel processes a tile of TB frames per program with
everything VMEM-resident:

    X (TB, N, D) -> QKV = X @ Wqkv (one big MXU matmul)
                 -> per (frame, head): scores/softmax/PV on static slices
                 -> O @ Wout + residual-ready output

Covers GoalFormer.py:52-82 semantics (scale dim_head**-0.5, no attn dropout
in any reference config). Differentiable via custom_vjp (backward recomputes
through the XLA path)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_block_kernel(x_ref, wqkv_ref, wout_ref, bout_ref, o_ref, *,
                       n_valid: int, heads: int, dim_head: int, tb: int,
                       scale: float):
    np_ = x_ref.shape[1]
    d = x_ref.shape[2]
    inner = heads * dim_head

    # matmul operands stay in the input dtype (bf16 rides the MXU at full
    # rate); accumulation and softmax are fp32
    cdt = x_ref.dtype
    x = x_ref[...].reshape(tb * np_, d)
    qkv = jnp.dot(x, wqkv_ref[...],
                  preferred_element_type=jnp.float32).astype(cdt)

    neg = jnp.finfo(jnp.float32).min
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), dimension=1)
    mask = col < n_valid

    outs = []
    for f in range(tb):
        row0 = f * np_
        frame = jax.lax.slice(qkv, (row0, 0), (row0 + np_, 3 * inner))
        head_outs = []
        for h in range(heads):
            q = jax.lax.slice(frame, (0, h * dim_head),
                              (np_, (h + 1) * dim_head))
            k = jax.lax.slice(frame, (0, inner + h * dim_head),
                              (np_, inner + (h + 1) * dim_head))
            v = jax.lax.slice(frame, (0, 2 * inner + h * dim_head),
                              (np_, 2 * inner + (h + 1) * dim_head))
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(mask, s, neg)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
            head_outs.append(jnp.dot(p, v, preferred_element_type=jnp.float32)
                             .astype(cdt))
        outs.append(jnp.concatenate(head_outs, axis=1))  # (np, inner)
    o = jnp.concatenate(outs, axis=0)                    # (tb*np, inner)
    y = jnp.dot(o, wout_ref[...],
                preferred_element_type=jnp.float32) + bout_ref[...].astype(jnp.float32)
    o_ref[...] = y.reshape(tb, np_, d).astype(o_ref.dtype)


def _fused_attention_section(x, wqkv, wout, bout, *, heads: int,
                             dim_head: int, interpret: bool = False):
    """x (B, N, D) -> attention section output (B, N, D)."""
    b, n, d = x.shape
    inner = heads * dim_head
    scale = dim_head ** -0.5
    np_ = _round_up(n, 8)
    xp = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)))

    tb = 8
    while b % tb != 0:
        tb //= 2
    kern = functools.partial(_attn_block_kernel, n_valid=n, heads=heads,
                             dim_head=dim_head, tb=tb, scale=scale)
    out = pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, np_, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * inner), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, np_, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * np_ * d * 3 * inner
            + 4 * b * heads * np_ * np_ * dim_head
            + 2 * b * np_ * inner * d,
            bytes_accessed=2 * b * np_ * d * 4,
            transcendentals=b * heads * np_ * np_,
        ),
        interpret=interpret,
    )(xp, wqkv, wout, bout.reshape(1, d))
    return out[:, :n, :]


def _attention_section_xla(x, wqkv, wout, bout, *, heads: int, dim_head: int):
    b, n, d = x.shape
    inner = heads * dim_head
    qkv = jnp.dot(x, wqkv).reshape(b, n, 3, heads, dim_head)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * dim_head ** -0.5
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, inner)
    return jnp.dot(o, wout) + bout


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_attention_section(x, wqkv, wout, bout, heads: int, dim_head: int,
                            interpret: bool = False):
    """Pallas forward, XLA-recompute backward."""
    return _fused_attention_section(x, wqkv, wout, bout, heads=heads,
                                    dim_head=dim_head, interpret=interpret)


def _fwd(x, wqkv, wout, bout, heads, dim_head, interpret):
    y = _fused_attention_section(x, wqkv, wout, bout, heads=heads,
                                 dim_head=dim_head, interpret=interpret)
    return y, (x, wqkv, wout, bout)


def _bwd(heads, dim_head, interpret, res, g):
    x, wqkv, wout, bout = res
    _, vjp = jax.vjp(
        lambda x, a, b, c: _attention_section_xla(x, a, b, c, heads=heads,
                                                  dim_head=dim_head),
        x, wqkv, wout, bout)
    return vjp(g)


fused_attention_section.defvjp(_fwd, _bwd)
