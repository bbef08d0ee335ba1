"""Fully-fused transformer block Pallas kernel (GoT geometry).

One kernel program = one tile of frames through a COMPLETE pre-norm block
(GoalFormer.py:90-105): LN -> qkv -> per-head attention -> out-proj ->
residual -> LN -> MLP(gelu) -> residual. The residual stream stays in VMEM
for the whole block: 2 HBM touches of the activations per block instead of
the ~10 op-boundary round trips of the unfused path. Norm statistics and
softmax run fp32; matmul operands stay in the input dtype (bf16 -> full-rate
MXU with fp32 accumulation).

Differentiable via custom_vjp. The backward is a SECOND fused Pallas kernel
(`_block_bwd_kernel`): it recomputes the forward in-VMEM (flash-attention
style — cheaper than round-tripping the (rows, mlp_dim) hidden and per-head
probability tensors through HBM) and emits dx plus all 11 weight gradients,
accumulated across the sequential TPU grid. Before round 2 the backward
recomputed through an unfused XLA twin (~3 XLA-forward equivalents); the
kernel version is ~2.5 Pallas-forward equivalents with no HBM activation
traffic, which is what lifts SAC update throughput (BENCH.md round-2 row).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mlp_chunk(mlp_dim: int, default: int) -> int:
    """Hidden-dim chunk for the in-kernel MLP loop (VMEM-bounded).
    Override with DGVIT_MLP_CHUNK for experiments."""
    import os

    return min(mlp_dim, int(os.environ.get("DGVIT_MLP_CHUNK", str(default))))


def _erf32(x):
    """Abramowitz-Stegun 7.1.26 erf, |err| < 1.5e-7 (fp32-exact); Mosaic has
    no erf/erfc primitive, only exp."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _ln(x32, scale, bias, eps=1e-5):
    m = jnp.mean(x32, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(x32 - m), axis=-1, keepdims=True)
    return (x32 - m) * jax.lax.rsqrt(v + eps) * scale + bias


_SQRT_2_OVER_PI = np.float32(0.7978845608028654)
_GELU_C = np.float32(0.044715)
_INV_SQRT2 = np.float32(0.7071067811865476)


def _gelu32(x, cdt):
    """GELU on fp32 pre-activations. The kernel ablation (BENCH.md round 2)
    shows the MLP is ALU-bound on this elementwise chain, so the bf16
    compute path uses the tanh form (~6 VPU passes, one transcendental, no
    divide; max |err| vs exact erf ~1e-3 — an order below bf16 matmul noise)
    while fp32 keeps the A&S erf polynomial (fp32-exact, matches torch
    nn.GELU default and the CPU parity gates)."""
    if cdt == jnp.bfloat16:
        inner = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
        return 0.5 * x * (1.0 + jnp.tanh(inner))
    return 0.5 * x * (1.0 + _erf32(x * _INV_SQRT2))


def _use_batched_attn() -> bool:
    """Head-batched attention matmuls (2 batched dot_generals per frame
    instead of heads*2 small ones). The 2026-08 Mosaic DOES lower batched
    dot_general (leading batch dim only) — but measured SLOWER than the
    unrolled loop at the GoT geometry (205k vs 217k frames/s at B=2048): the
    per-head slice+concat needed to stack (heads, np, dh) operands costs
    more than the batching saves on 72x64 tiles. Kept flag-gated
    (DGVIT_BATCHED_ATTN=1) for retesting on future stacks / larger heads."""
    import os

    return os.environ.get("DGVIT_BATCHED_ATTN", "0") == "1"


def _attn_batched(qkv, *, n_valid: int, heads: int, dim_head: int, tb: int,
                  np_: int, scale: float, cdt):
    """(tb*np_, 3*inner) qkv -> (tb*np_, inner) attention output with the
    HEAD loop expressed as a dot_general batch dim (this Mosaic supports
    exactly one batch dim): per frame, ONE batched score matmul and ONE
    batched value matmul instead of heads*2 small ones. Frames remain a
    Python loop — batching them too would need 2 batch dims or a transpose."""
    inner = heads * dim_head
    col = jax.lax.broadcasted_iota(jnp.int32, (1, np_, np_), dimension=2)
    mask = col < n_valid
    neg = jnp.finfo(jnp.float32).min

    outs = []
    for f in range(tb):
        row0 = f * np_
        frame = jax.lax.slice(qkv, (row0, 0), (row0 + np_, 3 * inner))
        # Mosaic: batch dim must lead, and a 2D->4D minor-dim reshape does
        # not lower — build (heads, np, dh) stacks by slicing each head's
        # column band and concatenating on a new leading axis
        def pick(which):
            base = which * inner
            return jnp.concatenate(
                [jax.lax.slice(frame, (0, base + h * dim_head),
                               (np_, base + (h + 1) * dim_head))
                 .reshape(1, np_, dim_head) for h in range(heads)], axis=0)
        q, k, v = pick(0), pick(1), pick(2)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (heads, np, np)
        s = jnp.where(mask, s, neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
        o = jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(cdt)  # (heads, np, dh)
        outs.append(jnp.concatenate(
            [jax.lax.slice(o, (h, 0, 0), (h + 1, np_, dim_head))
             .reshape(np_, dim_head) for h in range(heads)], axis=1))
    return jnp.concatenate(outs, axis=0)               # (tb*np_, inner)


def _use_frame_attn() -> bool:
    """FRAME-batched attention: the dot_general batch dim is the frame tile
    (axis 0 — the one batch-dim position Mosaic lowers), so each head costs
    ONE batched score matmul + ONE batched value matmul for all tb frames.
    Unlike the head-batched variant above, no slice+concat restacking is
    needed: the token stream is already frame-major, so the (tb, np, dh)
    operands are a major-split reshape + lane-aligned minor slice."""
    import os

    return os.environ.get("DGVIT_FRAME_ATTN", "0") == "1"


def _attn_frame_batched(qkv, *, n_valid: int, heads: int, dim_head: int,
                        tb: int, np_: int, scale: float, cdt):
    """(tb*np_, 3*inner) qkv -> (tb*np_, inner) with frames as the batch dim
    of the score/value dot_generals (heads stay a Python loop)."""
    inner = heads * dim_head
    qkv3 = qkv.reshape(tb, np_, 3 * inner)          # major-split: lowers
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, np_, np_), dimension=2)
    mask = col < n_valid
    neg = jnp.finfo(jnp.float32).min

    head_outs = []
    for hd in range(heads):
        q = jax.lax.slice(qkv3, (0, 0, hd * dim_head),
                          (tb, np_, (hd + 1) * dim_head))
        k = jax.lax.slice(qkv3, (0, 0, inner + hd * dim_head),
                          (tb, np_, inner + (hd + 1) * dim_head))
        v = jax.lax.slice(qkv3, (0, 0, 2 * inner + hd * dim_head),
                          (tb, np_, 2 * inner + (hd + 1) * dim_head))
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # (tb, np, np)
        s = jnp.where(mask, s, neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
        head_outs.append(jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(cdt))  # (tb, np, dh)
    o3 = jnp.concatenate(head_outs, axis=2)          # (tb, np, inner)
    return o3.reshape(tb * np_, inner)


def _block_body(x32, w, *, n_valid: int, heads: int, dim_head: int, tb: int,
                np_: int, scale: float, cdt):
    """One complete pre-norm transformer block on an in-VMEM fp32 residual
    stream x32 of shape (tb*np_, d). `w` is the 11-tuple of weight REFS in
    kernel argument order (see `_block_params_flat`) — refs, not arrays, so
    the chunked MLP can ref-slice w1/w2 (Mosaic has no strided value slice
    for the large weight case). Shared by the per-block kernels here and the
    whole-network megakernel (ops/got_megakernel.py)."""
    (an_s_ref, an_b_ref, wqkv_ref, wout_ref, bout_ref, fn_s_ref, fn_b_ref,
     w1_ref, b1_ref, w2_ref, b2_ref) = w
    d = x32.shape[1]
    inner = heads * dim_head

    # --- pre-norm attention -------------------------------------------------
    h = _ln(x32, an_s_ref[...].astype(jnp.float32),
            an_b_ref[...].astype(jnp.float32)).astype(cdt)
    qkv = jnp.dot(h, wqkv_ref[...],
                  preferred_element_type=jnp.float32).astype(cdt)

    if _use_frame_attn():
        o = _attn_frame_batched(qkv, n_valid=n_valid, heads=heads,
                                dim_head=dim_head, tb=tb, np_=np_,
                                scale=scale, cdt=cdt)
    elif _use_batched_attn():
        o = _attn_batched(qkv, n_valid=n_valid, heads=heads,
                          dim_head=dim_head, tb=tb, np_=np_, scale=scale,
                          cdt=cdt)
    else:
        neg = jnp.finfo(jnp.float32).min
        col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), dimension=1)
        mask = col < n_valid

        outs = []
        for f in range(tb):
            row0 = f * np_
            frame = jax.lax.slice(qkv, (row0, 0), (row0 + np_, 3 * inner))
            head_outs = []
            for hd in range(heads):
                q = jax.lax.slice(frame, (0, hd * dim_head),
                                  (np_, (hd + 1) * dim_head))
                k = jax.lax.slice(frame, (0, inner + hd * dim_head),
                                  (np_, inner + (hd + 1) * dim_head))
                v = jax.lax.slice(frame, (0, 2 * inner + hd * dim_head),
                                  (np_, 2 * inner + (hd + 1) * dim_head))
                s = jax.lax.dot_general(
                    q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = jnp.where(mask, s, neg)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
                head_outs.append(
                    jnp.dot(p, v, preferred_element_type=jnp.float32)
                    .astype(cdt))
            outs.append(jnp.concatenate(head_outs, axis=1))
        o = jnp.concatenate(outs, axis=0)
    attn_out = jnp.dot(o, wout_ref[...], preferred_element_type=jnp.float32) \
        + bout_ref[...].astype(jnp.float32)
    x32 = x32 + attn_out

    # --- pre-norm MLP ---------------------------------------------------------
    h = _ln(x32, fn_s_ref[...].astype(jnp.float32),
            fn_b_ref[...].astype(jnp.float32)).astype(cdt)
    # MLP with the hidden dim chunked so the (rows, mlp_dim) activation never
    # materializes (VMEM budget); gelu mode per _gelu32 (tanh in bf16,
    # fp32-exact erf polynomial in fp32)
    mlp_dim = w1_ref.shape[1]
    chunk = _mlp_chunk(mlp_dim, 512)
    mlp_out = b2_ref[...].astype(jnp.float32)
    for c0 in range(0, mlp_dim, chunk):
        w1c = w1_ref[:, c0:c0 + chunk]
        b1c = b1_ref[:, c0:c0 + chunk]
        w2c = w2_ref[c0:c0 + chunk, :]
        hid = jnp.dot(h, w1c, preferred_element_type=jnp.float32) \
            + b1c.astype(jnp.float32)
        hid = _gelu32(hid, cdt).astype(cdt)
        mlp_out = mlp_out + jnp.dot(hid, w2c,
                                    preferred_element_type=jnp.float32)
    return x32 + mlp_out


def _block_kernel(x_ref, an_s_ref, an_b_ref, wqkv_ref, wout_ref, bout_ref,
                  fn_s_ref, fn_b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                  *, n_valid: int, heads: int, dim_head: int, tb: int,
                  scale: float):
    np_ = x_ref.shape[1]
    d = x_ref.shape[2]
    cdt = x_ref.dtype

    x32 = x_ref[...].reshape(tb * np_, d).astype(jnp.float32)
    w = (an_s_ref, an_b_ref, wqkv_ref, wout_ref, bout_ref, fn_s_ref,
         fn_b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    x32 = _block_body(x32, w, n_valid=n_valid, heads=heads, dim_head=dim_head,
                      tb=tb, np_=np_, scale=scale, cdt=cdt)
    o_ref[...] = x32.reshape(tb, np_, d).astype(o_ref.dtype)


def _block_params_flat(params: Dict[str, Any], dtype):
    """Flatten a TransformerBlock param tree (models/layers.py paths) into
    the kernel argument order."""
    c = lambda a: jnp.asarray(a, dtype)
    return (
        c(params["attn_norm"]["scale"]).reshape(1, -1),
        c(params["attn_norm"]["bias"]).reshape(1, -1),
        c(params["attn"]["to_qkv"]["kernel"]),
        c(params["attn"]["to_out"]["kernel"]),
        c(params["attn"]["to_out"]["bias"]).reshape(1, -1),
        c(params["ff_norm"]["scale"]).reshape(1, -1),
        c(params["ff_norm"]["bias"]).reshape(1, -1),
        c(params["ff"]["fc1"]["kernel"]),
        c(params["ff"]["fc1"]["bias"]).reshape(1, -1),
        c(params["ff"]["fc2"]["kernel"]),
        c(params["ff"]["fc2"]["bias"]).reshape(1, -1),
    )


def _fused_block_fwd_impl(x, flat, *, heads: int, dim_head: int,
                          interpret: bool = False):
    b, n, d = x.shape
    inner = heads * dim_head
    mlp_dim = flat[7].shape[1]
    np_ = _round_up(n, 8)
    xp = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)))
    tb = 8
    while b % tb != 0:
        tb //= 2
    kern = functools.partial(_block_kernel, n_valid=n, heads=heads,
                             dim_head=dim_head, tb=tb,
                             scale=dim_head ** -0.5)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, np_, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((1, d)), full((1, d)),                  # attn norm
            full((d, 3 * inner)), full((inner, d)), full((1, d)),  # attn
            full((1, d)), full((1, d)),                  # ff norm
            full((d, mlp_dim)), full((1, mlp_dim)),      # fc1
            full((mlp_dim, d)), full((1, d)),            # fc2
        ],
        out_specs=pl.BlockSpec((tb, np_, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * np_ * (2 * d * 3 * inner + 4 * heads * np_ * dim_head
                             + 2 * inner * d + 4 * d * mlp_dim),
            bytes_accessed=2 * b * np_ * d * 4,
            transcendentals=b * np_ * (heads * np_ + mlp_dim),
        ),
        interpret=interpret,
    )(xp, *flat)
    return out[:, :n, :]


def _gelu_grad32(z, cdt=jnp.float32):
    """d(gelu)/dz matching _gelu32's mode: tanh-form derivative in bf16
    compute, exact Phi + z*phi in fp32."""
    if cdt == jnp.bfloat16:
        z2 = z * z
        inner = _SQRT_2_OVER_PI * (z + _GELU_C * z * z2)
        t = jnp.tanh(inner)
        dinner = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * z2)
        return 0.5 * (1.0 + t) + 0.5 * z * (1.0 - t * t) * dinner
    inv_sqrt2pi = np.float32(0.3989422804014327)
    phi = 0.5 * (1.0 + _erf32(z * _INV_SQRT2))
    return phi + z * inv_sqrt2pi * jnp.exp(-0.5 * z * z)


def _ln_fwd_stats(x32, scale, bias, eps=1e-5):
    m = jnp.mean(x32, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(x32 - m), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(v + eps)
    xhat = (x32 - m) * rstd
    return xhat, rstd, xhat * scale + bias


def _ln_bwd(dh32, xhat, rstd, scale):
    """Given upstream grad dh (f32) of LN output, return (dx, dscale, dbias);
    dscale/dbias summed over rows -> (1, d)."""
    dxhat = dh32 * scale
    dscale = jnp.sum(dh32 * xhat, axis=0, keepdims=True)
    dbias = jnp.sum(dh32, axis=0, keepdims=True)
    mean_d = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean_dx = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - mean_d - xhat * mean_dx)
    return dx, dscale, dbias


def _block_bwd_body(x32, dy32, w, g, *, n_valid: int, heads: int,
                    dim_head: int, tb: int, np_: int, scale: float, cdt,
                    chunk_default: int = 512):
    """Value-level full-block backward: recompute the forward from x32 (fp32,
    (tb*np_, d)) in VMEM, then reverse-mode by hand. `w` is the 11-tuple of
    weight refs (kernel argument order, see `_block_params_flat`); `g` the
    matching 11-tuple of fp32 grad ACCUMULATOR refs (+= into them — callers
    zero them at grid step 0). Returns dx32 (fp32). Shared by the per-block
    backward kernel here and the whole-trunk train kernel
    (ops/trunk_train.py)."""
    (an_s_ref, an_b_ref, wqkv_ref, wout_ref, bout_ref, fn_s_ref, fn_b_ref,
     w1_ref, b1_ref, w2_ref, b2_ref) = w
    (dan_s_ref, dan_b_ref, dwqkv_ref, dwout_ref, dbout_ref, dfn_s_ref,
     dfn_b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref) = g
    d = x32.shape[1]
    inner = heads * dim_head
    rows = tb * np_
    dy_c = dy32.astype(cdt)

    # ---- recompute forward: LN1 -> qkv -> attention -> x1 ------------------
    a_s32 = an_s_ref[...].astype(jnp.float32)
    xhat1, rstd1, h1_32 = _ln_fwd_stats(x32, a_s32,
                                        an_b_ref[...].astype(jnp.float32))
    h1 = h1_32.astype(cdt)
    qkv = jnp.dot(h1, wqkv_ref[...],
                  preferred_element_type=jnp.float32).astype(cdt)

    neg = jnp.finfo(jnp.float32).min
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), dimension=1)
    mask = col < n_valid

    probs = []          # per (frame, head) softmax maps, kept in VMEM
    outs = []
    for f in range(tb):
        row0 = f * np_
        frame = jax.lax.slice(qkv, (row0, 0), (row0 + np_, 3 * inner))
        head_outs = []
        head_probs = []
        for hd in range(heads):
            q = jax.lax.slice(frame, (0, hd * dim_head),
                              (np_, (hd + 1) * dim_head))
            k = jax.lax.slice(frame, (0, inner + hd * dim_head),
                              (np_, inner + (hd + 1) * dim_head))
            v = jax.lax.slice(frame, (0, 2 * inner + hd * dim_head),
                              (np_, 2 * inner + (hd + 1) * dim_head))
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(mask, s, neg)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p32 = e / jnp.sum(e, axis=-1, keepdims=True)
            head_probs.append(p32)
            head_outs.append(jnp.dot(p32.astype(cdt), v,
                                     preferred_element_type=jnp.float32)
                             .astype(cdt))
        probs.append(head_probs)
        outs.append(jnp.concatenate(head_outs, axis=1))
    o = jnp.concatenate(outs, axis=0)                       # (rows, inner) cdt
    attn_out = jnp.dot(o, wout_ref[...], preferred_element_type=jnp.float32) \
        + bout_ref[...].astype(jnp.float32)
    x1 = x32 + attn_out

    # ---- MLP forward+backward, chunked over the hidden dim -----------------
    f_s32 = fn_s_ref[...].astype(jnp.float32)
    xhat2, rstd2, h2_32 = _ln_fwd_stats(x1, f_s32,
                                        fn_b_ref[...].astype(jnp.float32))
    h2 = h2_32.astype(cdt)
    mlp_dim = w1_ref.shape[1]
    chunk = _mlp_chunk(mlp_dim, chunk_default)
    dh2_32 = jnp.zeros((rows, d), jnp.float32)
    for c0 in range(0, mlp_dim, chunk):
        w1c = w1_ref[:, c0:c0 + chunk]
        b1c = b1_ref[:, c0:c0 + chunk]
        w2c = w2_ref[c0:c0 + chunk, :]
        pre = jnp.dot(h2, w1c, preferred_element_type=jnp.float32) \
            + b1c.astype(jnp.float32)
        hid = _gelu32(pre, cdt).astype(cdt)
        # dmlp = dy (y = x1 + mlp)
        dhid = jax.lax.dot_general(          # dy @ w2c^T
            dy_c, w2c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dpre = dhid * _gelu_grad32(pre, cdt)
        dpre_c = dpre.astype(cdt)
        dw1_ref[:, c0:c0 + chunk] += jax.lax.dot_general(   # h2^T @ dpre
            h2, dpre_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1_ref[:, c0:c0 + chunk] += jnp.sum(dpre, axis=0, keepdims=True)
        dw2_ref[c0:c0 + chunk, :] += jax.lax.dot_general(   # hid^T @ dy
            hid, dy_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh2_32 = dh2_32 + jax.lax.dot_general(              # dpre @ w1c^T
            dpre_c, w1c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dy32, axis=0, keepdims=True)

    dln2_x, dfs, dfb = _ln_bwd(dh2_32, xhat2, rstd2, f_s32)
    dfn_s_ref[...] += dfs
    dfn_b_ref[...] += dfb
    g1 = dy32 + dln2_x                                      # dL/dx1 (f32)
    g1_c = g1.astype(cdt)

    # ---- attention backward -------------------------------------------------
    dbout_ref[...] += jnp.sum(g1, axis=0, keepdims=True)
    dwout_ref[...] += jax.lax.dot_general(                  # o^T @ g1
        o, g1_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    do = jax.lax.dot_general(                               # g1 @ wout^T
        g1_c, wout_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (rows, inner)

    dq_frames, dk_frames, dv_frames = [], [], []
    for f in range(tb):
        row0 = f * np_
        frame = jax.lax.slice(qkv, (row0, 0), (row0 + np_, 3 * inner))
        do_f = jax.lax.slice(do, (row0, 0), (row0 + np_, inner))
        dqs, dks, dvs = [], [], []
        for hd in range(heads):
            q = jax.lax.slice(frame, (0, hd * dim_head),
                              (np_, (hd + 1) * dim_head))
            k = jax.lax.slice(frame, (0, inner + hd * dim_head),
                              (np_, inner + (hd + 1) * dim_head))
            v = jax.lax.slice(frame, (0, 2 * inner + hd * dim_head),
                              (np_, 2 * inner + (hd + 1) * dim_head))
            p32 = probs[f][hd]
            p_c = p32.astype(cdt)
            do_h = jax.lax.slice(do_f, (0, hd * dim_head),
                                 (np_, (hd + 1) * dim_head)).astype(cdt)
            dv = jax.lax.dot_general(                       # p^T @ do_h
                p_c, do_h, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(                       # do_h @ v^T
                do_h, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
            ds = (ds * scale).astype(cdt)
            dqs.append(jnp.dot(ds, k, preferred_element_type=jnp.float32))
            dks.append(jax.lax.dot_general(                 # ds^T @ q
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dvs.append(dv)
        dq_frames.append(jnp.concatenate(dqs, axis=1))
        dk_frames.append(jnp.concatenate(dks, axis=1))
        dv_frames.append(jnp.concatenate(dvs, axis=1))
    dqkv = jnp.concatenate([jnp.concatenate(dq_frames, axis=0),
                            jnp.concatenate(dk_frames, axis=0),
                            jnp.concatenate(dv_frames, axis=0)], axis=1)
    dqkv_c = dqkv.astype(cdt)

    dwqkv_ref[...] += jax.lax.dot_general(                  # h1^T @ dqkv
        h1, dqkv_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh1_32 = jax.lax.dot_general(                           # dqkv @ wqkv^T
        dqkv_c, wqkv_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dln1_x, das, dab = _ln_bwd(dh1_32, xhat1, rstd1, a_s32)
    dan_s_ref[...] += das
    dan_b_ref[...] += dab

    return g1 + dln1_x


def _block_bwd_kernel(x_ref, dy_ref, an_s_ref, an_b_ref, wqkv_ref, wout_ref,
                      bout_ref, fn_s_ref, fn_b_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref,
                      dx_ref, dan_s_ref, dan_b_ref, dwqkv_ref, dwout_ref,
                      dbout_ref, dfn_s_ref, dfn_b_ref, dw1_ref, db1_ref,
                      dw2_ref, db2_ref,
                      *, n_valid: int, heads: int, dim_head: int, tb: int,
                      scale: float):
    """Full block backward for one frame tile: recompute fwd in VMEM, then
    reverse-mode by hand (see `_block_bwd_body`). Weight grads accumulate
    across the (sequential) grid into constant-index output blocks."""
    np_ = x_ref.shape[1]
    d = x_ref.shape[2]
    cdt = x_ref.dtype
    rows = tb * np_

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dan_s_ref, dan_b_ref, dwqkv_ref, dwout_ref, dbout_ref,
                    dfn_s_ref, dfn_b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    x32 = x_ref[...].reshape(rows, d).astype(jnp.float32)
    dy32 = dy_ref[...].reshape(rows, d).astype(jnp.float32)
    w = (an_s_ref, an_b_ref, wqkv_ref, wout_ref, bout_ref, fn_s_ref,
         fn_b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    g = (dan_s_ref, dan_b_ref, dwqkv_ref, dwout_ref, dbout_ref, dfn_s_ref,
         dfn_b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref)
    dx = _block_bwd_body(x32, dy32, w, g, n_valid=n_valid, heads=heads,
                         dim_head=dim_head, tb=tb, np_=np_, scale=scale,
                         cdt=cdt)
    dx_ref[...] = dx.reshape(tb, np_, d).astype(dx_ref.dtype)


def _fused_block_bwd_impl(x, dy, flat, *, heads: int, dim_head: int,
                          interpret: bool = False):
    """Pad, launch the backward kernel, unpad. Returns (dx, dflat)."""
    b, n, d = x.shape
    inner = heads * dim_head
    mlp_dim = flat[7].shape[1]
    np_ = _round_up(n, 8)
    xp = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)))
    dyp = jnp.pad(dy, ((0, 0), (0, np_ - n), (0, 0)))
    tb = 8
    while b % tb != 0:
        tb //= 2
    kern = functools.partial(_block_bwd_kernel, n_valid=n, heads=heads,
                             dim_head=dim_head, tb=tb,
                             scale=dim_head ** -0.5)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    grad_shapes = [(1, d), (1, d), (d, 3 * inner), (inner, d), (1, d),
                   (1, d), (1, d), (d, mlp_dim), (1, mlp_dim),
                   (mlp_dim, d), (1, d)]
    outs = pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, np_, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, np_, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((1, d)), full((1, d)),
            full((d, 3 * inner)), full((inner, d)), full((1, d)),
            full((1, d)), full((1, d)),
            full((d, mlp_dim)), full((1, mlp_dim)),
            full((mlp_dim, d)), full((1, d)),
        ],
        out_specs=tuple(
            [pl.BlockSpec((tb, np_, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)]
            + [full(s) for s in grad_shapes]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((b, np_, d), x.dtype)]
            + [jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes]),
        cost_estimate=pl.CostEstimate(
            flops=b * np_ * (6 * d * 3 * inner + 12 * heads * np_ * dim_head
                             + 6 * inner * d + 12 * d * mlp_dim),
            bytes_accessed=4 * b * np_ * d * 4,
            transcendentals=b * np_ * (heads * np_ + 2 * mlp_dim),
        ),
        interpret=interpret,
    )(xp, dyp, *flat)
    dx = outs[0][:, :n, :]
    dflat = tuple(g.astype(w.dtype) for g, w in zip(outs[1:], flat))
    return dx, dflat


def _block_xla(x, flat, *, heads: int, dim_head: int):
    """Reference twin (identical math, unfused) for the backward pass."""
    (an_s, an_b, wqkv, wout, bout, fn_s, fn_b, w1, b1, w2, b2) = flat
    b, n, d = x.shape
    inner = heads * dim_head
    x32 = x.astype(jnp.float32)
    h = _ln(x32, an_s.reshape(-1).astype(jnp.float32),
            an_b.reshape(-1).astype(jnp.float32)).astype(x.dtype)
    qkv = jnp.dot(h, wqkv).reshape(b, n, 3, heads, dim_head)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * dim_head ** -0.5
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, inner)
    x32 = x32 + (jnp.dot(o, wout) + bout.reshape(-1)).astype(jnp.float32)
    h = _ln(x32, fn_s.reshape(-1).astype(jnp.float32),
            fn_b.reshape(-1).astype(jnp.float32)).astype(x.dtype)
    hid = jax.nn.gelu((jnp.dot(h, w1) + b1.reshape(-1)).astype(jnp.float32),
                      approximate=False).astype(x.dtype)
    x32 = x32 + (jnp.dot(hid, w2) + b2.reshape(-1)).astype(jnp.float32)
    return x32.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_transformer_block(x, flat, heads: int, dim_head: int,
                            interpret: bool = False):
    return _fused_block_fwd_impl(x, flat, heads=heads, dim_head=dim_head,
                                 interpret=interpret)


def _fwd(x, flat, heads, dim_head, interpret):
    y = _fused_block_fwd_impl(x, flat, heads=heads, dim_head=dim_head,
                              interpret=interpret)
    return y, (x, flat)


def _bwd(heads, dim_head, interpret, res, g):
    x, flat = res
    return _fused_block_bwd_impl(x, g, flat, heads=heads, dim_head=dim_head,
                                 interpret=interpret)


fused_transformer_block.defvjp(_fwd, _bwd)
