"""CLS-only final transformer block — fused fwd AND bwd Pallas kernels.

GoT pools the goal token after the last block (GoalFormer.py:167 `x[:, 0]`),
so the final block's q / attention / out-projection / MLP only matter for
the CLS row of each frame; only k/v need the full row set. This op computes
exactly `TransformerBlock(x)[:, 0]` at ~1/72 of the q/MLP work, and its
backward exploits the same sparsity: the upstream gradient is nonzero ONLY
on CLS rows, so the MLP/out-proj/q gradients run on (tb, d) rows while the
k/v path still produces full-row input gradients.

Used by models/layers.py `Transformer(cls_final=True)` for every training
and TD-target forward (the no-grad inference path uses the whole-trunk
megakernel instead, ops/got_megakernel.py, which embeds the same CLS-only
final block)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgvit_tpu.ops.fused_transformer import (_block_xla, _gelu32,
                                             _gelu_grad32, _ln_bwd,
                                             _ln_fwd_stats, _mlp_chunk,
                                             _round_up)
from dgvit_tpu.ops.got_megakernel import _block_body_cls


def _cls_fwd_kernel(x_ref, an_s_ref, an_b_ref, wqkv_ref, wout_ref, bout_ref,
                    fn_s_ref, fn_b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                    *, n_valid: int, heads: int, dim_head: int, tb: int,
                    scale: float):
    np_ = x_ref.shape[1]
    d = x_ref.shape[2]
    cdt = x_ref.dtype
    x32 = x_ref[...].reshape(tb * np_, d).astype(jnp.float32)
    w = (an_s_ref, an_b_ref, wqkv_ref, wout_ref, bout_ref, fn_s_ref,
         fn_b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    cls = _block_body_cls(x32, w, n_valid=n_valid, heads=heads,
                          dim_head=dim_head, tb=tb, np_=np_, scale=scale,
                          cdt=cdt)
    o_ref[...] = cls.astype(o_ref.dtype)


def _cls_bwd_body(x32, dy32, w, g, *, n_valid: int, heads: int,
                  dim_head: int, tb: int, np_: int, scale: float, cdt,
                  chunk_default: int = 512):
    """Value-level backward of the CLS-only block: x32 is the fp32
    (tb*np_, d) input stream, dy32 the fp32 (tb, d) gradient of the pooled
    CLS outputs. Recomputes the forward in VMEM, then reverse-mode by hand
    on the row-sparse structure. `w`/`g` are the 11-tuples of weight refs /
    fp32 grad accumulator refs (callers zero `g` at grid step 0). Returns
    dx32 (fp32, (tb*np_, d)). Shared by the per-block kernel here and the
    whole-trunk train kernel (ops/trunk_train.py)."""
    (an_s_ref, an_b_ref, wqkv_ref, wout_ref, bout_ref, fn_s_ref, fn_b_ref,
     w1_ref, b1_ref, w2_ref, b2_ref) = w
    (dan_s_ref, dan_b_ref, dwqkv_ref, dwout_ref, dbout_ref, dfn_s_ref,
     dfn_b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref) = g
    d = x32.shape[1]
    inner = heads * dim_head
    rows = tb * np_
    dy_c = dy32.astype(cdt)

    # ---- recompute forward ---------------------------------------------------
    a_s32 = an_s_ref[...].astype(jnp.float32)
    xhat1, rstd1, h1_32 = _ln_fwd_stats(x32, a_s32,
                                        an_b_ref[...].astype(jnp.float32))
    h1 = h1_32.astype(cdt)                                   # (rows, d)
    kv = jnp.dot(h1, wqkv_ref[:, inner:],
                 preferred_element_type=jnp.float32).astype(cdt)

    x32_cls = jnp.concatenate(
        [jax.lax.slice(x32, (f * np_, 0), (f * np_ + 1, d))
         for f in range(tb)], axis=0)                        # (tb, d) f32
    h_cls = jnp.concatenate(
        [jax.lax.slice(h1, (f * np_, 0), (f * np_ + 1, d))
         for f in range(tb)], axis=0)                        # (tb, d) cdt
    q_all = jnp.dot(h_cls, wqkv_ref[:, :inner],
                    preferred_element_type=jnp.float32).astype(cdt)

    neg = jnp.finfo(jnp.float32).min
    col = jax.lax.broadcasted_iota(jnp.int32, (1, np_), dimension=1)
    mask = col < n_valid

    probs = []                                               # (tb)(heads)(1,np_)
    outs = []
    for f in range(tb):
        kvf = jax.lax.slice(kv, (f * np_, 0), ((f + 1) * np_, 2 * inner))
        head_outs, head_probs = [], []
        for hd in range(heads):
            q = jax.lax.slice(q_all, (f, hd * dim_head),
                              (f + 1, (hd + 1) * dim_head))
            k = jax.lax.slice(kvf, (0, hd * dim_head),
                              (np_, (hd + 1) * dim_head))
            v = jax.lax.slice(kvf, (0, inner + hd * dim_head),
                              (np_, inner + (hd + 1) * dim_head))
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
    o = jnp.concatenate(outs, axis=0)                        # (tb, inner)
    attn_out = jnp.dot(o, wout_ref[...], preferred_element_type=jnp.float32) \
        + bout_ref[...].astype(jnp.float32)
    x1 = x32_cls + attn_out                                  # (tb, d) f32

    # ---- MLP fwd+bwd on CLS rows only -----------------------------------------
    f_s32 = fn_s_ref[...].astype(jnp.float32)
    xhat2, rstd2, h2_32 = _ln_fwd_stats(x1, f_s32,
                                        fn_b_ref[...].astype(jnp.float32))
    h2 = h2_32.astype(cdt)
    mlp_dim = w1_ref.shape[1]
    chunk = _mlp_chunk(mlp_dim, chunk_default)
    dh2_32 = jnp.zeros((tb, d), jnp.float32)
    for c0 in range(0, mlp_dim, chunk):
        w1c = w1_ref[:, c0:c0 + chunk]
        b1c = b1_ref[:, c0:c0 + chunk]
        w2c = w2_ref[c0:c0 + chunk, :]
        pre = jnp.dot(h2, w1c, preferred_element_type=jnp.float32) \
            + b1c.astype(jnp.float32)
        hid = _gelu32(pre, cdt).astype(cdt)
        dhid = jax.lax.dot_general(
            dy_c, w2c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dpre = dhid * _gelu_grad32(pre, cdt)
        dpre_c = dpre.astype(cdt)
        dw1_ref[:, c0:c0 + chunk] += jax.lax.dot_general(
            h2, dpre_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1_ref[:, c0:c0 + chunk] += jnp.sum(dpre, axis=0, keepdims=True)
        dw2_ref[c0:c0 + chunk, :] += jax.lax.dot_general(
            hid, dy_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh2_32 = dh2_32 + jax.lax.dot_general(
            dpre_c, w1c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dy32, axis=0, keepdims=True)

    dln2_x, dfs, dfb = _ln_bwd(dh2_32, xhat2, rstd2, f_s32)
    dfn_s_ref[...] += dfs
    dfn_b_ref[...] += dfb
    g1 = dy32 + dln2_x                                       # dL/dx1 (tb, d)
    g1_c = g1.astype(cdt)

    # ---- attention backward ----------------------------------------------------
    dbout_ref[...] += jnp.sum(g1, axis=0, keepdims=True)
    dwout_ref[...] += jax.lax.dot_general(                   # o^T @ g1
        o, g1_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    do = jax.lax.dot_general(                                # g1 @ wout^T
        g1_c, wout_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (tb, inner)

    dq_rows = []                                             # (tb, inner)
    dkv_frames = []                                          # per frame (np_, 2*inner)
    for f in range(tb):
        kvf = jax.lax.slice(kv, (f * np_, 0), ((f + 1) * np_, 2 * inner))
        do_f = jax.lax.slice(do, (f, 0), (f + 1, inner))
        dqs, dks, dvs = [], [], []
        for hd in range(heads):
            q = jax.lax.slice(q_all, (f, hd * dim_head),
                              (f + 1, (hd + 1) * dim_head))
            k = jax.lax.slice(kvf, (0, hd * dim_head),
                              (np_, (hd + 1) * dim_head))
            v = jax.lax.slice(kvf, (0, inner + hd * dim_head),
                              (np_, inner + (hd + 1) * dim_head))
            p32 = probs[f][hd]                               # (1, np_)
            p_c = p32.astype(cdt)
            do_h = jax.lax.slice(do_f, (0, hd * dim_head),
                                 (0 + 1, (hd + 1) * dim_head)).astype(cdt)
            dv = jax.lax.dot_general(                        # p^T @ do_h -> (np_, dh)
                p_c, do_h, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(                        # do_h @ v^T -> (1, np_)
                do_h, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
            ds = (ds * scale).astype(cdt)                    # (1, np_)
            dqs.append(jnp.dot(ds, k, preferred_element_type=jnp.float32))
            dks.append(jax.lax.dot_general(                  # ds^T @ q -> (np_, dh)
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dvs.append(dv)
        dq_rows.append(jnp.concatenate(dqs, axis=1))         # (1, inner)
        dkv_frames.append(jnp.concatenate(
            [jnp.concatenate(dks, axis=1), jnp.concatenate(dvs, axis=1)],
            axis=1))                                         # (np_, 2*inner)
    dq = jnp.concatenate(dq_rows, axis=0)                    # (tb, inner) f32
    dkv = jnp.concatenate(dkv_frames, axis=0)                # (rows, 2*inner)
    dq_c = dq.astype(cdt)
    dkv_c = dkv.astype(cdt)

    # wqkv grads: q columns from CLS rows, kv columns from all rows
    dwqkv_ref[:, :inner] += jax.lax.dot_general(             # h_cls^T @ dq
        h_cls, dq_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwqkv_ref[:, inner:] += jax.lax.dot_general(             # h1^T @ dkv
        h1, dkv_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # dh1: kv path on all rows + q path scattered onto CLS rows
    dh1_32 = jax.lax.dot_general(                            # dkv @ wkv^T
        dkv_c, wqkv_ref[:, inner:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (rows, d)
    dh1_q = jax.lax.dot_general(                             # dq @ wq^T
        dq_c, wqkv_ref[:, :inner],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (tb, d)

    # scatter the CLS-row contributions (dh1_q rows, and the g1 residual)
    # onto rows f*np_ via per-frame reassembly
    frames = []
    for f in range(tb):
        base = jax.lax.slice(dh1_32, (f * np_, 0), ((f + 1) * np_, d))
        row0 = jax.lax.slice(base, (0, 0), (1, d)) \
            + jax.lax.slice(dh1_q, (f, 0), (f + 1, d))
        frames.append(jnp.concatenate(
            [row0, jax.lax.slice(base, (1, 0), (np_, d))], axis=0))
    dh1_full = jnp.concatenate(frames, axis=0)               # (rows, d)

    dln1_x, das, dab = _ln_bwd(dh1_full, xhat1, rstd1, a_s32)
    dan_s_ref[...] += das
    dan_b_ref[...] += dab

    # residual: dL/dx gets g1 on CLS rows (x1 = x_cls + attn_out)
    res_frames = []
    for f in range(tb):
        base = jax.lax.slice(dln1_x, (f * np_, 0), ((f + 1) * np_, d))
        row0 = jax.lax.slice(base, (0, 0), (1, d)) \
            + jax.lax.slice(g1, (f, 0), (f + 1, d))
        res_frames.append(jnp.concatenate(
            [row0, jax.lax.slice(base, (1, 0), (np_, d))], axis=0))
    return jnp.concatenate(res_frames, axis=0)


def _cls_bwd_kernel(x_ref, dy_ref, an_s_ref, an_b_ref, wqkv_ref, wout_ref,
                    bout_ref, fn_s_ref, fn_b_ref, w1_ref, b1_ref, w2_ref,
                    b2_ref,
                    dx_ref, dan_s_ref, dan_b_ref, dwqkv_ref, dwout_ref,
                    dbout_ref, dfn_s_ref, dfn_b_ref, dw1_ref, db1_ref,
                    dw2_ref, db2_ref,
                    *, n_valid: int, heads: int, dim_head: int, tb: int,
                    scale: float):
    """Backward of the CLS-only block (see `_cls_bwd_body`). Weight grads
    accumulate across the sequential grid."""
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
    dy32 = dy_ref[...].astype(jnp.float32)                   # (tb, d)
    w = (an_s_ref, an_b_ref, wqkv_ref, wout_ref, bout_ref, fn_s_ref,
         fn_b_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    g = (dan_s_ref, dan_b_ref, dwqkv_ref, dwout_ref, dbout_ref, dfn_s_ref,
         dfn_b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref)
    dx = _cls_bwd_body(x32, dy32, w, g, n_valid=n_valid, heads=heads,
                       dim_head=dim_head, tb=tb, np_=np_, scale=scale,
                       cdt=cdt)
    dx_ref[...] = dx.reshape(tb, np_, d).astype(dx_ref.dtype)


def _cls_fwd_impl(x, flat, *, heads: int, dim_head: int,
                  interpret: bool = False):
    b, n, d = x.shape
    inner = heads * dim_head
    mlp_dim = flat[7].shape[1]
    np_ = _round_up(n, 8)
    tb = 8
    b_pad = _round_up(b, tb)
    xp = jnp.pad(x, ((0, b_pad - b), (0, np_ - n), (0, 0)))
    kern = functools.partial(_cls_fwd_kernel, n_valid=n, heads=heads,
                             dim_head=dim_head, tb=tb, scale=dim_head ** -0.5)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, np_, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((1, d)), full((1, d)),
            full((d, 3 * inner)), full((inner, d)), full((1, d)),
            full((1, d)), full((1, d)),
            full((d, mlp_dim)), full((1, mlp_dim)),
            full((mlp_dim, d)), full((1, d)),
        ],
        out_specs=pl.BlockSpec((tb, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * np_ * (2 * d * 2 * inner + 4 * heads * dim_head)
            + b * (2 * d * inner + 2 * inner * d + 4 * d * mlp_dim),
            bytes_accessed=b * np_ * d * 4 + b * d * 4,
            transcendentals=b * (heads * np_ + mlp_dim),
        ),
        interpret=interpret,
    )(xp, *flat)
    return out[:b]


def _cls_bwd_impl(x, dy, flat, *, heads: int, dim_head: int,
                  interpret: bool = False):
    b, n, d = x.shape
    inner = heads * dim_head
    mlp_dim = flat[7].shape[1]
    np_ = _round_up(n, 8)
    tb = 8
    b_pad = _round_up(b, tb)
    xp = jnp.pad(x, ((0, b_pad - b), (0, np_ - n), (0, 0)))
    dyp = jnp.pad(dy, ((0, b_pad - b), (0, 0)))
    kern = functools.partial(_cls_bwd_kernel, n_valid=n, heads=heads,
                             dim_head=dim_head, tb=tb, scale=dim_head ** -0.5)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    grad_shapes = [(1, d), (1, d), (d, 3 * inner), (inner, d), (1, d),
                   (1, d), (1, d), (d, mlp_dim), (1, mlp_dim),
                   (mlp_dim, d), (1, d)]
    outs = pl.pallas_call(
        kern,
        grid=(b_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, np_, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
            [jax.ShapeDtypeStruct((b_pad, np_, d), x.dtype)]
            + [jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes]),
        interpret=interpret,
    )(xp, dyp, *flat)
    dx = outs[0][:b, :n, :]
    dflat = tuple(g.astype(w.dtype) for g, w in zip(outs[1:], flat))
    return dx, dflat


def _cls_block_xla(x, flat, *, heads: int, dim_head: int):
    """Reference twin: full block then CLS pool."""
    return _block_xla(x, flat, heads=heads, dim_head=dim_head)[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def cls_final_block(x, flat, heads: int, dim_head: int,
                    interpret: bool = False):
    """`TransformerBlock(x)[:, 0]` fused: (B, n, d) -> (B, d)."""
    return _cls_fwd_impl(x, flat, heads=heads, dim_head=dim_head,
                         interpret=interpret)


def _fwd(x, flat, heads, dim_head, interpret):
    y = _cls_fwd_impl(x, flat, heads=heads, dim_head=dim_head,
                      interpret=interpret)
    return y, (x, flat)


def _bwd(heads, dim_head, interpret, res, g):
    x, flat = res
    return _cls_bwd_impl(x, g, flat, heads=heads, dim_head=dim_head,
                         interpret=interpret)


cls_final_block.defvjp(_fwd, _bwd)
