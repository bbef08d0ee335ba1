"""Whole-network GoT forward megakernel — ONE Pallas program per frame tile.

Fuses the ENTIRE GoT trunk (GoalFormer.py:156-171) into a single kernel
launch: patch-embed matmul + goal-token assembly + positional add ->
depth-1 full pre-norm transformer blocks -> a CLS-ONLY final block -> final
RMS/Layer norm. Compared to the per-block fused kernels
(ops/fused_transformer.py) this removes

  * the XLA embed/pool/norm glue sections between kernel launches,
  * depth-1 HBM round trips of the (B, 72, 64) residual stream,
  * ~71/72 of the final block's q/out-proj/MLP work: only the goal token
    (GoalFormer.py:167 `x[:, 0]`) survives pooling, so the last block
    computes k/v for all rows but q, attention, projection and MLP for the
    CLS row alone.

Patchify (the pure data-movement rearrange, GoalFormer.py:137) stays in XLA
— it is HBM-bandwidth bound either way and Mosaic has no strided reshape.

This is the INFERENCE path (choose_action / evaluation / bench). Gradient-
bearing forwards keep the per-block custom-vjp kernels: a mega forward would
force the backward to re-derive every block input, costing more than the
glue it saves. A custom_vjp is still defined (backward = jax.vjp of the XLA
twin) so a stray gradient is correct, just not fast.

Numerics match the per-block path: fp32 norms/softmax/accumulation, matmul
operands in the compute dtype, and the residual stream is cast to the
compute dtype at block boundaries exactly where the per-block path round-
trips HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgvit_tpu.ops.fused_transformer import (_block_body, _block_xla, _gelu32,
                                             _ln, _mlp_chunk, _round_up)


def _final_norm32(cls, fs, fb, final_norm: str):
    """Final RMS/Layer norm on fp32 CLS rows (models/layers.py semantics);
    fs/fb are (1, d) fp32. Shared by both kernels and both XLA twins."""
    d = cls.shape[-1]
    if final_norm == "rms":
        norm = jnp.sqrt(jnp.sum(cls * cls, axis=-1, keepdims=True))
        return cls / jnp.maximum(norm, 1e-12) * (d ** 0.5) * fs
    m = jnp.mean(cls, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(cls - m), axis=-1, keepdims=True)
    return (cls - m) * jax.lax.rsqrt(v + 1e-5) * fs + fb


def _block_body_cls(x32, w, *, n_valid: int, heads: int, dim_head: int,
                    tb: int, np_: int, scale: float, cdt):
    """Final pre-norm block computed for the CLS (goal) row of each frame
    only. k/v need every row; q / attention / out-proj / MLP run on the tb
    CLS rows. Returns (tb, d) fp32 — bit-matching rows 0 of `_block_body`."""
    (an_s_ref, an_b_ref, wqkv_ref, wout_ref, bout_ref, fn_s_ref, fn_b_ref,
     w1_ref, b1_ref, w2_ref, b2_ref) = w
    d = x32.shape[1]
    inner = heads * dim_head

    h = _ln(x32, an_s_ref[...].astype(jnp.float32),
            an_b_ref[...].astype(jnp.float32)).astype(cdt)
    kv = jnp.dot(h, wqkv_ref[:, inner:],
                 preferred_element_type=jnp.float32).astype(cdt)

    cls_rows = [jax.lax.slice(x32, (f * np_, 0), (f * np_ + 1, d))
                for f in range(tb)]
    x32_cls = jnp.concatenate(cls_rows, axis=0)              # (tb, d) f32
    h_cls = jnp.concatenate(
        [jax.lax.slice(h, (f * np_, 0), (f * np_ + 1, d)) for f in range(tb)],
        axis=0)                                              # (tb, d) cdt
    q_all = jnp.dot(h_cls, wqkv_ref[:, :inner],
                    preferred_element_type=jnp.float32).astype(cdt)

    neg = jnp.finfo(jnp.float32).min
    col = jax.lax.broadcasted_iota(jnp.int32, (1, np_), dimension=1)
    mask = col < n_valid

    outs = []
    for f in range(tb):
        kvf = jax.lax.slice(kv, (f * np_, 0), ((f + 1) * np_, 2 * inner))
        head_outs = []
        for hd in range(heads):
            q = jax.lax.slice(q_all, (f, hd * dim_head),
                              (f + 1, (hd + 1) * dim_head))      # (1, dh)
            k = jax.lax.slice(kvf, (0, hd * dim_head),
                              (np_, (hd + 1) * dim_head))
            v = jax.lax.slice(kvf, (0, inner + hd * dim_head),
                              (np_, inner + (hd + 1) * dim_head))
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale      # (1, np_)
            s = jnp.where(mask, s, neg)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
            head_outs.append(jnp.dot(p, v, preferred_element_type=jnp.float32)
                             .astype(cdt))
        outs.append(jnp.concatenate(head_outs, axis=1))          # (1, inner)
    o = jnp.concatenate(outs, axis=0)                            # (tb, inner)
    attn_out = jnp.dot(o, wout_ref[...], preferred_element_type=jnp.float32) \
        + bout_ref[...].astype(jnp.float32)
    x1 = x32_cls + attn_out

    h2 = _ln(x1, fn_s_ref[...].astype(jnp.float32),
             fn_b_ref[...].astype(jnp.float32)).astype(cdt)
    mlp_dim = w1_ref.shape[1]
    chunk = _mlp_chunk(mlp_dim, 512)
    mlp_out = b2_ref[...].astype(jnp.float32)
    for c0 in range(0, mlp_dim, chunk):
        w1c = w1_ref[:, c0:c0 + chunk]
        b1c = b1_ref[:, c0:c0 + chunk]
        w2c = w2_ref[c0:c0 + chunk, :]
        hid = jnp.dot(h2, w1c, preferred_element_type=jnp.float32) \
            + b1c.astype(jnp.float32)
        hid = _gelu32(hid, cdt).astype(cdt)
        mlp_out = mlp_out + jnp.dot(hid, w2c,
                                    preferred_element_type=jnp.float32)
    return x1 + mlp_out


def _mega_kernel(*refs, n_valid: int, heads: int, dim_head: int, depth: int,
                 tb: int, scale: float, final_norm: str, n_patch: int):
    patches_ref, goal_ref, pos_ref, pew_ref, peb_ref = refs[:5]
    blocks = [tuple(refs[5 + 11 * i: 5 + 11 * (i + 1)]) for i in range(depth)]
    fs_ref, fb_ref = refs[5 + 11 * depth: 7 + 11 * depth]
    o_ref = refs[-1]

    np_ = pos_ref.shape[0]
    d = pos_ref.shape[1]
    pd = patches_ref.shape[2]
    cdt = patches_ref.dtype
    n_pad = np_ - n_patch - 1

    # --- patch embed + goal token + positional add ---------------------------
    pr = patches_ref[...].reshape(tb * n_patch, pd)
    emb = (jnp.dot(pr, pew_ref[...], preferred_element_type=jnp.float32)
           + peb_ref[...].astype(jnp.float32)).astype(cdt)    # (tb*n_patch, d)
    goal = goal_ref[...]                                      # (tb, d) cdt
    pos = pos_ref[...]                                        # (np_, d) cdt

    frames = []
    for f in range(tb):
        emb_f = jax.lax.slice(emb, (f * n_patch, 0), ((f + 1) * n_patch, d))
        g_f = jax.lax.slice(goal, (f, 0), (f + 1, d))
        pad = jnp.zeros((n_pad, d), cdt)
        frames.append(jnp.concatenate([g_f, emb_f, pad], axis=0) + pos)
    x32 = jnp.concatenate(frames, axis=0).astype(jnp.float32)  # (tb*np_, d)

    # --- depth-1 full blocks, residual stream VMEM-resident -------------------
    for i in range(depth - 1):
        x32 = _block_body(x32, blocks[i], n_valid=n_valid, heads=heads,
                          dim_head=dim_head, tb=tb, np_=np_, scale=scale,
                          cdt=cdt)
        # match the per-block path's HBM round trip (cast to compute dtype)
        x32 = x32.astype(cdt).astype(jnp.float32)

    # --- final block: CLS rows only -------------------------------------------
    cls = _block_body_cls(x32, blocks[-1], n_valid=n_valid, heads=heads,
                          dim_head=dim_head, tb=tb, np_=np_, scale=scale,
                          cdt=cdt)
    cls = cls.astype(cdt).astype(jnp.float32)                 # (tb, d)

    # --- final norm (models/layers.py RMSNorm / LayerNorm semantics) ----------
    out = _final_norm32(cls, fs_ref[...].astype(jnp.float32),
                        fb_ref[...].astype(jnp.float32), final_norm)
    o_ref[...] = out.astype(o_ref.dtype)


def _blocks_kernel(*refs, n_valid: int, heads: int, dim_head: int,
                   depth: int, tb: int, scale: float, final_norm: str):
    """Blocks-only megakernel: input is the ASSEMBLED token stream (already
    embedded + goal token + pos + emb-dropout, which stays in XLA because it
    needs the PRNG). Runs depth-1 full blocks + the CLS-only final block +
    final norm in one launch. Serves forwards that need live dropout (the
    reference keeps train-mode dropout in every learn pass, DRL.py) — e.g.
    the no-grad TD-target forwards."""
    x_ref = refs[0]
    blocks = [tuple(refs[1 + 11 * i: 1 + 11 * (i + 1)]) for i in range(depth)]
    fs_ref, fb_ref = refs[1 + 11 * depth: 3 + 11 * depth]
    o_ref = refs[-1]

    np_ = x_ref.shape[1]
    d = x_ref.shape[2]
    cdt = x_ref.dtype

    x32 = x_ref[...].reshape(tb * np_, d).astype(jnp.float32)
    for i in range(depth - 1):
        x32 = _block_body(x32, blocks[i], n_valid=n_valid, heads=heads,
                          dim_head=dim_head, tb=tb, np_=np_, scale=scale,
                          cdt=cdt)
        x32 = x32.astype(cdt).astype(jnp.float32)
    cls = _block_body_cls(x32, blocks[-1], n_valid=n_valid, heads=heads,
                          dim_head=dim_head, tb=tb, np_=np_, scale=scale,
                          cdt=cdt)
    cls = cls.astype(cdt).astype(jnp.float32)

    out = _final_norm32(cls, fs_ref[...].astype(jnp.float32),
                        fb_ref[...].astype(jnp.float32), final_norm)
    o_ref[...] = out.astype(o_ref.dtype)


def _blocks_fwd_impl(x, blocks, fn, *, heads: int, dim_head: int,
                     final_norm: str, interpret: bool = False):
    b, n, d = x.shape
    inner = heads * dim_head
    depth = len(blocks)
    mlp_dim = blocks[0][7].shape[1]
    np_ = _round_up(n, 8)
    tb = 8
    b_pad = _round_up(b, tb)
    xp = jnp.pad(x, ((0, b_pad - b), (0, np_ - n), (0, 0)))
    kern = functools.partial(_blocks_kernel, n_valid=n, heads=heads,
                             dim_head=dim_head, depth=depth, tb=tb,
                             scale=dim_head ** -0.5, final_norm=final_norm)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    block_specs = [full((1, d)), full((1, d)),
                   full((d, 3 * inner)), full((inner, d)), full((1, d)),
                   full((1, d)), full((1, d)),
                   full((d, mlp_dim)), full((1, mlp_dim)),
                   full((mlp_dim, d)), full((1, d))]
    out = pl.pallas_call(
        kern,
        grid=(b_pad // tb,),
        in_specs=([pl.BlockSpec((tb, np_, d), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)]
                  + block_specs * depth
                  + [full((1, d)), full((1, d))]),
        out_specs=pl.BlockSpec((tb, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, d), x.dtype),
        interpret=interpret,
    )(xp, *[w for blk in blocks for w in blk], fn[0], fn[1])
    return out[:b]


def _blocks_xla(x, blocks, fn, *, heads: int, dim_head: int,
                final_norm: str):
    cdt = x.dtype
    d = x.shape[2]
    for w in blocks:
        x = _block_xla(x, w, heads=heads, dim_head=dim_head)
    cls = x[:, 0].astype(jnp.float32)
    out = _final_norm32(cls, fn[0].reshape(1, -1).astype(jnp.float32),
                        fn[1].reshape(1, -1).astype(jnp.float32), final_norm)
    return out.astype(cdt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def blocks_cls_forward_fused(x, blocks, fn, heads: int, dim_head: int,
                             final_norm: str, interpret: bool = False):
    """Fused blocks -> CLS pool -> final norm: (B, n, d) -> (B, d)."""
    return _blocks_fwd_impl(x, blocks, fn, heads=heads, dim_head=dim_head,
                            final_norm=final_norm, interpret=interpret)


def _blocks_vjp_fwd(x, blocks, fn, heads, dim_head, final_norm, interpret):
    y = _blocks_fwd_impl(x, blocks, fn, heads=heads, dim_head=dim_head,
                         final_norm=final_norm, interpret=interpret)
    return y, (x, blocks, fn)


def _blocks_vjp_bwd(heads, dim_head, final_norm, interpret, res, g):
    x, blocks, fn = res
    import os
    if os.environ.get("DGVIT_TRUNK_BWD") == "xla":
        # debugging fallback: differentiate the unfused twin instead
        _, vjp = jax.vjp(
            lambda *a: _blocks_xla(*a, heads=heads, dim_head=dim_head,
                                   final_norm=final_norm),
            x, blocks, fn)
        return vjp(g)
    # ONE recompute-everything backward launch for the whole trunk
    # (ops/trunk_train.py) — the SAC-update fast path
    from dgvit_tpu.ops.trunk_train import trunk_bwd_impl
    return trunk_bwd_impl(x, g, blocks, fn, heads=heads, dim_head=dim_head,
                          final_norm=final_norm, interpret=interpret)


blocks_cls_forward_fused.defvjp(_blocks_vjp_fwd, _blocks_vjp_bwd)


def _mega_fwd_impl(patches, goal, pe, pos, blocks, fn, *, heads: int,
                   dim_head: int, n_valid: int, final_norm: str,
                   interpret: bool = False):
    b, n_patch, pd = patches.shape
    d = goal.shape[1]
    inner = heads * dim_head
    depth = len(blocks)
    mlp_dim = blocks[0][7].shape[1]
    np_ = _round_up(n_valid, 8)
    pos_p = jnp.pad(pos, ((0, np_ - n_valid), (0, 0)))
    import os
    # >=8: Mosaic needs 8 sublanes on the (tb, d) goal/out blocks (the tile
    # sweep in BENCH.md found 8 fastest anyway); values below are clamped
    tb = max(8, int(os.environ.get("DGVIT_MEGA_TB", "8")))
    # Mosaic requires >=8 sublanes on the (tb, d) goal/out blocks: pad the
    # batch up to a tile multiple instead of shrinking the tile (the padded
    # frames are dropped after the call — cheap, everything is VMEM-resident)
    b_pad = _round_up(b, tb)
    if b_pad != b:
        patches = jnp.pad(patches, ((0, b_pad - b), (0, 0), (0, 0)))
        goal = jnp.pad(goal, ((0, b_pad - b), (0, 0)))
    kern = functools.partial(_mega_kernel, n_valid=n_valid, heads=heads,
                             dim_head=dim_head, depth=depth, tb=tb,
                             scale=dim_head ** -0.5, final_norm=final_norm,
                             n_patch=n_patch)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    block_specs = [full((1, d)), full((1, d)),               # attn norm
                   full((d, 3 * inner)), full((inner, d)), full((1, d)),
                   full((1, d)), full((1, d)),               # ff norm
                   full((d, mlp_dim)), full((1, mlp_dim)),
                   full((mlp_dim, d)), full((1, d))]
    in_specs = (
        [pl.BlockSpec((tb, n_patch, pd), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
         full((np_, d)), full((pd, d)), full((1, d))]
        + block_specs * depth
        + [full((1, d)), full((1, d))])
    flat_blocks = [w for blk in blocks for w in blk]
    rows = np_
    out = pl.pallas_call(
        kern,
        grid=(b_pad // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, d), patches.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * (2 * n_patch * pd * d
                       + (depth - 1) * rows * (2 * d * 3 * inner
                                               + 4 * heads * rows * dim_head
                                               + 2 * inner * d
                                               + 4 * d * mlp_dim)
                       + rows * 2 * d * 2 * inner + 4 * d * mlp_dim),
            bytes_accessed=b * (n_patch * pd + 2 * d) * 4,
            transcendentals=b * rows * (heads * rows + mlp_dim) * depth,
        ),
        interpret=interpret,
    )(patches, goal, pos_p, pe[0], pe[1], *flat_blocks, fn[0], fn[1])
    return out[:b]


def _mega_xla(patches, goal, pe, pos, blocks, fn, *, heads: int,
              dim_head: int, n_valid: int, final_norm: str):
    """Unfused twin (identical math) — backward-pass reference."""
    cdt = patches.dtype
    d = goal.shape[1]
    emb = jnp.dot(patches, pe[0]) + pe[1].reshape(-1).astype(cdt)
    x = jnp.concatenate([goal[:, None, :].astype(emb.dtype), emb], axis=1)
    x = x + pos[None, :, :].astype(x.dtype)
    for w in blocks:
        x = _block_xla(x, w, heads=heads, dim_head=dim_head)
    cls = x[:, 0].astype(jnp.float32)
    out = _final_norm32(cls, fn[0].reshape(1, -1).astype(jnp.float32),
                        fn[1].reshape(1, -1).astype(jnp.float32), final_norm)
    return out.astype(cdt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def got_forward_fused(patches, goal, pe, pos, blocks, fn, heads: int,
                      dim_head: int, n_valid: int, final_norm: str,
                      interpret: bool = False):
    """Fused whole-trunk GoT forward.

    patches: (B, n_patch, patch_dim) compute-dtype (pre-patchified in XLA)
    goal:    (B, dim) embedded goal token, compute dtype
    pe:      (kernel (patch_dim, dim), bias (1, dim)) compute dtype
    pos:     (n_valid, dim) positional embedding, compute dtype
    blocks:  tuple of per-block 11-tuples (ops/fused_transformer.py order)
    fn:      final-norm params ((1, dim) scale/g, (1, dim) bias) fp32
    Returns (B, dim) latent in the compute dtype.
    """
    return _mega_fwd_impl(patches, goal, pe, pos, blocks, fn, heads=heads,
                          dim_head=dim_head, n_valid=n_valid,
                          final_norm=final_norm, interpret=interpret)


def _mega_vjp_fwd(patches, goal, pe, pos, blocks, fn, heads, dim_head,
                  n_valid, final_norm, interpret):
    y = _mega_fwd_impl(patches, goal, pe, pos, blocks, fn, heads=heads,
                       dim_head=dim_head, n_valid=n_valid,
                       final_norm=final_norm, interpret=interpret)
    return y, (patches, goal, pe, pos, blocks, fn)


def _mega_vjp_bwd(heads, dim_head, n_valid, final_norm, interpret, res, g):
    patches, goal, pe, pos, blocks, fn = res
    _, vjp = jax.vjp(
        lambda *a: _mega_xla(*a, heads=heads, dim_head=dim_head,
                             n_valid=n_valid, final_norm=final_norm),
        patches, goal, pe, pos, blocks, fn)
    return vjp(g)


got_forward_fused.defvjp(_mega_vjp_fwd, _mega_vjp_bwd)
