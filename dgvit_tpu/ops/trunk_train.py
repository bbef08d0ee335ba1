"""Whole-trunk TRAIN-path kernel: one recompute-everything backward launch.

The SAC update's throughput wall (BENCH.md round-2: 69 updates/s @ batch 256
vs a ~2 ms FLOP roofline) is per-launch overhead + HBM activation traffic of
the per-block custom-vjp scheme: a gradient-bearing trunk pass costs 4
forward kernel launches (3 full blocks + CLS final) plus 4 backward launches,
each backward re-loading its block input from HBM. This module collapses the
whole trunk backward — depth-1 full pre-norm blocks, the CLS-only final
block, and the final RMS/Layer norm (GoalFormer.py:146,165-170) — into ONE
Pallas kernel per frame tile:

  * forward recompute chain runs entirely in VMEM (the per-block inputs
    x_0..x_{depth-1} are (tb*72, 64) fp32 — ~150 KB each, trivially resident),
  * each block's backward reuses the shared value-level bodies
    (ops/fused_transformer.py `_block_bwd_body`, ops/cls_block.py
    `_cls_bwd_body`) and accumulates its 11 weight grads across the
    sequential grid,
  * the final-norm backward (RMS or Layer) runs on the (tb, d) CLS rows.

Numerics match the per-block path bit-for-bit: the forward recompute casts
the residual stream to the compute dtype at block boundaries (where the
per-block path round-trips HBM), and the backward casts dx to the compute
dtype between blocks (where the per-block path crosses pallas_call output
boundaries).

Used as the backward of `blocks_cls_forward_fused` (ops/got_megakernel.py).
With DGVIT_TRUNK_GRAD=1, models/got.py routes gradient-bearing trunk passes
through it — a SAC train step then runs 1 fwd + 1 bwd launch per network
instead of 4 + 4. MEASURED RESULT (BENCH.md round 3): on the current chip
this loses to the per-block scheme (6.57 vs 5.32 ms per fwd+bwd @ B=256)
because the chain recompute costs one extra forward while launch overhead
is negligible in-graph — so the default routing keeps the per-block
kernels and this stays opt-in for stacks where launches dominate.
Reference anchor: DRL.py:373-437 (the learn hot loop this targets).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgvit_tpu.ops.cls_block import _cls_bwd_body
from dgvit_tpu.ops.fused_transformer import (_block_body, _block_bwd_body,
                                             _ln_bwd, _ln_fwd_stats,
                                             _round_up)
from dgvit_tpu.ops.got_megakernel import _block_body_cls


def _trunk_chunk() -> int:
    """MLP hidden chunk for the trunk backward. 256 (not the per-block
    kernels' 512) keeps the whole-trunk kernel inside the VMEM budget: the
    bwd holds 4 blocks of weights + 4 blocks of fp32 grad accumulators
    (~8 MB) before any MLP temps."""
    return int(os.environ.get("DGVIT_TRUNK_MLP_CHUNK", "256"))


def _trunk_tb() -> int:
    """Frame-tile size for the trunk backward grid (>=8: Mosaic sublane
    minimum on the (tb, d) dy block)."""
    return max(8, int(os.environ.get("DGVIT_TRUNK_TB", "8")))


def _final_norm_bwd(dy32, cls32, fs32, fb32, final_norm: str):
    """Backward of ops/got_megakernel.py `_final_norm32` on (tb, d) fp32 CLS
    rows. Returns (dcls, dfs, dfb) with dfs/dfb summed over rows -> (1, d).

    rms:   y = x / max(||x||, 1e-12) * sqrt(d) * g   (GoalFormer.py:107-122)
    layer: torch nn.LayerNorm defaults (eps=1e-5, affine)
    """
    d = cls32.shape[-1]
    if final_norm == "rms":
        norm = jnp.sqrt(jnp.sum(cls32 * cls32, axis=-1, keepdims=True))
        n = jnp.maximum(norm, 1e-12)
        u = cls32 / n
        sd = d ** 0.5
        gdy = dy32 * fs32                                   # g ⊙ dy
        proj = jnp.sum(gdy * u, axis=-1, keepdims=True)
        dcls = (sd / n) * (gdy - u * proj)
        dfs = jnp.sum(sd * u * dy32, axis=0, keepdims=True)
        dfb = jnp.zeros_like(dfs)
        return dcls, dfs, dfb
    xhat, rstd, _ = _ln_fwd_stats(cls32, fs32, fb32)
    return _ln_bwd(dy32, xhat, rstd, fs32)


def _trunk_bwd_kernel(*refs, n_valid: int, heads: int, dim_head: int,
                      depth: int, tb: int, scale: float, final_norm: str):
    x_ref, dy_ref = refs[0], refs[1]
    blocks = [tuple(refs[2 + 11 * i: 2 + 11 * (i + 1)]) for i in range(depth)]
    fs_ref, fb_ref = refs[2 + 11 * depth: 4 + 11 * depth]
    dx_ref = refs[4 + 11 * depth]
    gblocks = [tuple(refs[5 + 11 * depth + 11 * i: 5 + 11 * depth + 11 * (i + 1)])
               for i in range(depth)]
    dfs_ref, dfb_ref = refs[-2], refs[-1]

    np_ = x_ref.shape[1]
    d = x_ref.shape[2]
    cdt = x_ref.dtype
    rows = tb * np_
    chunk = _trunk_chunk()

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for g in gblocks:
            for ref in g:
                ref[...] = jnp.zeros(ref.shape, ref.dtype)
        dfs_ref[...] = jnp.zeros(dfs_ref.shape, dfs_ref.dtype)
        dfb_ref[...] = jnp.zeros(dfb_ref.shape, dfb_ref.dtype)

    kw = dict(n_valid=n_valid, heads=heads, dim_head=dim_head, tb=tb,
              np_=np_, scale=scale, cdt=cdt)

    # ---- forward recompute chain, block inputs VMEM-resident ----------------
    xs = [x_ref[...].reshape(rows, d).astype(jnp.float32)]
    for i in range(depth - 1):
        nxt = _block_body(xs[-1], blocks[i], **kw)
        # the per-block path round-trips HBM in the compute dtype here
        xs.append(nxt.astype(cdt).astype(jnp.float32))
    cls = _block_body_cls(xs[-1], blocks[-1], **kw)
    cls = cls.astype(cdt).astype(jnp.float32)                # (tb, d)

    # ---- final-norm backward -------------------------------------------------
    dy32 = dy_ref[...].astype(jnp.float32)                   # (tb, d)
    dcls, dfs, dfb = _final_norm_bwd(
        dy32, cls, fs_ref[...].astype(jnp.float32),
        fb_ref[...].astype(jnp.float32), final_norm)
    dfs_ref[...] += dfs
    dfb_ref[...] += dfb

    # ---- CLS-only final block backward (row-sparse) --------------------------
    dcls = dcls.astype(cdt).astype(jnp.float32)
    dx = _cls_bwd_body(xs[-1], dcls, blocks[-1], gblocks[-1],
                       chunk_default=chunk, **kw)

    # ---- full blocks in reverse ----------------------------------------------
    for i in reversed(range(depth - 1)):
        # the per-block path crosses a pallas output boundary in cdt here
        dx = dx.astype(cdt).astype(jnp.float32)
        dx = _block_bwd_body(xs[i], dx, blocks[i], gblocks[i],
                             chunk_default=chunk, **kw)

    dx_ref[...] = dx.reshape(tb, np_, d).astype(dx_ref.dtype)


def trunk_bwd_impl(x, dy, blocks, fn, *, heads: int, dim_head: int,
                   final_norm: str, interpret: bool = False):
    """Launch the whole-trunk backward. x: (B, n, d) assembled token stream
    (the blocks-kernel forward input); dy: (B, d) gradient of the pooled,
    final-normed CLS latent. Returns (dx, dblocks, dfn) matching the primal
    structures of `blocks_cls_forward_fused`."""
    b, n, d = x.shape
    inner = heads * dim_head
    depth = len(blocks)
    mlp_dim = blocks[0][7].shape[1]
    np_ = _round_up(n, 8)
    tb = _trunk_tb()
    b_pad = _round_up(b, tb)
    xp = jnp.pad(x, ((0, b_pad - b), (0, np_ - n), (0, 0)))
    dyp = jnp.pad(dy, ((0, b_pad - b), (0, 0)))
    kern = functools.partial(_trunk_bwd_kernel, n_valid=n, heads=heads,
                             dim_head=dim_head, depth=depth, tb=tb,
                             scale=dim_head ** -0.5, final_norm=final_norm)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    block_specs = [full((1, d)), full((1, d)),
                   full((d, 3 * inner)), full((inner, d)), full((1, d)),
                   full((1, d)), full((1, d)),
                   full((d, mlp_dim)), full((1, mlp_dim)),
                   full((mlp_dim, d)), full((1, d))]
    grad_shapes = [(1, d), (1, d), (d, 3 * inner), (inner, d), (1, d),
                   (1, d), (1, d), (d, mlp_dim), (1, mlp_dim),
                   (mlp_dim, d), (1, d)]
    outs = pl.pallas_call(
        kern,
        grid=(b_pad // tb,),
        in_specs=([pl.BlockSpec((tb, np_, d), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tb, d), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)]
                  + block_specs * depth
                  + [full((1, d)), full((1, d))]),
        out_specs=tuple(
            [pl.BlockSpec((tb, np_, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)]
            + [full(s) for s in grad_shapes] * depth
            + [full((1, d)), full((1, d))]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((b_pad, np_, d), x.dtype)]
            + [jax.ShapeDtypeStruct(s, jnp.float32)
               for s in grad_shapes] * depth
            + [jax.ShapeDtypeStruct((1, d), jnp.float32)] * 2),
        cost_estimate=pl.CostEstimate(
            # fwd recompute + per-block internal recompute + reverse ≈ 3x the
            # trunk forward FLOPs
            flops=3 * b * np_ * depth * (2 * d * 3 * inner
                                         + 4 * heads * np_ * dim_head
                                         + 2 * inner * d + 4 * d * mlp_dim),
            bytes_accessed=3 * b * np_ * d * 4,
            transcendentals=2 * b * np_ * depth * (heads * np_ + mlp_dim),
        ),
        interpret=interpret,
    )(xp, dyp, *[w for blk in blocks for w in blk], fn[0], fn[1])

    dx = outs[0][:b, :n, :]
    flat_grads = outs[1:1 + 11 * depth]
    dblocks = tuple(
        tuple(g.astype(w.dtype) for g, w in zip(
            flat_grads[11 * i: 11 * (i + 1)], blocks[i]))
        for i in range(depth))
    dfn = (outs[-2].astype(fn[0].dtype).reshape(fn[0].shape),
           outs[-1].astype(fn[1].dtype).reshape(fn[1].shape))
    return dx, dblocks, dfn
