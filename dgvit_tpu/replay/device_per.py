"""On-device proportional PER state for the fused training loop.

Mirrors the C++ buffer's semantics (replay/csrc/replay.cpp:117-170 — itself
the cpprb contract): priorities stored as p^alpha with alpha=0.6, new rows
written at max_priority^alpha, UNIFORM proportional draws (not stratified),
importance weights (p/total*stored)^-beta normalized by the min-priority
row's weight, update_priorities(|td|+eps) raising the running max.

No sum-tree: on TPU a (cap,) cumsum + vectorized searchsorted IS the
O(log n) structure — one fused pass over at most a few thousand lanes is
cheaper than pointer-chasing, and it lives inside the already-jitted round
body (train/fused_train.py)."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

ALPHA = 0.6          # priority exponent (replay.cpp:87, cpprb default)


class DevicePER(NamedTuple):
    prios: jax.Array   # (cap,) f32: p^alpha; 0.0 marks an empty slot
    max_p: jax.Array   # scalar f32: running RAW max priority (starts 1.0)


def per_init(capacity: int) -> DevicePER:
    return DevicePER(prios=jnp.zeros((capacity,), jnp.float32),
                     max_p=jnp.float32(1.0))


def per_on_write(per: DevicePER, idx: jax.Array) -> DevicePER:
    """New transitions get max priority (replay.cpp:127-130)."""
    return per._replace(prios=per.prios.at[idx].set(per.max_p ** ALPHA))


def per_sample(per: DevicePER, key: jax.Array, batch: int,
               stored: jax.Array, beta: float = 0.4
               ) -> Tuple[jax.Array, jax.Array]:
    """(indexes, is_weights): proportional draws + cpprb IS weights.
    `stored` is the valid-prefix size (ring cursor clamped to cap)."""
    c = jnp.cumsum(per.prios)
    total = c[-1]
    u = jax.random.uniform(key, (batch,)) * total
    idx = jnp.clip(jnp.searchsorted(c, u, side="right"),
                   0, per.prios.shape[0] - 1)
    p = per.prios[idx] / jnp.maximum(total, 1e-30)
    min_p = jnp.min(jnp.where(per.prios > 0, per.prios, jnp.inf))
    max_w = (min_p / jnp.maximum(total, 1e-30)
             * stored.astype(jnp.float32)) ** -beta
    w = (p * stored.astype(jnp.float32)) ** -beta / jnp.maximum(max_w, 1e-30)
    return idx, w.astype(jnp.float32)


def per_update(per: DevicePER, idx: jax.Array,
               raw_prio: jax.Array) -> DevicePER:
    """update_priorities(|td|+eps) semantics (replay.cpp:162-170)."""
    return DevicePER(
        prios=per.prios.at[idx].set(raw_prio.astype(jnp.float32) ** ALPHA),
        max_p=jnp.maximum(per.max_p, jnp.max(raw_prio)).astype(jnp.float32))
