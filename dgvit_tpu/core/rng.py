"""RNG discipline: one root key, folded per purpose and per step.

The reference scatters seeding across torch/numpy/cudnn (main.py:209-216,
DRL.py:71-78, got_sac_network.py:22-27). Here a single `RngStream` owns the
root `jax.random.key`; every consumer derives keys functionally so runs are
reproducible and checkpointable (the step counter is part of the train state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class RngStream:
    """Host-side convenience wrapper around key splitting."""

    def __init__(self, seed: int):
        self.seed = int(seed)
        self._key = jax.random.PRNGKey(self.seed)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def fold(self, name: str) -> jax.Array:
        return jax.random.fold_in(self._key, _stable_hash(name))


def _stable_hash(name: str) -> int:
    h = 2166136261
    for ch in name.encode():
        h = (h ^ ch) * 16777619 & 0xFFFFFFFF
    return h


def step_key(base: jax.Array, step: jax.Array | int) -> jax.Array:
    """Derive the per-step key inside a jitted train step."""
    return jax.random.fold_in(base, jnp.asarray(step, jnp.uint32))
