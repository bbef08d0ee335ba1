"""Tanh-squashed Gaussian policy distribution with reference-exact log-prob.

Mirrors got_sac_network.py:238-251 (and the identical blocks in
vit_sac_network.py / Imitation_learning.py):

    x_t ~ N(mean, std);  y_t = tanh(x_t)
    action   = y_t * scale + bias
    log_prob = Normal(mean, std).log_prob(x_t)
               - log(scale * (1 - y_t^2) + 1e-6), summed over action dims
    mean_act = tanh(mean) * scale + bias

LOG_SIG clamp [-20, 2] (got_sac_network.py:18-19,235) is applied by callers
on log_std before this module.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

LOG_SIG_MAX = 2.0
LOG_SIG_MIN = -20.0
EPSILON = 1e-6
_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


class TanhGaussianSample(NamedTuple):
    action: jax.Array     # (B, A) squashed, scaled sample
    log_prob: jax.Array   # (B, 1)
    mean: jax.Array       # (B, A) deterministic (tanh of mean), scaled


def clamp_log_std(log_std: jax.Array) -> jax.Array:
    return jnp.clip(log_std, LOG_SIG_MIN, LOG_SIG_MAX)


def normal_log_prob(x: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    """torch.distributions.Normal.log_prob: -((x-mean)^2)/(2 var) - log(std) - log(sqrt(2pi))."""
    var = std * std
    return -jnp.square(x - mean) / (2.0 * var) - jnp.log(std) - _LOG_SQRT_2PI


def sample(
    key: jax.Array,
    mean: jax.Array,
    log_std: jax.Array,
    action_scale: float = 1.0,
    action_bias: float = 0.0,
    noise: jax.Array | None = None,
) -> TanhGaussianSample:
    """Reparameterized sample (rsample) + log-prob + deterministic mean action.

    `noise` overrides the standard-normal draw — used by the data-sharded
    (shard_map) train step, which draws row-indexed noise so each shard
    reproduces exactly its slice of the single-device stream."""
    std = jnp.exp(log_std)
    if noise is None:
        noise = jax.random.normal(key, mean.shape, mean.dtype)
    else:
        noise = noise.astype(mean.dtype)
    x_t = mean + std * noise
    y_t = jnp.tanh(x_t)
    action = y_t * action_scale + action_bias
    log_prob = normal_log_prob(x_t, mean, std)
    log_prob = log_prob - jnp.log(action_scale * (1.0 - jnp.square(y_t)) + EPSILON)
    log_prob = jnp.sum(log_prob, axis=1, keepdims=True)
    mean_action = jnp.tanh(mean) * action_scale + action_bias
    return TanhGaussianSample(action, log_prob, mean_action)


def deterministic_sample(
    key: jax.Array,
    mean: jax.Array,
    noise_std: float = 0.1,
    noise_clip: float = 0.25,
    noise: jax.Array | None = None,
) -> TanhGaussianSample:
    """Deterministic policy exploration: mean + clamp(N(0, 0.1), +-0.25)
    (got_sac_network.py:376-381,438-443). log_prob is 0 as in the reference.
    `noise` (raw standard-normal) overrides the draw — see sample()."""
    if noise is None:
        noise = jax.random.normal(key, mean.shape, mean.dtype)
    noise = jnp.clip(noise.astype(mean.dtype) * noise_std,
                     -noise_clip, noise_clip)
    return TanhGaussianSample(mean + noise, jnp.zeros(mean.shape[:1] + (1,), mean.dtype), mean)
