"""On-device rollout with a host-callback env boundary (SURVEY.md §2.2/2.3:
'thin host-callback env boundary (io_callback): the framework defines an Env
protocol; ROS2/Gazebo stays outside the device graph').

The reference crosses the host<->device boundary twice per step with full
tensors both ways (choose_action: H2D image, D2H action; DRL.py:170-185).
Here the WHOLE episode is one jitted lax.scan: the policy, action squash, and
command scaling stay on device; only the env physics runs on the host via
`jax.experimental.io_callback` (ordered — env stepping is stateful), moving
one action out and one observation in per step with no Python dispatch
overhead between steps."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback

from dgvit_tpu.envs.base import Env


class RolloutResult(NamedTuple):
    rewards: jax.Array   # (T,)
    dones: jax.Array     # (T,) 1.0 after the episode has ended
    actions: jax.Array   # (T, A) raw policy actions (pre-scaling)
    steps: jax.Array     # scalar: valid step count
    targets: jax.Array   # (T,) 1.0 on the step the goal was reached


def make_env_step_callback(env: Env, obs_shape, goal_dim: int = 4):
    """Wrap env.step for io_callback:
    action (2,) -> (obs, goal, reward, done, target)."""

    def host_step(a_in):
        s = env.step([float(a_in[0]), float(a_in[1])], 0)
        obs = s.state
        if obs.ndim == 3:
            obs = obs[..., 0]
        return (obs.astype(np.float32),
                np.asarray(s.to_goal, np.float32),
                np.float32(s.reward),
                np.float32(1.0 if s.done else 0.0),
                np.float32(1.0 if s.target else 0.0))

    result_shapes = (
        jax.ShapeDtypeStruct(obs_shape, jnp.float32),
        jax.ShapeDtypeStruct((goal_dim,), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
    )
    return host_step, result_shapes


# (agent, env, max_steps, scales, evaluate, obs/goal shape) -> compiled run.
# The jitted scan closes over the env's host_step callback, so rebuilding it
# per episode would re-trace (and re-compile) every call — episode loops
# (evaluate --device-rollout) reuse the cached program instead.
_RUN_CACHE: dict = {}


def device_rollout(agent, state, env: Env, max_steps: int,
                   l_scale: float, a_scale: float, rng: jax.Array,
                   evaluate: bool = True) -> RolloutResult:
    """Run one episode: policy on device, env via ordered io_callback."""
    r = env.reset()
    obs0 = r.state[..., 0] if r.state.ndim == 3 else r.state
    obs_shape = obs0.shape
    cache_key = (id(agent), id(env), max_steps, float(l_scale),
                 float(a_scale), bool(evaluate), obs_shape, len(r.to_goal))
    cached = _RUN_CACHE.get(cache_key)
    if cached is not None:
        return cached(state.actor_params, jnp.asarray(obs0, jnp.float32),
                      jnp.asarray(r.to_goal, jnp.float32), rng)

    host_step, result_shapes = make_env_step_callback(env, obs_shape,
                                                      goal_dim=len(r.to_goal))

    @jax.jit
    def run(actor_params, obs0, goal0, rng):
        def body(carry, t):
            obs, goal, ended = carry
            key = jax.random.fold_in(rng, t)
            a = agent._act_impl(actor_params, key, obs[None], goal[None, :2],
                                evaluate, False)[0]
            a = jnp.clip(a, -1.0, 1.0)
            a_in = jnp.stack([(a[0] + 1.0) * l_scale, a[1] * a_scale])
            # freeze commands once the episode has ended (scan is fixed-length)
            a_in = jnp.where(ended > 0, jnp.zeros_like(a_in), a_in)
            nobs, ngoal, rew, done, target = io_callback(
                host_step, result_shapes, a_in, ordered=True)
            rew = jnp.where(ended > 0, 0.0, rew)
            target = jnp.where(ended > 0, 0.0, target)
            new_ended = jnp.maximum(ended, done)
            return (nobs, ngoal, new_ended), (rew, new_ended, a, target)

        (_, _, ended), (rews, dones, acts, targets) = jax.lax.scan(
            body, (obs0, goal0, jnp.float32(0.0)), jnp.arange(max_steps))
        steps = jnp.sum(dones == 0) + jnp.minimum(jnp.sum(dones > 0), 1)
        return RolloutResult(rews, dones, acts, steps.astype(jnp.int32),
                             targets)

    _RUN_CACHE[cache_key] = run
    return run(state.actor_params, jnp.asarray(obs0, jnp.float32),
               jnp.asarray(r.to_goal, jnp.float32), rng)
