"""Jittable reward + polar-goal math, numerically identical to
env_lab.py:170-301 (and the yaw extraction of squaternion at :221-227).

Everything is plain jnp on scalars/batches so it runs inside jit (the
kinematic CI env and any on-device rollout use these directly); the same
functions back the host-side envs.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

PI = math.pi


def quaternion_yaw(w, x, y, z):
    """squaternion Quaternion(w,x,y,z).to_euler()[2] — yaw only
    (env_lab.py:221-227; the reference rounds to 4 decimals)."""
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.round(yaw, 4)


def heading_error(odom_x, odom_y, goal_x, goal_y, angle):
    """beta2: goal bearing minus robot yaw, wrapped to (-pi, pi]
    (env_lab.py:231-250). The reference wraps via the two-step reflection;
    algebraically beta2 +- 2pi — replicated exactly."""
    skew_x = goal_x - odom_x
    skew_y = goal_y - odom_y
    mag1 = jnp.sqrt(skew_x ** 2 + skew_y ** 2)
    dot = skew_x  # dot([skewX, skewY], [1, 0])
    beta = jnp.arccos(jnp.clip(dot / jnp.maximum(mag1, 1e-12), -1.0, 1.0))
    beta = jnp.where(skew_y < 0, -beta, beta)
    beta2 = beta - angle
    beta2 = jnp.where(beta2 > PI, beta2 - 2.0 * PI, beta2)
    beta2 = jnp.where(beta2 < -PI, beta2 + 2.0 * PI, beta2)
    return beta2


def polar_goal(odom_x, odom_y, goal_x, goal_y, angle,
               act0=0.0, act1=0.0, dist_norm: float = 15.0):
    """toGoal = [min(D/15, 1), beta2/pi, act0, act1] (env_lab.py:296-298)."""
    dist = jnp.sqrt((odom_x - goal_x) ** 2 + (odom_y - goal_y) ** 2)
    beta2 = heading_error(odom_x, odom_y, goal_x, goal_y, angle)
    return jnp.stack([
        jnp.minimum(dist / dist_norm, 1.0),
        beta2 / PI,
        jnp.asarray(act0, jnp.float32),
        jnp.asarray(act1, jnp.float32),
    ])


class RewardOut(NamedTuple):
    reward: jax.Array
    done: jax.Array
    target: jax.Array
    dist: jax.Array       # new distOld
    r_arret: jax.Array    # computed but EXCLUDED from the sum (env_lab.py:290,294)


def step_reward(dist_old, dist, collided, act0, act1,
                goal_radius: float = 0.5,
                r_target: float = 200.0,
                r_collision: float = -100.0,
                heuristic_scale: float = 20.0,
                clip: Tuple[float, float] = (-200.0, 500.0)) -> RewardOut:
    """env_lab.py:274-301:
      r_heuristic = (distOld - Dist) * 20
      r_target    = 200 at Dist < 0.5 (also done/target)
      r_arret     = 50*(2-|act1|)*(1-act0) — computed, NOT added
      r_collision = -100 when laser-min < 0.2
      reward = clip(r_collision + r_target + r_heuristic, -200, 500)
    """
    target = dist < goal_radius
    done = jnp.logical_or(target, collided)
    r_heur = (dist_old - dist) * heuristic_scale
    r_tgt = jnp.where(target, r_target, 0.0)
    r_col = jnp.where(collided, r_collision, 0.0)
    r_arret = jnp.where(target, 50.0 * (2.0 - jnp.abs(act1)) * (1.0 - act0), 0.0)
    reward = jnp.clip(r_col + r_tgt + r_heur, clip[0], clip[1])
    return RewardOut(reward=reward, done=done, target=target,
                     dist=dist, r_arret=r_arret)


def laser_collision(ranges: jax.Array, min_range: float = 0.2):
    """calculate_observation (env_lab.py:170-181): collision when any
    0 < range < min_range; also returns the min range seen (capped at 2.0)."""
    valid = ranges > 0
    col = jnp.any(jnp.logical_and(valid, ranges < min_range))
    min_laser = jnp.minimum(jnp.min(ranges), 2.0)
    return col, min_laser


def binning(lower_bound: int, data: jax.Array, quantity: int) -> jax.Array:
    """utils.py:92-98 laser min-pooling into `quantity` bins, returning
    shape (1, quantity) like the reference."""
    width = int(round(data.shape[0] / quantity))
    idx = lower_bound + jnp.arange(quantity) * width
    windows = jax.vmap(
        lambda i: jnp.min(jax.lax.dynamic_slice(data, (i,), (width,))))(idx)
    return windows[None, :]


# Obstacle boxes of utils.py:77-89 (RRC world), hoisted so vectorized
# samplers (kinematic.default_records) share the single source of truth.
# The sixth clause `-4.5 < x < -5.5` (utils.py:84) has reversed bounds and
# is always False — replicated as-is for behavioral parity.
CHECK_POS_BOXES = (
    (3.6, 5.5, -3.5, 4), (-4.5, 4, -3.5, -1.8), (-3.5, 3.3, -1.6, 2.5),
    (-5, -4, -3.5, 0.3), (-5.5, -4, 2, 4), (-4.5, -5.5, 0.2, 2.1),
    (-4.1, 0.1, 3, 4), (2.2, 3.8, 2.5, 4), (0, 2.3, 2.5, 4),
)


def check_pos(x: float, y: float) -> bool:
    """Obstacle-box rejection for sampled goals (utils.py:77-89, RRC world)."""
    for x0, x1, y0, y1 in CHECK_POS_BOXES:
        if x0 < x < x1 and y0 < y < y1:
            return False
    if x > 5 or x < -5 or y > 3.7 or y < -3:
        return False
    return True
