"""Pure-JAX vectorized kinematic navigation env — batched rollouts with ZERO
host boundary.

The reference steps ONE Gazebo env per wall-clock tick and crosses the
host<->device boundary twice per step (choose_action H2D/D2H, DRL.py:170-185;
env stepping over DDS, env_lab.py:190-212). Our io_callback rollout
(train/device_rollout.py) already removes the Python dispatch overhead but
still runs env physics on the host, one lane at a time. This module removes
the boundary entirely: the SAME world model as envs/kinematic.py
(KinematicNavEnv — ray/AABB sensors over the obstacle boxes, unicycle
dynamics at the 0.1 s cadence of env_lab.py:204, reward/polar math from
envs/reward.py) re-expressed as pure jnp functions over a batched
`VecState`, so B parallel envs step inside one `lax.scan` together with the
policy. Sample collection then runs at device speed instead of host-loop
speed — a TPU-native capability the reference cannot express (it is pinned
to one real-time Gazebo instance).

Semantics notes (deliberate, tested):
  * Physics/reward/polar math matches KinematicNavEnv step-for-step (pinned
    by tests/test_jax_kinematic.py trajectory-equality to ~1e-4 in fp32;
    the host env computes in float64).
  * Auto-reset: when a lane finishes (done OR the `max_steps` truncation
    cap), it immediately restarts from the next start/goal record, striding
    by B so the B lanes cycle the record table round-robin without
    duplicates — at B=1 this reduces exactly to KinematicNavEnv's
    `indice_position` behavior (kinematic.py:226-227).
  * `step` returns BOTH the pre-reset terminal observation (what belongs in
    a replay transition's next_obs) and the post-reset carry observation
    (what the policy sees next step), mirroring standard vec-env contracts.
  * The stored `done` flag is the env-true done (target/collision), NOT the
    truncation cap — matching the reference, whose timeout exits the episode
    loop without writing done=True (main.py:369-394).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dgvit_tpu.envs import reward as R
from dgvit_tpu.envs.kinematic import KinematicNavEnv, default_records
from dgvit_tpu.envs.worlds import WorldPreset, get_world


class JaxWorld(NamedTuple):
    """World geometry as device arrays (from an envs/worlds.py preset)."""
    boxes: jax.Array   # (nb, 4) x0 x1 y0 y1
    arena: jax.Array   # (4,)    x0 x1 y0 y1


class EnvConsts(NamedTuple):
    """Static env configuration. Everything that shapes the computation
    (image size, ray counts, max_steps) stays a Python int so it is a
    trace-time constant; world/record tables are device arrays."""
    world: JaxWorld
    records: jax.Array        # (n_rec, 5) xR yR xG yG theta0
    image_h: int
    image_w: int
    laser_rays: int
    laser_fov: float
    laser_max: float
    cam_fov: float
    cam_near: float
    cam_far: float
    min_range: float
    dt: float
    max_steps: int
    # world-ensemble lane assignment (trace-time constant): "reset" = the
    # standard DR formulation, a lane's world rehashes from its episode
    # record index at every auto-reset (_world_of); "lane" = lane i pinned
    # to world i % K for the whole run — the measured-BETTER training
    # recipe at the 800-episode budget (BENCH.md round 4 stage D: per-reset
    # switching collapsed SAC's temperature auto-tune), kept selectable.
    world_assign: str = "reset"


class VecState(NamedTuple):
    """Per-lane dynamic state, all shaped (B,)."""
    x: jax.Array
    y: jax.Array
    theta: jax.Array
    goal_x: jax.Array
    goal_y: jax.Array
    dist_old: jax.Array
    rec_idx: jax.Array    # int32: record used for the CURRENT episode
    steps: jax.Array      # int32: steps taken in the current episode


class VecStepOut(NamedTuple):
    state: VecState       # post-reset carry state
    obs: jax.Array        # (B, h, w) post-reset carry observation
    to_goal: jax.Array    # (B, 4) post-reset carry polar goal
    next_obs: jax.Array   # (B, h, w) PRE-reset observation (replay next_obs)
    next_to_goal: jax.Array  # (B, 4) pre-reset polar goal
    reward: jax.Array     # (B,)
    done: jax.Array       # (B,) bool, env-true done (target or collision)
    target: jax.Array     # (B,) bool
    collided: jax.Array   # (B,) bool
    truncated: jax.Array  # (B,) bool, max_steps cap hit (lane was reset too)


def _records_table(recs) -> np.ndarray:
    table = np.zeros((len(recs), 5), np.float32)
    for i, rec in enumerate(recs):
        table[i, 0] = rec["xR"]
        table[i, 1] = rec["yR"]
        table[i, 2] = rec["xG"]
        table[i, 3] = rec["yG"]
        table[i, 4] = float(np.asarray(R.quaternion_yaw(
            rec.get("quaterW", 1.0), 0.0, 0.0, rec.get("quaterZ", 0.0))))
    return table


def make_consts(world=None, records: Optional[Sequence[dict]] = None,
                image_hw=(128, 160), max_steps: int = 800, seed: int = 0,
                min_range: float = 0.2, n_records: int = 32,
                world_assign: str = "reset") -> EnvConsts:
    """Build EnvConsts mirroring KinematicNavEnv's constructor defaults
    (kinematic.py:176-198) so the two envs are interchangeable.

    World ENSEMBLES (domain randomization — BENCH.md round 4: transfer is
    world-diversity bound): pass a `rand<K>` / `randh<K>` / `randm<K>`
    spec (K procedurally-random layouts — RRC-sized, hospital-sized, or
    mixed-scale; worlds.random_ensemble, seeded from `seed`) or an
    explicit list/tuple of WorldPresets. Boxes become (K, nb, 4) and
    per-world record tables (K, n_rec, 5); box counts pad with far-away
    degenerate boxes (beyond max range, so they never hit); arenas may
    differ per member (the table becomes (K, 4) and lane walls follow the
    lane's world).

    Lane->world assignment RESAMPLES EVERY RESET: a lane's world is a
    multiplicative hash of its episode record index (`_world_of`), so the
    whole ensemble is visited even when K exceeds the lane count — the
    round-4 dr_rand32 arm measured bit-identical to dr_rand16 because the
    previous STATIC `lane % K` map could never expose worlds beyond
    n_envs (BENCH.md round 4 stage C). The hash is deterministic in
    rec_idx, so replays are exact and sharded collection (which strides
    rec_idx globally, shardmap_collect) sees the same world stream as an
    unsharded run."""
    if isinstance(world, str) and world.startswith("rand"):
        from dgvit_tpu.envs.worlds import random_ensemble
        world = random_ensemble(world, seed=seed)
    if isinstance(world, (list, tuple)):
        assert records is None, "per-world records are generated; " \
                                "explicit records need a single world"
        # arenas may differ per member (randm<K> mixed-scale ensembles):
        # a (K, 4) arena table makes lane walls follow the lane's world
        arenas = [tuple(map(float, w.arena)) for w in world]
        arena_arr = (jnp.asarray(arenas[0], jnp.float32)
                     if len(set(arenas)) == 1
                     else jnp.asarray(arenas, jnp.float32))   # (4,) | (K, 4)
        nb = max(len(w.boxes) for w in world)
        far = (1e4, 1e4, 1e4, 1e4)  # beyond every max range: never hits
        boxes = np.asarray(
            [list(w.boxes) + [far] * (nb - len(w.boxes)) for w in world],
            np.float32)                                     # (K, nb, 4)
        tables = np.stack([
            _records_table(default_records(n=n_records, seed=seed + i,
                                           world=w))
            for i, w in enumerate(world)])                  # (K, n_rec, 5)
        e = KinematicNavEnv
        return EnvConsts(
            world=JaxWorld(boxes=jnp.asarray(boxes), arena=arena_arr),
            records=jnp.asarray(tables),
            image_h=int(image_hw[0]), image_w=int(image_hw[1]),
            laser_rays=e.LASER_RAYS, laser_fov=e.LASER_FOV,
            laser_max=e.LASER_MAX, cam_fov=e.CAM_FOV, cam_near=e.CAM_CLIP[0],
            cam_far=e.CAM_CLIP[1], min_range=float(min_range), dt=e.DT,
            max_steps=int(max_steps), world_assign=world_assign)
    if isinstance(world, str) or world is None:
        world = get_world(world or "rrc")
    assert isinstance(world, WorldPreset)
    recs = records or default_records(
        n=n_records, seed=seed,
        world=None if world.name == "rrc" else world)
    table = _records_table(recs)
    e = KinematicNavEnv  # shared sensor constants
    return EnvConsts(
        world=JaxWorld(boxes=jnp.asarray(world.boxes, jnp.float32),
                       arena=jnp.asarray(world.arena, jnp.float32)),
        records=jnp.asarray(table),
        image_h=int(image_hw[0]), image_w=int(image_hw[1]),
        laser_rays=e.LASER_RAYS, laser_fov=e.LASER_FOV, laser_max=e.LASER_MAX,
        cam_fov=e.CAM_FOV, cam_near=e.CAM_CLIP[0], cam_far=e.CAM_CLIP[1],
        min_range=float(min_range), dt=e.DT, max_steps=int(max_steps))


def _world_of(c: EnvConsts, rec_idx: jax.Array) -> Optional[jax.Array]:
    """Per-lane world index for the episode identified by rec_idx, or None
    for single-world consts.

    world_assign="reset" (default): Knuth multiplicative hash (odd
    constant, a bijection mod 2^32) so the world RESAMPLES at every
    auto-reset (rec_idx strides by the lane count) for ANY (n_envs, K)
    pair — `rec_idx % K` alone is constant per lane whenever K divides
    n_envs, and a static `lane % K` map never exposes worlds beyond
    n_envs at all. Deterministic in rec_idx: replays are exact, sharded
    and unsharded lane streams agree.

    world_assign="lane": lane i pinned to world i % K for the whole run —
    each lane masters one world, the fleet covers the ensemble. The
    measured-better TRAINING recipe at the 800-episode budget (BENCH.md
    round 4 stage D: per-reset task switching collapsed the temperature
    auto-tune). Caveats it trades away: K > n_envs leaves worlds unvisited
    (the dr_rand32 regression), and under a sharded collect lane indices
    are LOCAL, so each device covers the ensemble independently."""
    k = c.world.boxes.shape[0] if c.world.boxes.ndim == 3 else 0
    if not k:
        return None
    if c.world_assign == "lane":
        return jnp.arange(rec_idx.shape[0], dtype=jnp.int32) % k
    assert c.world_assign == "reset", c.world_assign
    h = rec_idx.astype(jnp.uint32) * jnp.uint32(2654435761)
    h = h ^ (h >> jnp.uint32(16))   # fold high bits down: a bare odd-mult
    #                                 preserves low-bit parity, so power-of-2
    #                                 K with an even lane stride degenerates
    return (h % jnp.uint32(k)).astype(jnp.int32)


def ray_distances(px: jax.Array, py: jax.Array, bearings: jax.Array,
                  world: JaxWorld, max_range: float,
                  world_idx: Optional[jax.Array] = None) -> jax.Array:
    """Batched slab-method ray/AABB: px, py (B,), bearings (B, R) ->
    min distance (B, R) to any box or arena wall. Same math as
    kinematic._ray_distances, broadcast over lanes (B, R, nb).

    World ensembles: with a (K, nb, 4) box table, lane i raycasts against
    world `world_idx[i]` (the per-episode assignment, _world_of); a None
    world_idx falls back to the static `i % K` map (direct rendering
    calls that have no episode context)."""
    n_lanes = px.shape[0]
    dx = jnp.cos(bearings)[..., None]          # (B, R, 1)
    dy = jnp.sin(bearings)[..., None]
    eps = 1e-12
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < eps, eps, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < eps, eps, dy)
    px = px[:, None, None]
    py = py[:, None, None]
    bx = world.boxes                            # (nb, 4) or (K, nb, 4)
    if bx.ndim == 3:
        lane_world = (world_idx if world_idx is not None else
                      jnp.arange(n_lanes, dtype=jnp.int32) % bx.shape[0])
        bx = bx[lane_world]                     # (B, nb, 4)
        x0, x1 = bx[:, None, :, 0], bx[:, None, :, 1]
        y0, y1 = bx[:, None, :, 2], bx[:, None, :, 3]
    else:
        x0, x1 = bx[None, None, :, 0], bx[None, None, :, 1]
        y0, y1 = bx[None, None, :, 2], bx[None, None, :, 3]

    tx1 = (x0 - px) * inv_dx
    tx2 = (x1 - px) * inv_dx
    ty1 = (y0 - py) * inv_dy
    ty2 = (y1 - py) * inv_dy
    tmin = jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2))
    tmax = jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2))
    miss_x = (jnp.abs(dx) < eps) & ((px < x0) | (px > x1))
    miss_y = (jnp.abs(dy) < eps) & ((py < y0) | (py > y1))
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & ~miss_x & ~miss_y
    inf = jnp.float32(jnp.inf)
    d_boxes = jnp.where(hit, jnp.where(tmin >= 0, tmin, inf), inf)
    best = jnp.minimum(jnp.min(d_boxes, axis=-1), max_range)

    ar = world.arena
    if ar.ndim == 2:
        # mixed-scale ensemble (randm<K>): lane walls follow the lane's
        # world, same gather as the box table above
        assert world.boxes.ndim == 3, "per-world arenas need ensemble boxes"
        ar = ar[lane_world]                     # (B, 4)
        bounds = [ar[:, j][:, None, None] for j in range(4)]
    else:
        bounds = [ar[j] for j in range(4)]
    ax0, ax1, ay0, ay1 = bounds
    for bound, p, inv in ((ax0, px, inv_dx), (ax1, px, inv_dx),
                          (ay0, py, inv_dy), (ay1, py, inv_dy)):
        t = ((bound - p) * inv)[..., 0]
        best = jnp.where((t >= 0) & (t < best), t, best)
    return best


def _depth_image(c: EnvConsts, x, y, theta, world_idx=None) -> jax.Array:
    """(B,) pose -> (B, h, w) column-depth image — kinematic.py:207-218."""
    half = c.cam_fov / 2
    cols = jnp.linspace(half, -half, c.image_w)
    bearings = theta[:, None] + cols[None, :]
    d = ray_distances(x, y, bearings, c.world, c.cam_far, world_idx)
    d = jnp.clip(d, c.cam_near, c.cam_far)
    ramp = jnp.linspace(1.0, 0.85, c.image_h)[:, None]
    return (d[:, None, :] / c.cam_far) * ramp[None]


def _laser(c: EnvConsts, x, y, theta, world_idx=None) -> jax.Array:
    half = c.laser_fov / 2
    rays = jnp.linspace(-half, half, c.laser_rays)
    return ray_distances(x, y, theta[:, None] + rays[None, :],
                         c.world, c.laser_max, world_idx)


def _reset_fields(c: EnvConsts, rec_idx: jax.Array):
    """Episode-start fields for (B,) record indices (kinematic.py:225-233).
    With a (K, n_rec, 5) ensemble table, each lane draws from the record
    bank of the world its episode is assigned to (_world_of(rec_idx) —
    records are only valid in their own world)."""
    if c.records.ndim == 3:
        rec = c.records[_world_of(c, rec_idx),
                        rec_idx % c.records.shape[1]]      # (B, 5)
    else:
        rec = c.records[rec_idx % c.records.shape[0]]      # (B, 5)
    x, y, gx, gy, theta = (rec[:, 0], rec[:, 1], rec[:, 2], rec[:, 3],
                           rec[:, 4])
    dist = jnp.sqrt((x - gx) ** 2 + (y - gy) ** 2)
    return x, y, theta, gx, gy, dist


def vec_reset(c: EnvConsts, batch: int):
    """Fresh B-lane state: lane i starts on record i; subsequent episodes
    stride by B (see module docstring). Returns (state, obs, to_goal)."""
    rec_idx = jnp.arange(batch, dtype=jnp.int32)
    x, y, theta, gx, gy, dist = _reset_fields(c, rec_idx)
    state = VecState(x=x, y=y, theta=theta, goal_x=gx, goal_y=gy,
                     dist_old=dist, rec_idx=rec_idx,
                     steps=jnp.zeros(batch, jnp.int32))
    obs = _depth_image(c, x, y, theta, _world_of(c, rec_idx))
    to_goal = jax.vmap(
        lambda a, b, g1, g2, th: R.polar_goal(a, b, g1, g2, th))(
        x, y, gx, gy, theta).astype(jnp.float32)
    return state, obs, to_goal


def vec_step(c: EnvConsts, s: VecState, action: jax.Array,
             stride: Optional[int] = None) -> VecStepOut:
    """One batched env step with auto-reset. `action` is (B, 2) in COMMAND
    units (post-scaling [v, w]), like Env.step (kinematic.py:237-258).
    `stride`: record-table advance on reset — defaults to the local lane
    count; pass the GLOBAL lane count when lanes are sharded over a mesh
    axis (parallel.shard.shardmap_collect) so sharded and unsharded lane
    streams visit identical record sequences."""
    b = int(stride) if stride is not None else action.shape[0]
    v, w = action[:, 0], action[:, 1]
    cur_world = _world_of(c, s.rec_idx)   # episode's world, fixed at reset
    theta = jnp.arctan2(jnp.sin(s.theta + w * c.dt),
                        jnp.cos(s.theta + w * c.dt))
    x = s.x + v * jnp.cos(theta) * c.dt
    y = s.y + v * jnp.sin(theta) * c.dt

    ranges = _laser(c, x, y, theta, cur_world)
    valid = ranges > 0
    collided = jnp.any(valid & (ranges < c.min_range), axis=-1)
    dist = jnp.sqrt((x - s.goal_x) ** 2 + (y - s.goal_y) ** 2)
    out = R.step_reward(s.dist_old, dist, collided, v, w)

    next_obs = _depth_image(c, x, y, theta, cur_world)
    next_to_goal = jax.vmap(R.polar_goal)(
        x, y, s.goal_x, s.goal_y, theta, v, w).astype(jnp.float32)

    steps = s.steps + 1
    truncated = (steps >= c.max_steps) & ~out.done
    restart = out.done | truncated

    # auto-reset: finished lanes jump to their next record (stride B)
    new_idx = jnp.where(restart, s.rec_idx + b, s.rec_idx).astype(jnp.int32)
    rx, ry, rtheta, rgx, rgy, rdist = _reset_fields(c, new_idx)
    sel = lambda live, fresh: jnp.where(restart, fresh, live)
    ns = VecState(
        x=sel(x, rx), y=sel(y, ry), theta=sel(theta, rtheta),
        goal_x=sel(s.goal_x, rgx), goal_y=sel(s.goal_y, rgy),
        dist_old=sel(out.dist, rdist),
        rec_idx=new_idx,
        steps=jnp.where(restart, 0, steps).astype(jnp.int32))

    reset_obs = _depth_image(c, rx, ry, rtheta, _world_of(c, new_idx))
    reset_goal = jax.vmap(
        lambda a, bb, g1, g2, th: R.polar_goal(a, bb, g1, g2, th))(
        rx, ry, rgx, rgy, rtheta).astype(jnp.float32)
    obs = jnp.where(restart[:, None, None], reset_obs, next_obs)
    to_goal = jnp.where(restart[:, None], reset_goal, next_to_goal)

    return VecStepOut(state=ns, obs=obs, to_goal=to_goal,
                      next_obs=next_obs, next_to_goal=next_to_goal,
                      reward=out.reward, done=out.done, target=out.target,
                      collided=collided, truncated=truncated)
