"""Vectorized on-device rollout collection + the `train_vec` driver.

The reference collects exactly ONE transition per host round-trip
(main.py:369-394: choose_action H2D/D2H, env.step over DDS, store, learn).
`VecCollector` instead runs B pure-JAX kinematic envs (envs/jax_kinematic.py)
and the policy inside ONE jitted `lax.scan` of T steps — sample collection
becomes a single device dispatch producing B*T transitions, with no host
boundary at all. The SAC updates stay on the proven fused path
(agents/sac.py) fed from the C++ replay buffer, so `train_vec` composes the
framework's two halves: device-speed collection + device-speed updates.

Reference quirks preserved per lane (so learning dynamics stay comparable):
  * actions stored in POLICY units, env stepped in command units
    (a_in = [(a0+1)*L_SCALE, a1*A_SCALE], main.py:320,370);
  * the FIRST step of every episode is not stored (main.py:310-334 first-step
    special case) — lanes emit a store mask instead of a host-side `continue`;
  * a first-step done is a "Bad Initialization": the lane auto-resets and the
    transition is masked out (main.py:329-334).

This is a beyond-reference capability (the reference is pinned to one
real-time Gazebo instance); the from-scratch RL protocol itself remains
train_rl. Use train_vec when sample throughput is the bottleneck —
e.g. kinematic-world pretraining before a live fine-tune.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dgvit_tpu.agents.sac import SACAgent
from dgvit_tpu.config import Config
from dgvit_tpu.core import checkpoint as ckpt
from dgvit_tpu.core.rng import RngStream
from dgvit_tpu.envs.jax_kinematic import (EnvConsts, make_consts, vec_reset,
                                          vec_step)
from dgvit_tpu.replay.buffer import (PrioritizedReplayBuffer, ReplayBuffer,
                                     reference_schema)
from dgvit_tpu.utils.metrics import MetricsLogger


def stack_init(obs: jax.Array, depth: int) -> jax.Array:
    """(B, H, W) episode-start frame -> (B, C, H, W) stack, first frame
    replicated (train_rl.FrameStacker.reset semantics)."""
    return jnp.repeat(obs[:, None], depth, axis=1)


def stack_push(stack: jax.Array, frame: jax.Array) -> jax.Array:
    """Shift-left + append (FrameStacker.push)."""
    return jnp.concatenate([stack[:, 1:], frame[:, None]], axis=1)


def make_collect_fn(agent: SACAgent, consts: EnvConsts, chunk: int,
                    l_scale: float, a_scale: float, max_action: float = 1.0,
                    evaluate: bool = False, stride: Optional[int] = None,
                    frame_stack: int = 0,
                    fault_knobs: Optional[Dict[str, float]] = None,
                    aug_prob: float = 1.0):
    """Pure (actor_params, carry, rng) -> (carry', traj) rollout scan —
    jitted directly by VecCollector, or wrapped in shard_map with lanes over
    the `data` axis (parallel.shard.shardmap_collect). With a
    `grad_axis='data'` agent, the per-row globally-indexed action noise
    (sac._row_noise_draw) makes the sharded collection reproduce the
    unsharded lane stream exactly.

    `frame_stack` > 0 carries a (B, C, H, W) frame stack for channels-mode
    actors (the Imitation_learning.py:118-121 patch embed): transitions
    store STACKED obs/next_obs like the host loop (train_rl.FrameStacker);
    a lane reset re-fills its stack with the fresh episode's first frame.

    `fault_knobs`: sensor-fault AUGMENTATION (envs/fault_aug.py — the
    reference's five-fault family as in-graph transforms). The policy acts
    on perturbed frames and the perturbed frames are what gets STORED —
    a faulty sensor perturbs the observation channel itself, so the critic
    must learn from it too. `next_obs` draws an independent realization:
    for single-frame obs the fault process is IID per frame so the
    distribution is exact (it won't bit-match the next step's actor view);
    for frame STACKS the stored obs/next_obs re-perturb their shared
    history frames independently — a documented approximation (a physical
    occluder would persist across the overlap), acceptable for IID-noise
    training, revisit if stack-consistent faults ever matter. The env
    dynamics (laser collision, reward) always see the true world — these
    are SENSOR faults, not world faults. `aug_prob` < 1 gates the whole
    knob set per lane per step (Bernoulli), mixing clean frames in.
    Under shard_map the aug key folds in the device's axis index (like
    sac._shard_key), so each device draws its own fault realizations.
    None/empty knobs compile to the exact unaugmented program."""
    if fault_knobs:
        from dgvit_tpu.envs.fault_aug import knobs_array, perturb_obs
        knobs = knobs_array(fault_knobs)

        def _aug(o, key):
            if agent.grad_axis is not None:
                # decorrelate across shards: the rng arriving here is
                # replicated over the mesh (round_body splits it
                # identically on every device)
                key = jax.random.fold_in(
                    key, jax.lax.axis_index(agent.grad_axis) + 1)
            k_gate, k_pert = jax.random.split(key)
            pert = perturb_obs(o, k_pert, knobs)
            if aug_prob >= 1.0:
                return pert
            gate = jax.random.uniform(k_gate, (o.shape[0],)) < aug_prob
            return jnp.where(gate.reshape((-1,) + (1,) * (o.ndim - 1)),
                             pert, o)
    else:
        _aug = None

    def _collect(actor_params, carry, rng):
        def body(c, t):
            state, obs, goal = c
            key = jax.random.fold_in(rng, t)
            if _aug is not None:
                # derive both fault keys from the PRE-act key with distinct
                # folds: re-splitting the key after _act_impl consumed it
                # would collide with the actor's internal dropout split
                k_a = jax.random.fold_in(key, 101)
                k_n = jax.random.fold_in(key, 102)
                obs_in = _aug(obs, k_a)  # actor input AND the stored obs;
                #                          the carry stays CLEAN (faults
                #                          are IID per step, not sticky)
            else:
                obs_in = obs
            a = agent._act_impl(actor_params, key, obs_in, goal[:, :2],
                                evaluate, False)
            a = jnp.clip(a, -max_action, max_action)
            a_in = jnp.stack([(a[:, 0] + 1.0) * l_scale,
                              a[:, 1] * a_scale], axis=1)
            first = state.steps == 0
            out = vec_step(consts, state, a_in, stride=stride)
            if frame_stack:
                next_obs = stack_push(obs, out.next_obs)
                restart = (out.done | out.truncated)[:, None, None, None]
                carry_obs = jnp.where(restart, stack_init(out.obs,
                                                          frame_stack),
                                      next_obs)
            else:
                next_obs, carry_obs = out.next_obs, out.obs
            if _aug is not None:
                next_obs = _aug(next_obs, k_n)  # independent draw (IID)
            trans = {
                "obs": obs_in, "act": a, "pobs": goal[:, :2],
                "next_pobs": out.next_to_goal[:, :2],
                "rew": out.reward, "next_obs": next_obs,
                "done": out.done.astype(jnp.float32),
                # reference episodes end at done OR the max_steps cap
                # (main.py:369-394 loop bound); `done` alone undercounts
                "episode_end": (out.done | out.truncated).astype(jnp.float32),
                "store": ~first,
                "target": out.target & ~first,
                "collided": out.collided & ~first,
            }
            return (out.state, carry_obs, out.to_goal), trans

        return jax.lax.scan(body, carry, jnp.arange(chunk))

    return _collect


class VecCollector:
    """B-lane, T-step jitted rollout collector.

    `collect(actor_params, carry, rng)` -> (carry', traj) where traj holds
    (T, B, ...) arrays: the replay fields of reference_schema plus `store`
    (the first-step mask), `target`, and `collided` for stats. The carry
    (VecState, obs, to_goal) persists episodes across chunk boundaries."""

    def __init__(self, agent: SACAgent, consts: EnvConsts, batch: int,
                 chunk: int, l_scale: float, a_scale: float,
                 max_action: float = 1.0, evaluate: bool = False,
                 frame_stack: int = 0):
        self.consts = consts
        self.batch = int(batch)
        self.chunk = int(chunk)
        self.frame_stack = int(frame_stack)
        self._collect = jax.jit(make_collect_fn(
            agent, consts, self.chunk, l_scale, a_scale,
            max_action=max_action, evaluate=evaluate,
            frame_stack=self.frame_stack))

    def init(self) -> Tuple:
        state, obs, goal = vec_reset(self.consts, self.batch)
        if self.frame_stack:
            obs = stack_init(obs, self.frame_stack)
        return state, obs, goal

    def collect(self, actor_params, carry, rng):
        return self._collect(actor_params, carry, rng)


def _flatten_traj(traj: Dict[str, jax.Array]) -> Dict[str, np.ndarray]:
    """(T, B, ...) device traj -> host dict of (N_kept, ...) replay fields +
    chunk stats, applying the first-step store mask."""
    host = {k: np.asarray(v) for k, v in traj.items()}
    keep = host.pop("store").reshape(-1)
    stats = {
        "goals": int(host.pop("target").sum()),
        "collisions": int(host.pop("collided").sum()),
    }
    flat = {}
    for k, v in host.items():
        flat[k] = v.reshape((-1,) + v.shape[2:])[keep]
    stats["stored"] = int(keep.sum())
    stats["reward_sum"] = float(flat["rew"].sum()) if stats["stored"] else 0.0
    stats["episodes_done"] = int(flat["done"].sum()) if stats["stored"] else 0
    return flat, stats


def train_vec(cfg: Config, out_dir: str = "results", n_envs: int = 16,
              chunk: int = 64, total_env_steps: int = 100_000,
              updates_per_chunk: Optional[int] = None,
              world: Optional[str] = None, resume: bool = False,
              save_interval_chunks: int = 50) -> dict:
    """Vectorized kinematic-world SAC training: device-batched collection
    (VecCollector) feeding the fused update path, 1 update per stored env
    step by default (the reference's learn-per-step cadence,
    main.py:369-394). Channels-mode actors are supported via the in-graph
    frame stack (env.use_frame_stack + model.patch_mode='channels')."""
    t, e, s = cfg.train, cfg.env, cfg.sac
    fs = 0
    if cfg.model.patch_mode == "channels":
        if not e.use_frame_stack:
            raise ValueError("patch_mode='channels' needs "
                             "env.use_frame_stack=True in train_vec")
        fs = int(e.frame_stack)
    elif e.use_frame_stack:
        raise ValueError("env.use_frame_stack=True needs "
                         "model.patch_mode='channels'")

    rng = RngStream(t.seed)
    agent = SACAgent(cfg)
    state = agent.init_state(t.seed)
    if t.pre_train and t.pre_train_model:
        d, f = os.path.split(t.pre_train_model)
        state = agent.load(state, f, d or ".", actor_only=True)

    ckpt_dir = os.path.join(out_dir, t.checkpoint_dir)
    if resume:
        latest = ckpt.latest_checkpoint(ckpt_dir)
        if latest:
            state = ckpt.restore_train_state(latest, state)

    ih, iw = cfg.model.image_size
    consts = make_consts(world=world or "rrc", image_hw=(ih, iw),
                         max_steps=e.max_steps, seed=t.seed)
    coll = VecCollector(agent, consts, n_envs, chunk,
                        l_scale=e.linear_cmd_scale,
                        a_scale=e.angular_cmd_scale,
                        max_action=e.max_action, frame_stack=fs)
    carry = coll.init()

    obs_shape = (fs, ih, iw) if fs else (ih, iw)
    buf_cls = PrioritizedReplayBuffer if s.prioritized_replay else ReplayBuffer
    buf = buf_cls(s.buffer_size, reference_schema(obs_shape, s.action_dim,
                                                  s.pstate_dim), seed=t.seed)
    logger = MetricsLogger(out_dir, f"train_vec_{cfg.model.name}_{t.desc}")

    to_batch = lambda d: {k: jnp.asarray(v) for k, v in d.items()}
    env_steps = goals = collisions = episodes = 0
    n_chunk = 0
    metrics: Dict = {}
    while env_steps < total_env_steps:
        carry, traj = coll.collect(state.actor_params, carry, rng.next())
        flat, st = _flatten_traj(traj)
        env_steps += n_envs * chunk
        goals += st["goals"]
        collisions += st["collisions"]
        episodes += st["episodes_done"]
        if st["stored"]:
            flat["engage"] = np.zeros((st["stored"],), np.float32)
            buf.add(**flat)

        n_upd = st["stored"] if updates_per_chunk is None else updates_per_chunk
        if buf.get_stored_size() >= s.batch_size:
            for _ in range(n_upd):
                if s.prioritized_replay:
                    d = buf.sample(s.batch_size)
                    w = d.pop("weights")
                    idx = d.pop("indexes")
                    d.pop("engage", None)
                    state, metrics, td = agent.learn_per(state, to_batch(d), w)
                    buf.update_priorities(idx, np.abs(np.asarray(td)) + 1e-6)
                else:
                    d = buf.sample(s.batch_size)
                    d.pop("engage", None)
                    state, metrics = agent.learn(state, to_batch(d))

        n_chunk += 1
        sac_m = {k: float(v) for k, v in (metrics or {}).items()
                 if k in ("alpha", "policy_loss", "qf1_loss", "qf2_loss",
                          "entropy", "skipped_nonfinite")}
        logger.log(n_chunk, env_steps=env_steps, goals=goals,
                   collisions=collisions, episodes=episodes,
                   chunk_reward=st["reward_sum"],
                   buffer=buf.get_stored_size(), **sac_m)
        if t.save and save_interval_chunks and n_chunk % save_interval_chunks == 0:
            ckpt.save_train_state(ckpt_dir, int(state.itera), state)
            ckpt.prune_checkpoints(ckpt_dir, keep=3)

    if t.save:
        ckpt.save_train_state(ckpt_dir, int(state.itera), state)
        ckpt.prune_checkpoints(ckpt_dir, keep=3)
    return {"env_steps": env_steps, "goals": goals, "collisions": collisions,
            "episodes": episodes, "updates": int(state.itera),
            "state": state}


def main(argv=None):
    p = argparse.ArgumentParser(description="dgvit_tpu vectorized RL training")
    p.add_argument("--config", default=None)
    p.add_argument("--out", default="results")
    p.add_argument("--n-envs", type=int, default=16)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--env-steps", type=int, default=100_000)
    p.add_argument("--updates-per-chunk", type=int, default=None)
    p.add_argument("--world", default="rrc")
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)
    cfg = Config.from_yaml(args.config) if args.config else Config()
    out = train_vec(cfg, out_dir=args.out, n_envs=args.n_envs,
                    chunk=args.chunk, total_env_steps=args.env_steps,
                    updates_per_chunk=args.updates_per_chunk,
                    world=args.world, resume=args.resume)
    print(f"env steps: {out['env_steps']}  episodes: {out['episodes']}  "
          f"goals: {out['goals']}  collisions: {out['collisions']}  "
          f"updates: {out['updates']}")


if __name__ == "__main__":
    main()
