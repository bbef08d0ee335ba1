"""RL training driver — main.py:130-424 rebuilt on the TPU stack.

Behavioral contract mirrored from the reference:
  * expert demos preloaded into the expert buffer (main.py:223-268)
  * action mapping a_in = [(a0+1)*L_SCALE, a1*A_SCALE] (main.py:320,370)
  * first-step special case + "Bad Initialization" skip (main.py:310-334)
  * rolling-20 mean; evaluation when mean >= reward_threshold and
    ep_real > eval_threshold; save when avg_reward > save_threshold or
    collisions < 6, with metric-encoded names (main.py:345-356)
  * reward curve npy/png every plot_interval (main.py:364-365)
  * final summary appended to results/training_data.txt (main.py:410-417)

TPU differences (by design): one fused jitted SAC update per step instead of
~8 dispatches; full train-state checkpoints so runs resume; env is pluggable
(kinematic/replay for Gazebo-free runs, ROS2 adapter for the real sim).
"""

from __future__ import annotations

import argparse
import glob
import os
import time
from typing import Optional

import jax
import numpy as np

from dgvit_tpu.agents import SACAgent
from dgvit_tpu.config import Config, load_reference_yaml
from dgvit_tpu.core import checkpoint as ckpt
from dgvit_tpu.core.rng import RngStream
from dgvit_tpu.envs import Env, KinematicNavEnv
from dgvit_tpu.envs.replay_env import load_demo_npz
from dgvit_tpu.replay import PrioritizedReplayBuffer, ReplayBuffer
from dgvit_tpu.replay.buffer import reference_schema
from dgvit_tpu.replay.staging import BatchPrefetcher
from dgvit_tpu.utils import MetricsLogger, RewardCurve


class FrameStacker:
    """Online (C, H, W) frame stacking for model.patch_mode='channels'.
    The reference records 4-channel demos (component #23) but comments the
    live concatenation out (main.py:66-69,323); env.use_frame_stack=True
    enables it here."""

    def __init__(self, depth: int):
        self.depth = int(depth)
        self._frames = None

    def reset(self, frame: np.ndarray) -> np.ndarray:
        self._frames = [frame] * self.depth
        return np.stack(self._frames)

    def push(self, frame: np.ndarray) -> np.ndarray:
        self._frames = self._frames[1:] + [frame]
        return np.stack(self._frames)


def _maybe_stacker(cfg: Config) -> Optional[FrameStacker]:
    if getattr(cfg.env, "use_frame_stack", False):
        if cfg.model.patch_mode != "channels":
            raise ValueError(
                "env.use_frame_stack=True needs model.patch_mode='channels'")
        return FrameStacker(cfg.env.frame_stack)
    return None


def evaluate(env: Env, agent: SACAgent, state, rng: RngStream,
             max_steps: int, l_scale: float, a_scale: float,
             max_action: float = 1.0, eval_episodes: int = 10,
             logger: Optional[MetricsLogger] = None, epoch: int = 0,
             stacker: Optional[FrameStacker] = None):
    """main.py:55-114: N deterministic episodes, mean reward + collisions."""
    env.collision = 0
    ep = 0
    rewards = []
    while ep < eval_episodes:
        count = 0
        r = env.reset()
        state_obs = np.squeeze(r.state, -1) if r.state.ndim == 3 else r.state
        if stacker:
            state_obs = stacker.reset(state_obs)
        goal = r.to_goal
        avg_reward = 0.0
        done = False
        while not done and count < max_steps:
            a = np.asarray(agent.choose_action(
                state, state_obs, goal[:2], rng.next(), evaluate=True))
            a = a.clip(-max_action, max_action)
            a_in = [(a[0] + 1) * l_scale, a[1] * a_scale]
            s = env.step(a_in, count)
            if count == 0 and s.done:
                # Bad initialization, skip episode (main.py:329-334)
                ep -= 1
                if not s.target:
                    env.collision -= 1
                break
            avg_reward += s.reward if count > 0 else 0.0
            state_obs = np.squeeze(s.state, -1) if s.state.ndim == 3 else s.state
            if stacker:
                state_obs = stacker.push(state_obs)
            goal = s.to_goal
            done = s.done
            count += 1
        ep += 1
        rewards.append(avg_reward)
    mean_r = float(np.mean(rewards)) if rewards else 0.0
    col = env.collision
    if logger:
        logger.log(epoch, eval_reward=mean_r, eval_collisions=col)
    return mean_r, col


def load_expert_dataset(pattern: str):
    """main.py:223-268: glob + natsort + concat demo npz files."""
    try:
        from natsort import natsorted
        files = natsorted(glob.glob(pattern))
    except ImportError:
        files = sorted(glob.glob(pattern))
    if not files:
        return None
    return load_demo_npz(files)


def train(cfg: Config, env: Env, out_dir: str = "results",
          expert_glob: Optional[str] = None, max_episodes: Optional[int] = None,
          resume: bool = False, intervention=None) -> dict:
    """`intervention`: optional human-in-the-loop source with `.engaged` and
    `.read_action() -> [linear, angular]` (train/keyboard_control.KeyboardTeleop
    or any duck-typed stand-in). When engaged, the human command overrides the
    policy action and the transition is stored with engage=1.0, feeding the
    engage loss in learn_guidence (DRL.py:267-276; keyboard '1'/'2' gate)."""
    t = cfg.train
    e = cfg.env
    s = cfg.sac
    rng = RngStream(t.seed)
    agent = SACAgent(cfg)
    state = agent.init_state(t.seed)

    # PRE_TRAIN: warm-start the actor from an IL checkpoint (main.py:272-274)
    if t.pre_train and not t.if_test and t.pre_train_model:
        d, f = os.path.split(t.pre_train_model)
        state = agent.load(state, f, d or ".", actor_only=True)
    # IF_TEST: load actor+critic and hard-refresh the target (main.py:275-278)
    if t.if_test and t.test_model:
        d, f = os.path.split(t.test_model)
        state = agent.load(state, f, d or ".")
        state = agent.load_target(state)

    ckpt_dir = os.path.join(out_dir, t.checkpoint_dir)
    resumed_replay = None
    if resume:
        latest = ckpt.latest_checkpoint(ckpt_dir)
        if latest:
            state = ckpt.restore_train_state(latest, state)
            # warm-buffer restart: a replay snapshot saved alongside this
            # step (t.save_replay) is reloaded once the buffer exists below
            snap = os.path.join(
                ckpt_dir, f"replay_{os.path.basename(latest)}.npz")
            if os.path.exists(snap):
                resumed_replay = snap

    logger = MetricsLogger(out_dir, f"train_{cfg.model.name}_{t.desc}")
    curve = RewardCurve()

    ih, iw = cfg.model.image_size
    stacker = _maybe_stacker(cfg)
    obs_shape = (e.frame_stack, ih, iw) if stacker else (ih, iw)
    # uniform runs use the plain ring buffer: no sum-tree writes, no IS
    # weights/indexes riding into the jitted step as dead pytree leaves
    buf_cls = PrioritizedReplayBuffer if s.prioritized_replay else ReplayBuffer
    buf = buf_cls(
        s.buffer_size, reference_schema(obs_shape, s.action_dim, s.pstate_dim),
        seed=t.seed)
    if resumed_replay:
        # PER note: transitions reload through add(), so priorities reset to
        # the max default (cpprb load_transitions semantics) and re-anneal
        buf.load_transitions(resumed_replay)

    expert_buf = None
    expert_size = 0
    if t.pre_buffer and expert_glob:
        data = load_expert_dataset(expert_glob)
        if data is not None:
            # expert demos are sampled uniformly in the reference
            expert_buf = ReplayBuffer(
                data["obs"].shape[0] + 1,
                reference_schema(obs_shape, s.action_dim, s.pstate_dim,
                                 expert=True), seed=t.seed)
            if stacker:
                # 4-channel demos (N, H, W, C) -> (N, C, H, W); single-frame
                # demos get channel-replicated to the stack depth
                def to_stack(a):
                    if a.ndim == 4:
                        return a.transpose(0, 3, 1, 2)
                    return np.repeat(a[:, None], e.frame_stack, axis=1)
                obs = to_stack(data["obs"])
                nxt = to_stack(data["next_obs"])
            else:
                obs = (data["obs"][..., 0] if data["obs"].ndim == 4
                       else data["obs"])
                nxt = (data["next_obs"][..., 0] if data["next_obs"].ndim == 4
                       else data["next_obs"])
            n = obs.shape[0]
            expert_buf.add(obs=obs, act_exp=data["act"],
                           pobs=data["goal"][:, :2],
                           next_pobs=data["next_goal"][:, :2],
                           rew=np.resize(data["reward"], (n,)),
                           next_obs=nxt,
                           done=data["done"].astype(np.float32))
            expert_size = n

    max_eps = max_episodes if max_episodes is not None else e.max_episodes
    max_action = e.max_action
    reward_threshold = t.reward_threshold
    save_threshold = t.save_threshold
    cntr2 = 0   # successes
    ep_real = 0
    total_steps = 0
    metrics = {}   # last learn metrics (rides along in the episode log)
    start_time = time.time()
    prefetcher = None

    def to_batch(d):
        import jax.numpy as jnp
        return {k: jnp.asarray(v) for k, v in d.items()}

    def _plain_sample():
        d = buf.sample(s.batch_size)
        d.pop("engage", None)
        d.pop("weights", None)
        d.pop("indexes", None)
        return d

    for ep in range(max_eps):
        episode_reward = 0.0
        r = env.reset()
        obs = np.squeeze(r.state, -1) if r.state.ndim == 3 else r.state
        if stacker:
            obs = stacker.reset(obs)
        goal = r.to_goal
        done = False
        bad_init = False
        for timestep in range(e.max_steps):
            a = np.asarray(agent.choose_action(
                state, obs, goal[:2], rng.next(), evaluate=t.if_test))
            a = a.clip(-max_action, max_action)
            engage = 0.0
            if intervention is not None and getattr(intervention, "engaged",
                                                    False):
                # human override: execute the teleop command and store it in
                # POLICY units (inverse of the a_in mapping below) with
                # engage=1 so learn_guidence's intervention loss can pull the
                # policy mean toward it (DRL.py:267-276). The unit conversion
                # is deliberate — round 1 showed command-unit labels vs
                # policy-unit deployment costs ~25% success (BENCH.md).
                cmd = intervention.read_action()
                a = np.asarray(
                    [cmd[0] / e.linear_cmd_scale - 1.0,
                     cmd[1] / e.angular_cmd_scale],
                    np.float32).clip(-max_action, max_action)
                engage = 1.0
            a_in = [(a[0] + 1) * e.linear_cmd_scale, a[1] * e.angular_cmd_scale]
            last_goal = goal
            sres = env.step(a_in, timestep)
            next_obs = (np.squeeze(sres.state, -1) if sres.state.ndim == 3
                        else sres.state)
            if stacker:
                next_obs = stacker.push(next_obs)
            goal = sres.to_goal
            done = sres.done

            if timestep == 0:
                if done:  # Bad initialization (main.py:329-334)
                    bad_init = True
                    break
                obs = next_obs
                continue

            episode_reward += sres.reward
            if not t.if_test:
                buf.add(obs=obs, act=a, pobs=last_goal[:2],
                        next_pobs=goal[:2], rew=sres.reward,
                        next_obs=next_obs, engage=engage, done=float(done))
                if buf.get_stored_size() >= s.batch_size:
                    use_guided = expert_buf is not None and (
                        t.human_intervention or t.pre_buffer)
                    if use_guided or (t.human_intervention
                                      and intervention is not None):
                        ab = buf.sample(s.batch_size)
                        # PER bookkeeping keys: with prioritized_replay on,
                        # the IS weights feed the guided+PER step and the
                        # indexes receive priority updates; otherwise they
                        # must not ride into the jitted step as dead leaves
                        w = ab.pop("weights", None)
                        idx = ab.pop("indexes", None)
                        if expert_buf is not None:
                            k = agent.expert_batch_size(
                                expert_size, buf.get_stored_size(),
                                s.batch_size)
                            eb = expert_buf.sample(s.batch_size)
                            eb["act"] = eb.pop("act_exp")
                        else:
                            # intervention-only mode: engage loss still needs
                            # the guided step; feed an all-masked expert batch
                            k = 0
                            eb = {key: np.zeros_like(v)
                                  for key, v in ab.items() if key != "engage"}
                        eb.pop("engage", None)  # only the agent batch's engage is used
                        if s.prioritized_replay and w is not None:
                            state, metrics, td = agent.learn_guidence_per(
                                state, to_batch(ab), to_batch(eb), k, w)
                            buf.update_priorities(
                                idx, np.abs(np.asarray(td)) + 1e-6)
                        else:
                            state, metrics = agent.learn_guidence(
                                state, to_batch(ab), to_batch(eb), k)
                    elif s.prioritized_replay:
                        d = buf.sample(s.batch_size)
                        w = d.pop("weights")
                        idx = d.pop("indexes")
                        d.pop("engage", None)
                        state, metrics, td = agent.learn_per(
                            state, to_batch(d), w)
                        # new priorities = |TD error| + eps (standard PER;
                        # the reference stubs this at DRL.py:365-368)
                        buf.update_priorities(
                            idx, np.abs(np.asarray(td)) + 1e-6)
                    elif s.prefetch_batches:
                        # background thread samples + device_puts the NEXT
                        # batch while the device runs the current step
                        if prefetcher is None:
                            prefetcher = BatchPrefetcher(_plain_sample,
                                                         depth=2)
                        state, metrics = agent.learn(state, next(prefetcher))
                    else:
                        state, metrics = agent.learn(
                            state, to_batch(_plain_sample()))
            obs = next_obs
            total_steps += 1
            if sres.target:
                cntr2 += 1
            if done or timestep == e.max_steps - 1:
                break

        if bad_init:
            continue
        ep_real += 1
        mean_r = curve.append(episode_reward)
        # SAC internals ride along so temperature/loss trajectories are
        # diagnosable from the JSONL (the reference logs nothing here —
        # its TensorBoard hooks are commented out, DRL.py:354-357)
        sac_m = {k: float(v) for k, v in (metrics or {}).items()
                 if k in ("alpha", "alpha_loss", "policy_loss",
                          "qf1_loss", "qf2_loss", "entropy",
                          "skipped_nonfinite")}
        logger.log(ep_real, episode_reward=episode_reward, mean_reward=mean_r,
                   **sac_m)

        # periodic full-train-state checkpoint — the restart points the
        # elastic supervisor (train_elastic / core/elastic.py) resumes from.
        # Keyed by the LEARN-STEP counter (state.itera), which survives
        # restore and stays monotonic across restarts — episode-keyed names
        # would reset to 1 after a restart and lose to the stale pre-fault
        # max in latest_checkpoint()
        if (t.save and not t.if_test and t.save_interval
                and ep_real % t.save_interval == 0):
            ckpt.save_train_state(ckpt_dir, int(state.itera), state)
            if t.save_replay and buf.get_stored_size() > 0:
                buf.save_transitions(os.path.join(
                    ckpt_dir, f"replay_step_{int(state.itera)}"))
            # retention: keep only the newest few periodic checkpoints so
            # long runs don't accumulate unbounded step_* directories
            ckpt.prune_checkpoints(ckpt_dir, keep=3)
            ckpt.prune_step_files(ckpt_dir, "replay_step", keep=3)

        # evaluation + checkpoint trigger (main.py:345-356)
        if (mean_r >= reward_threshold and ep_real > t.eval_threshold
                and not t.if_test):
            reward_threshold = mean_r
            avg_reward, nb_col = evaluate(
                env, agent, state, rng, e.max_steps, e.linear_cmd_scale,
                e.angular_cmd_scale, max_action, t.eval_epoch, logger, ep_real,
                stacker=_maybe_stacker(cfg))
            if avg_reward > save_threshold or nb_col < 6:
                name = ckpt.reference_name(
                    f"eval_{t.desc}_{cntr2}", int(avg_reward), t.seed, nb_col)
                ckpt.save_params_npz(os.path.join(out_dir, "models"), name,
                                     jax.tree_util.tree_map(np.asarray,
                                                            state.actor_params))
                ckpt.save_train_state(ckpt_dir, int(state.itera), state)
                curve.save_npy(os.path.join(out_dir, "curves",
                                            f"eval_reward_mean_{t.desc}.npy"))
                save_threshold = avg_reward

        if ep_real % t.plot_interval == 0:
            curve.save_png(os.path.join(
                out_dir, f"plot_{cfg.model.name}{cfg.model.block}"
                f"{cfg.model.head}_{t.desc}.png"),
                title=f"desc: {t.desc} block={cfg.model.block} "
                      f"head={cfg.model.head}")

    if prefetcher is not None:
        prefetcher.close()
    # final save + summary (main.py:404-417)
    if t.save and not t.if_test:
        ckpt.save_train_state(ckpt_dir, int(state.itera), state)
        name = ckpt.reference_name(t.desc, int(curve.means[-1]) if curve.means
                                   else 0, t.seed)
        ckpt.save_params_npz(os.path.join(out_dir, "models"), name,
                             jax.tree_util.tree_map(np.asarray,
                                                    state.actor_params))
    duration = time.time() - start_time
    s_r = cntr2 / max(ep_real, 1)
    logger.append_txt(
        "training_data.txt",
        "\n" + "-" * 80 + "\n"
        f"Id = {t.desc} \t Sensor = {e.vis_sensor} Auto-tune: {s.auto_tune_alpha}\n"
        f"seed = {t.seed} critic_type: {cfg.model.critic_type} \t "
        f"actor_type: {cfg.model.actor_type} \t lfs = {cfg.model.latent_size} "
        f"blocks = {cfg.model.block} heads = {cfg.model.head}\n"
        f"Successes: {cntr2} ({s_r * 100:.1f} %), max mean reward = "
        f"{curve.max_mean:.2f} \t Duration = {duration:.1f} (s)\n")
    return {"successes": cntr2, "episodes": ep_real,
            "max_mean_reward": curve.max_mean, "state": state}


def train_elastic(cfg: Config, env_factory, out_dir: str = "results",
                  max_restarts: int = 3, resume: bool = False, **kw) -> dict:
    """Elastic RL training: `train()` under a restart supervisor
    (core/elastic.py). On a designated failure — device loss / XLA runtime
    error / injected fault — the env is REBUILT via `env_factory()` and
    training relaunches with resume=True, restoring the newest periodic
    full-train-state checkpoint (params, targets, optimizers, alpha, step,
    RNG). Agent state resumes exactly; the episode counter restarts (RL
    episodes are not a deterministic data stream, unlike the offline
    trainers, so there is nothing to replay). Replay buffer across restarts:
    EMPTY by default (updates pause until batch_size fresh transitions
    accumulate); set cfg.train.save_replay=True to snapshot transitions next
    to each periodic checkpoint and resume with a warm buffer (~10 GB raw
    per snapshot at the full reference buffer size — see TrainConfig)."""
    import logging

    from dgvit_tpu.core.elastic import default_failure_types

    failure_types = default_failure_types()
    restarts = 0
    while True:
        env = env_factory()
        try:
            return train(cfg, env, out_dir=out_dir,
                         resume=resume or restarts > 0, **kw)
        except failure_types as exc:
            restarts += 1
            if restarts > max_restarts:
                raise
            logging.getLogger("dgvit.elastic").warning(
                "train_elastic: %s: %s — restarting (%d/%d)",
                type(exc).__name__, exc, restarts, max_restarts)


def main(argv=None):
    p = argparse.ArgumentParser(description="dgvit_tpu RL training")
    p.add_argument("--config", help="structured YAML config")
    p.add_argument("--reference-config",
                   help="reference-format config.yaml to translate")
    p.add_argument("--env", default="kinematic",
                   choices=["kinematic", "replay", "ros2"])
    p.add_argument("--world", default="rrc",
                   help="kinematic world preset (rrc | hospital)")
    p.add_argument("--expert-glob", default=None)
    p.add_argument("--out", default="results")
    p.add_argument("--episodes", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    if args.reference_config:
        cfg = load_reference_yaml(args.reference_config)
    elif args.config:
        cfg = Config.from_yaml(args.config)
    else:
        cfg = Config()

    if args.env == "kinematic":
        env = KinematicNavEnv(seed=cfg.train.seed,
                              image_hw=tuple(cfg.model.image_size),
                              world=args.world)
    elif args.env == "replay":
        from dgvit_tpu.envs import ReplayEnv
        env = ReplayEnv(glob_pattern=args.expert_glob)
    else:
        from dgvit_tpu.envs.ros2_adapter import GazeboRos2Env
        env = GazeboRos2Env(cfg)

    intervention = None
    if cfg.train.human_intervention:
        import sys
        if sys.stdin.isatty():
            from dgvit_tpu.train.keyboard_control import KeyboardTeleop
            intervention = KeyboardTeleop()

    out = train(cfg, env, args.out, args.expert_glob, args.episodes,
                args.resume, intervention=intervention)
    print(f"done: {out['successes']} successes over {out['episodes']} episodes,"
          f" max mean reward {out['max_mean_reward']:.2f}")


if __name__ == "__main__":
    main()
