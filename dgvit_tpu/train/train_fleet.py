"""Fleet-collection training: N robots collect while ONE learner updates.

The reference's core loop is train-while-collect on a single robot —
every env step stores a transition and immediately runs one SAC update
(main.py:369-394). The TPU-idiomatic scaling of that loop is a FLEET:

    robot_0..N-1 threads ──► BatchingActorServer ──► one actor dispatch
         │  on_transition        (stochastic actions,  (coalesced padded
         ▼                        latest params)        buckets)
    thread-safe replay ring  ◄── learner thread: SAC updates stream off
    (replay/buffer.py, C++)       the shared buffer; fresh actor params
                                  are published to the server after every
                                  update (latest-wins, like the sensor
                                  mailboxes — a stale read costs one
                                  dispatch of slightly-old policy)

Differences from the host loop (train/train_rl.py), by design:
  * actions are batched + stochastic through the serving layer, so the
    device sees a few large fixed shapes instead of N single-frame calls
  * the update:step cadence is a TARGET ratio (updates_per_step, default
    1.0 = the reference cadence) the learner tracks, not a lockstep gate —
    collection never blocks on the learner
  * no human intervention path (engage ≡ 0): a fleet has no teleop seat;
    the single-robot host loop stays the intervention-parity tier

Plain / PER / expert-guided (PRE_BUFFER) update variants mirror
train_rl.py's dispatch exactly; the same agent, buffer schema, and
checkpoint formats are used throughout.
"""

from __future__ import annotations

import argparse
import os
import threading
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dgvit_tpu.agents import SACAgent
from dgvit_tpu.config import Config, load_reference_yaml
from dgvit_tpu.core import checkpoint as ckpt
from dgvit_tpu.core.rng import RngStream
from dgvit_tpu.envs import KinematicNavEnv
from dgvit_tpu.replay import PrioritizedReplayBuffer, ReplayBuffer
from dgvit_tpu.replay.buffer import reference_schema
from dgvit_tpu.serve import BatchingActorServer, FleetRunner
from dgvit_tpu.train.train_rl import load_expert_dataset
from dgvit_tpu.utils import MetricsLogger


class _Collector:
    """Thread-safe on_transition consumer: FleetRunner robot threads feed
    the shared replay buffer (the buffer's own add() is locked; the counters
    here get their own lock so the learner reads a consistent step count)."""

    def __init__(self, buf):
        self.buf = buf
        self.steps = 0
        self.episodes_done = 0
        self._lock = threading.Lock()

    def __call__(self, robot, obs, a, goal, rew, next_obs, next_goal, done):
        # demo-npz row layout -> reference buffer schema (main.py:385-392);
        # engage=0: no teleop seat in a fleet
        self.buf.add(obs=obs, act=a, pobs=goal[:2], next_pobs=next_goal[:2],
                     rew=rew, next_obs=next_obs, engage=0.0, done=float(done))
        with self._lock:
            self.steps += 1
            if done:
                self.episodes_done += 1


def _build_expert_buffer(cfg: Config, expert_glob: Optional[str], obs_shape,
                         seed: int):
    """PRE_BUFFER workflow (main.py:223-268) — same transform as train_rl."""
    s = cfg.sac
    if not (cfg.train.pre_buffer and expert_glob):
        return None, 0
    data = load_expert_dataset(expert_glob)
    if data is None:
        return None, 0
    buf = ReplayBuffer(
        data["obs"].shape[0] + 1,
        reference_schema(obs_shape, s.action_dim, s.pstate_dim, expert=True),
        seed=seed)
    obs = data["obs"][..., 0] if data["obs"].ndim == 4 else data["obs"]
    nxt = (data["next_obs"][..., 0] if data["next_obs"].ndim == 4
           else data["next_obs"])
    n = obs.shape[0]
    buf.add(obs=obs, act_exp=data["act"], pobs=data["goal"][:, :2],
            next_pobs=data["next_goal"][:, :2],
            rew=np.resize(data["reward"], (n,)), next_obs=nxt,
            done=data["done"].astype(np.float32))
    return buf, n


def train_fleet(cfg: Config, envs: Sequence, out_dir: str = "results",
                max_episodes: int = 100, expert_glob: Optional[str] = None,
                updates_per_step: float = 1.0, max_wait_ms: float = 4.0,
                log_every_updates: int = 200, mesh_data: int = 0,
                resume: bool = False,
                save_every_updates: int = 500) -> dict:
    """Train one SAC learner from N concurrently-collecting robots.

    envs: Env-protocol robots (KinematicNavEnv lanes, or namespaced
    GazeboRos2Env adapters from serve.make_ros2_fleet for a live world).
    max_episodes: TOTAL episode budget, split evenly across robots.
    updates_per_step: target learner updates per collected env step
    (1.0 = the reference's one-update-per-step cadence, main.py:394).
    mesh_data: >0 shards the LEARNER over a data mesh of that many devices
    (parallel.shardmap_learn — equality-gated vs the single-device step);
    batch_size stays the GLOBAL batch. Acting stays single-device: the
    coalesced serving batches are tiny next to the chips' capacity, and a
    grad_axis agent's row-indexed noise only resolves inside shard_map.
    """
    t, e, s = cfg.train, cfg.env, cfg.sac
    n_robots = len(envs)
    if max_episodes % n_robots:
        raise ValueError(f"max_episodes {max_episodes} must divide evenly "
                         f"across {n_robots} robots")
    rng = RngStream(t.seed)
    rt = None
    if mesh_data:
        from dgvit_tpu.core.mesh import AXIS_DATA, MeshRuntime
        from dgvit_tpu.parallel import shardmap_learn

        rt = MeshRuntime.create(data=mesh_data)
        agent = SACAgent(cfg, grad_axis=AXIS_DATA)
        act_agent = SACAgent(cfg)  # acting outside shard_map
        sm_flavors = {
            f: shardmap_learn(agent, rt, flavor=f)
            for f in ("plain", "per", "guided", "guided_per")
        }
    else:
        agent = SACAgent(cfg)
        act_agent = agent
    state = agent.init_state(t.seed)
    if t.pre_train and t.pre_train_model:  # IL warm start (main.py:272-274)
        d, f = os.path.split(t.pre_train_model)
        state = agent.load(state, f, d or ".", actor_only=True)
    if rt is not None:
        state = jax.device_put(state, rt.replicated())
    ckpt_dir = os.path.join(out_dir, t.checkpoint_dir)
    if resume:
        latest = ckpt.latest_checkpoint(ckpt_dir)
        if latest is not None:
            state = ckpt.restore_train_state(latest, state)
            if rt is not None:
                state = jax.device_put(state, rt.replicated())
            print(f"[train_fleet] resumed train state from {latest} "
                  f"(itera={int(state.itera)})", flush=True)

    ih, iw = cfg.model.image_size
    obs_shape = ((e.frame_stack, ih, iw)
                 if cfg.model.patch_mode == "channels" else (ih, iw))
    buf_cls = PrioritizedReplayBuffer if s.prioritized_replay else ReplayBuffer
    buf = buf_cls(s.buffer_size,
                  reference_schema(obs_shape, s.action_dim, s.pstate_dim),
                  seed=t.seed)
    expert_buf, expert_size = _build_expert_buffer(cfg, expert_glob,
                                                   obs_shape, t.seed)
    collector = _Collector(buf)
    logger = MetricsLogger(out_dir, f"train_fleet_{cfg.model.name}_{t.desc}")

    # latest-wins actor-params mailbox: the learner publishes after every
    # update; the server worker reads whatever is current at dispatch time
    params_box = [state.actor_params]

    # Device-dispatch lock: the learner thread and the server worker thread
    # otherwise issue device_put/execute concurrently, and remote-attached
    # PJRT backends are not reliably thread-safe under that (observed:
    # INVALID_ARGUMENT from batched_device_put mid-campaign on the tunneled
    # TPU). The lock serializes HOST-side dispatch ENQUEUE only — JAX
    # dispatch is async, so neither thread may hold it across a
    # device->host materialization (np.asarray of an in-flight result):
    # round-4 held it across the whole update INCLUDING the PER TD-error
    # readback and the server's action readback, which serialized the two
    # threads end-to-end and inverted fleet scaling at 8 robots
    # (bench_train_fleet2: 4 robots 3.53 steps/s -> 8 robots 3.36).
    # Device-side the two streams queue behind each other on one chip
    # anyway; what the narrow scope buys is that the learner can ENQUEUE
    # the next update while the server blocks on its action transfer and
    # vice versa.
    dev_lock = threading.Lock()

    def serve_act(obs, goal):  # server worker thread, batched
        # stochastic actions: this is training collection, not eval.
        # Enqueue under the lock; BLOCK on the transfer outside it. The
        # donated-params race stays fixed: the learner swaps params_box
        # inside the same lock BEFORE its donating update can invalidate
        # the tree a later dispatch would read, and an Execute enqueued
        # here holds a usage reference that sequences any subsequent
        # donation after it.
        with dev_lock:
            a = act_agent.act_batch(params_box[0], obs, goal, rng.next())
        return np.asarray(a)

    def to_batch(d):
        return {k: jnp.asarray(v) for k, v in d.items()}

    # mesh-sharded learner entrypoints fall back to the agent's jitted
    # single-device steps when no mesh was requested
    if rt is not None:
        learn_plain = sm_flavors["plain"]
        learn_per = sm_flavors["per"]
        learn_guided = sm_flavors["guided"]
        learn_guided_per = sm_flavors["guided_per"]
    else:
        learn_plain = agent.learn
        learn_per = agent.learn_per
        learn_guided = agent.learn_guidence
        learn_guided_per = agent.learn_guidence_per

    def one_update(state):
        """One SAC update — the exact plain/PER/guided dispatch of the host
        loop (train_rl.py), minus the intervention-only branch. Buffer
        sampling is host-side C++ (its own lock). dev_lock covers only the
        device_put + update ENQUEUE + params_box swap; the PER TD-error
        materialization (a device->host block) happens after release so
        the server can dispatch actions while the chip finishes the
        update."""
        td = idx = None
        if expert_buf is not None:
            ab = buf.sample(s.batch_size)
            w = ab.pop("weights", None)
            idx = ab.pop("indexes", None)
            k = agent.expert_batch_size(expert_size, buf.get_stored_size(),
                                        s.batch_size)
            eb = expert_buf.sample(s.batch_size)
            eb["act"] = eb.pop("act_exp")
            eb.pop("engage", None)
            with dev_lock:
                if s.prioritized_replay and w is not None:
                    state, metrics, td = learn_guided_per(
                        state, to_batch(ab), to_batch(eb), k, w)
                else:
                    idx = None
                    state, metrics = learn_guided(
                        state, to_batch(ab), to_batch(eb), k)
                params_box[0] = state.actor_params
        elif s.prioritized_replay:
            d = buf.sample(s.batch_size)
            w = d.pop("weights")
            idx = d.pop("indexes")
            d.pop("engage", None)
            with dev_lock:
                state, metrics, td = learn_per(state, to_batch(d), w)
                params_box[0] = state.actor_params
        else:
            d = buf.sample(s.batch_size)
            d.pop("engage", None)
            d.pop("weights", None)
            d.pop("indexes", None)
            with dev_lock:
                state, metrics = learn_plain(state, to_batch(d))
                params_box[0] = state.actor_params
        if td is not None and idx is not None:
            # blocks until the update lands — outside dev_lock by design
            buf.update_priorities(idx, np.abs(np.asarray(td)) + 1e-6)
        return state, metrics

    fleet_out: dict = {}
    cap = max(n_robots, 1)
    buckets = tuple(b for b in (1, 2, 4, 8, 16, 32, 64) if b <= cap) or (1,)
    if buckets[-1] < cap:
        buckets = buckets + (cap,)
    # warm the bucket compile grid before any robot moves: a cold bucket
    # compile (~20-40 s on a remote-attached chip) mid-campaign would stall
    # every coalesced robot behind it and pollute throughput accounting
    ih_, iw_ = cfg.model.image_size
    warm_obs_shape = (obs_shape if cfg.model.patch_mode == "channels"
                      else (ih_, iw_))
    for b in buckets:
        serve_act(np.zeros((b,) + warm_obs_shape, np.float32),
                  np.zeros((b, 2), np.float32))
    t0 = time.time()
    with BatchingActorServer(serve_act, max_wait_ms=max_wait_ms,
                             buckets=buckets) as srv:
        runner = FleetRunner(envs, srv, cfg, on_transition=collector)

        def collect():
            fleet_out.update(runner.run(
                episodes_per_robot=max_episodes // n_robots))

        col_thread = threading.Thread(target=collect, daemon=True)
        col_thread.start()

        updates = 0
        metrics: dict = {}
        while True:
            collecting = col_thread.is_alive()
            behind = (buf.get_stored_size() >= s.batch_size
                      and updates < collector.steps * updates_per_step)
            if behind:
                # one_update publishes the fresh actor_params to params_box
                # INSIDE its dev_lock hold, immediately after the donating
                # update is enqueued — a server dispatch can therefore never
                # read a donated/deleted tree (the round-4 race), and the
                # lock is released before any device->host block
                state, metrics = one_update(state)
                updates += 1
                if log_every_updates and updates % log_every_updates == 0:
                    logger.log(updates, steps=collector.steps,
                               episodes=collector.episodes_done,
                               **{k: float(v) for k, v in metrics.items()
                                  if k in ("alpha", "policy_loss", "qf1_loss",
                                           "entropy")})
                if (t.save and save_every_updates
                        and updates % save_every_updates == 0):
                    with dev_lock:  # device->host pulls of the state tree
                        ckpt.save_train_state(ckpt_dir, int(state.itera),
                                              state)
                    ckpt.prune_checkpoints(ckpt_dir, keep=3)
            elif collecting:
                time.sleep(0.001)  # wait for fresh experience
            else:
                break  # collection finished and the learner caught up
        col_thread.join()
    srv_stats = srv.stats()

    wall = time.time() - t0
    if t.save:
        ckpt.save_train_state(ckpt_dir, int(state.itera), state)
    out = {
        "state": state,
        "episodes": fleet_out.get("episodes", 0),
        "successes": fleet_out.get("successes", 0),
        "collisions": fleet_out.get("collisions", 0),
        "errors": fleet_out.get("errors", {}),
        "env_steps": collector.steps,
        "updates": updates,
        "wall_s": wall,
        "steps_per_s": collector.steps / max(wall, 1e-9),
        "updates_per_s": updates / max(wall, 1e-9),
        "serving": srv_stats,
    }
    logger.log(updates, final=1, **{k: v for k, v in out.items()
                                    if isinstance(v, (int, float))})
    return out


def main(argv=None):
    p = argparse.ArgumentParser(
        description="dgvit_tpu fleet-collection RL training: N robots, one "
                    "shared batching actor server, one SAC learner")
    p.add_argument("--config", help="structured YAML config")
    p.add_argument("--reference-config",
                   help="reference-format config.yaml to translate")
    p.add_argument("--fleet", type=int, default=4, help="number of robots")
    p.add_argument("--episodes", type=int, default=100,
                   help="total episode budget across the fleet")
    p.add_argument("--world", default="rrc", choices=["rrc", "hospital"])
    p.add_argument("--env", default="kinematic", choices=["kinematic", "ros2"])
    p.add_argument("--expert-glob", default=None,
                   help="demo npz glob for PRE_BUFFER guided updates")
    p.add_argument("--updates-per-step", type=float, default=1.0,
                   help="target learner updates per collected env step "
                        "(reference cadence = 1.0, main.py:394)")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard the learner over a data mesh of N devices "
                        "(parallel.shardmap_learn); batch_size stays the "
                        "global batch")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest train-state checkpoint (warm "
                        "weights; the replay buffer refills from fresh "
                        "collection)")
    p.add_argument("--save-every-updates", type=int, default=500,
                   help="periodic full-train-state checkpoint cadence "
                        "(0 = final save only)")
    p.add_argument("--out", default="results")
    args = p.parse_args(argv)

    if args.reference_config:
        cfg = load_reference_yaml(args.reference_config)
    elif args.config:
        cfg = Config.from_yaml(args.config)
    else:
        cfg = Config()

    if args.env == "kinematic":
        envs = [KinematicNavEnv(seed=cfg.train.seed + i,
                                image_hw=tuple(cfg.model.image_size),
                                world=args.world)
                for i in range(args.fleet)]
    else:
        from dgvit_tpu.serve import make_ros2_fleet
        envs = make_ros2_fleet(cfg, args.fleet)

    out = train_fleet(cfg, envs, out_dir=args.out,
                      max_episodes=args.episodes,
                      expert_glob=args.expert_glob,
                      updates_per_step=args.updates_per_step,
                      mesh_data=args.mesh_data, resume=args.resume,
                      save_every_updates=args.save_every_updates)
    print(f"fleet train done: {out['successes']} successes / "
          f"{out['episodes']} episodes / {out['env_steps']} steps / "
          f"{out['updates']} updates in {out['wall_s']:.1f} s "
          f"({out['steps_per_s']:.1f} steps/s, "
          f"{out['updates_per_s']:.1f} updates/s, mean batch "
          f"{out['serving']['mean_batch']:.2f})")
    if out["errors"]:
        raise SystemExit(f"robots failed: {out['errors']}")


if __name__ == "__main__":
    main()
