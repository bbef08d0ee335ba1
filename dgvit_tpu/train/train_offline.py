"""Offline RL training from logged transitions — the Gazebo-free end-to-end
train loop (BASELINE.json config #5: replay sample -> augment -> actor-critic
update on logged Data/ trajectories).

The loop saturates the chip: the C++ buffer samples and stages batches on a
background thread (replay/staging.py) while the device runs the fused SAC
update; optional on-the-fly noise augmentation runs inside the same jit."""

from __future__ import annotations

import argparse
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dgvit_tpu.agents import SACAgent
from dgvit_tpu.config import Config
from dgvit_tpu.core import checkpoint as ckpt
from dgvit_tpu.envs.replay_env import load_demo_npz
from dgvit_tpu.replay import BatchPrefetcher, PrioritizedReplayBuffer
from dgvit_tpu.replay.buffer import reference_schema
from dgvit_tpu.utils import MetricsLogger


def fill_buffer_from_demos(pattern_or_data, cfg: Config):
    s = cfg.sac
    ih, iw = cfg.model.image_size
    if isinstance(pattern_or_data, dict):
        data = pattern_or_data
    else:
        import glob
        files = sorted(glob.glob(pattern_or_data))
        if not files:
            raise FileNotFoundError(pattern_or_data)
        data = load_demo_npz(files)
    obs = data["obs"][..., 0] if data["obs"].ndim == 4 else data["obs"]
    nxt = data["next_obs"][..., 0] if data["next_obs"].ndim == 4 else data["next_obs"]
    n = obs.shape[0]
    buf = PrioritizedReplayBuffer(
        max(s.buffer_size, n), reference_schema((ih, iw), s.action_dim,
                                                s.pstate_dim),
        seed=cfg.train.seed)
    buf.add(obs=obs, act=data["act"], pobs=data["goal"][:, :2],
            next_pobs=data["next_goal"][:, :2],
            rew=np.resize(data["reward"], (n,)), next_obs=nxt,
            engage=np.zeros(n, np.float32),
            done=data["done"].astype(np.float32))
    return buf


def train_offline(cfg: Config, buf, steps: int = 1000,
                  out_dir: str = "results", augment_sigma: float = 0.0,
                  prefetch_depth: int = 2, log_every: int = 100,
                  checkpointer=None):
    """`checkpointer`: optional core/elastic.ElasticCheckpointer — resumes
    from its newest checkpoint and saves every `interval` steps, making the
    loop restartable under core/elastic.run_elastic after device loss."""
    agent = SACAgent(cfg)
    state = agent.init_state(cfg.train.seed)
    start_step = 0
    if checkpointer is not None:
        state, start_step = checkpointer.resume(state)
    logger = MetricsLogger(out_dir, "offline")
    b = cfg.sac.batch_size

    if augment_sigma > 0.0:
        base_learn = agent._train_step_impl

        def learn_aug(state, batch):
            key = jax.random.fold_in(state.rng, state.itera + 7777)
            noise = augment_sigma / 255.0 * jax.random.normal(
                key, batch["obs"].shape, jnp.float32)
            batch = dict(batch)
            batch["obs"] = jnp.clip(batch["obs"] + noise, 0.0, 1.0)
            return base_learn(state, batch)

        learn = jax.jit(learn_aug, donate_argnums=(0,))
    else:
        learn = agent._train_step

    use_per = bool(cfg.sac.prioritized_replay) and buf.prioritized \
        and augment_sigma == 0.0
    pf = BatchPrefetcher(lambda: buf.sample(b), depth=prefetch_depth)
    t0 = time.time()
    metrics = {}
    try:
        for step in range(start_step, steps):
            batch = next(pf)
            if use_per:
                idx = np.asarray(batch.pop("indexes"))
                w = batch.pop("weights")
                state, metrics, td = agent.learn_per(state, batch, w)
                # |TD error| + eps — a signed td would feed negative
                # priorities into the sum tree (matches train_rl.py)
                buf.update_priorities(idx, np.abs(np.asarray(td)) + 1e-6)
            else:
                batch.pop("weights", None)
                batch.pop("indexes", None)
                state, metrics = learn(state, batch)
            if checkpointer is not None:
                checkpointer.maybe_save(step + 1, state)
            if (step + 1) % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["steps_per_sec"] = (step + 1) / (time.time() - t0)
                logger.log(step + 1, **m)
    finally:
        pf.close()
    wall = time.time() - t0
    return state, {"steps_per_sec": steps / wall,
                   "final": {k: float(v) for k, v in metrics.items()}}


def main(argv=None):
    p = argparse.ArgumentParser(description="offline SAC from logged demos")
    p.add_argument("--data-glob", required=True)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--augment-sigma", type=float, default=0.0)
    p.add_argument("--out", default="results")
    p.add_argument("--save", action="store_true")
    args = p.parse_args(argv)

    cfg = Config()
    buf = fill_buffer_from_demos(args.data_glob, cfg)
    state, stats = train_offline(cfg, buf, args.steps, args.out,
                                 args.augment_sigma)
    if args.save:
        ckpt.save_train_state(f"{args.out}/checkpoints", args.steps, state)
    print(f"{stats['steps_per_sec']:.1f} updates/s; final metrics "
          f"{stats['final']}")


if __name__ == "__main__":
    main()
