"""Evaluation driver — testing.py:40-158 rebuilt: load a trained actor,
run N deterministic episodes, report success rate / collisions / durations,
append results/testing_data.txt."""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import jax
import numpy as np

from dgvit_tpu.config import Config
from dgvit_tpu.core import checkpoint as ckpt
from dgvit_tpu.core.rng import RngStream
from dgvit_tpu.envs import Env, KinematicNavEnv
from dgvit_tpu.models import build_actor, distributions
from dgvit_tpu.utils import MetricsLogger


def run_eval(cfg: Config, env: Env, actor_params, max_episodes: int = 100,
             out_dir: str = "results", name: str = "model") -> dict:
    e = cfg.env
    rng = RngStream(cfg.train.seed)
    actor = build_actor(cfg)

    deterministic_actor = cfg.model.actor_type.startswith("Deterministic")

    @jax.jit
    def act_fn(params, obs, goal):
        out = actor.apply({"params": params}, obs[None], goal[None],
                          inference=True)
        if deterministic_actor:
            # Deterministic* actors return the tanh-squashed action directly
            # (got_sac_network.py:385,447 / vit_sac_network.py:428) — a
            # second tanh here would double-squash it.
            return out[0]
        mean, _ = out
        return jax.numpy.tanh(mean)[0]  # deterministic mean action

    cntr2 = 0
    total_rel = max_episodes
    durations = []
    done = False
    for ep in range(max_episodes):
        r = env.reset()
        obs = np.squeeze(r.state, -1) if r.state.ndim == 3 else r.state
        goal = r.to_goal
        start_time = time.time()
        for timestep in range(e.max_steps):
            a = np.asarray(act_fn(actor_params, jax.numpy.asarray(obs),
                                  jax.numpy.asarray(goal[:2])))
            a = a.clip(-e.max_action, e.max_action)
            a_in = [(a[0] + 1) * e.linear_cmd_scale, a[1] * e.angular_cmd_scale]
            s = env.step(a_in, timestep)
            obs = np.squeeze(s.state, -1) if s.state.ndim == 3 else s.state
            goal = s.to_goal
            if timestep == 0 and s.done:
                total_rel -= 1  # Bad initialization (testing.py:117-121)
                break
            if s.target:
                cntr2 += 1
                durations.append(time.time() - start_time)
            if s.done or timestep == e.max_steps - 1:
                break

    s_r = cntr2 / max(total_rel, 1)
    logger = MetricsLogger(out_dir, "testing")
    logger.append_txt(
        "testing_data.txt",
        "\n" + "-" * 40 + "/*/*/*/*/*/*/" + "-" * 40 + "\n"
        f"Model = {name} Sensor = {e.vis_sensor}\n"
        f"Number total of success : {cntr2} with percentage : "
        f"{s_r * 100:.1f} %\n")
    return {"successes": cntr2, "success_rate": s_r,
            "collisions": getattr(env, "collision", 0),
            "durations": durations}


def main(argv=None):
    p = argparse.ArgumentParser(description="dgvit_tpu evaluation")
    p.add_argument("--actor", required=True,
                   help="actor params npz (save_params_npz output)")
    p.add_argument("--config", default=None)
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--out", default="results")
    p.add_argument("--world", default="rrc",
                   help="kinematic world preset (rrc | hospital) — "
                        "'hospital' is the unseen-layout generalization "
                        "eval (reference README.md:43-51, hospital.world)")
    args = p.parse_args(argv)

    cfg = Config.from_yaml(args.config) if args.config else Config()
    env = KinematicNavEnv(seed=cfg.train.seed,
                          image_hw=tuple(cfg.model.image_size),
                          world=args.world)
    actor = build_actor(cfg)
    template = actor.init(jax.random.PRNGKey(0),
                          np.zeros((1,) + tuple(cfg.model.image_size)),
                          np.zeros((1, cfg.sac.pstate_dim)))["params"]
    params = ckpt.load_params_npz(args.actor, template)
    out = run_eval(cfg, env, params, args.episodes, args.out,
                   os.path.basename(args.actor))
    print(f"success rate: {out['success_rate'] * 100:.1f}% "
          f"({out['successes']} goals), collisions: {out['collisions']}")


if __name__ == "__main__":
    main()
