"""End-to-end framework demo: record demonstrations with a scripted pilot in
the kinematic env, behavior-clone the LIVE GoT policy on them (the
attention_imitating.py workflow: BC directly on the DRL actor), and evaluate
goal-reaching success — all Gazebo-free.

Run: PYTHONPATH=. python examples/bc_kinematic_demo.py [--episodes 40]
"""

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from dgvit_tpu.agents.bc import BCTrainer
from dgvit_tpu.config import Config
from dgvit_tpu.envs import KinematicNavEnv
from dgvit_tpu.models.policies import GoTPolicy
from dgvit_tpu.train.demo_record import record_episodes, scripted_pilot
from dgvit_tpu.train.evaluate import run_eval
from dgvit_tpu.train.train_bc import load_bc_dataset


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=40)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--eval-episodes", type=int, default=20)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    out = Path(args.out or tempfile.mkdtemp(prefix="bc_demo_"))
    print(f"workdir: {out}")

    # 1. record scripted-pilot demonstrations in DEPLOYMENT action units:
    # the pilot emits normalized a in [-1,1]^2, the env gets the driver
    # mapping a_in = [(a0+1)*L_SCALE, a1*A_SCALE] (main.py:320) — so BC
    # targets and eval-time actions share one convention
    cfg = Config()
    l_s, a_s = cfg.env.linear_cmd_scale, cfg.env.angular_cmd_scale

    def pilot_norm(obs, goal, t):
        v, w = scripted_pilot(obs, goal, t)
        return [np.clip(v / l_s - 1.0, -1, 1), np.clip(w / a_s, -1, 1)]

    env = KinematicNavEnv(seed=0)
    paths = record_episodes(
        env, pilot_norm, str(out / "Data"), episodes=args.episodes,
        max_steps=200,
        action_to_env=lambda a: [(a[0] + 1.0) * l_s, a[1] * a_s])
    obs, act, goal = load_bc_dataset(str(out / "Data" / "RRC" / "jax" / "*.npz"))
    print(f"recorded {len(paths)} episodes, {obs.shape[0]} transitions")

    # 2. behavior-clone the live GoT policy (flagship config)
    model = GoTPolicy(block=cfg.model.block, head=cfg.model.head,
                      l_f_size=cfg.model.latent_size)
    trainer = BCTrainer(model=model, batch_size=32, seed=1)
    best, hist = trainer.fit(obs, goal, act, epochs=args.epochs, to_chw=False)
    print(f"BC: train {hist['train'][0]:.4f} -> {hist['train'][-1]:.4f}, "
          f"best val {min(hist['val']):.4f}")

    # 3. evaluate the cloned policy on unseen start/goal pairs
    eval_env = KinematicNavEnv(seed=123)
    res = run_eval(cfg, eval_env, best, max_episodes=args.eval_episodes,
                   out_dir=str(out))

    # scripted-pilot reference on the same episodes
    ref_env = KinematicNavEnv(seed=123)
    wins = 0
    for _ in range(args.eval_episodes):
        r = ref_env.reset()
        g = r.to_goal
        for t in range(cfg.env.max_steps):
            s = ref_env.step(scripted_pilot(None, g, t), t)
            g = s.to_goal
            if s.done:
                wins += int(s.target)
                break
    print(f"cloned policy success: {res['success_rate'] * 100:.0f}% "
          f"({res['successes']}/{args.eval_episodes}); "
          f"scripted pilot: {wins * 100 // args.eval_episodes}% "
          f"({wins}/{args.eval_episodes})")
    return res


if __name__ == "__main__":
    main()
