"""Regenerate the generalization-experiment demo corpus.

results/ is wiped between sessions; the scripted-pilot recorder is
deterministic (env seed 0), so the corpus the round-3 winner recipe trained
on (results/gen_base/demos, 100 episodes) can be reproduced bit-for-bit.
This mirrors stage 1 of examples/generalization_eval.py exactly —
deployment-consistent normalized actions (main.py:385 convention).

Run: PYTHONPATH=. python tools/record_gen_demos.py --out results/gen_base/demos
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from dgvit_tpu.config import Config
from dgvit_tpu.envs import KinematicNavEnv
from dgvit_tpu.train.demo_record import record_episodes, scripted_pilot


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="results/gen_base/demos")
    p.add_argument("--episodes", type=int, default=100)
    args = p.parse_args(argv)

    cfg = Config()
    l_s, a_s = cfg.env.linear_cmd_scale, cfg.env.angular_cmd_scale

    def pilot_norm(obs, goal, t):
        v, w = scripted_pilot(obs, goal, t)
        return [np.clip(v / l_s - 1.0, -1, 1), np.clip(w / a_s, -1, 1)]

    env = KinematicNavEnv(seed=0)
    paths = record_episodes(env, pilot_norm, args.out,
                            episodes=args.episodes, max_steps=200,
                            action_to_env=lambda a: [(a[0] + 1) * l_s,
                                                     a[1] * a_s])
    print(f"recorded {len(paths)} demo episodes -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
