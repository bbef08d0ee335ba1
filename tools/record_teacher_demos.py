"""Record a TRAINED policy's demonstrations on a procedural world ensemble.

The reference ships a dead SAC_teacher loader (main.py:27-53, call sites
commented out); agents/teacher.py gave it production consumers. This tool
closes the teacher-student loop (VERDICT r4 #7): drive the frozen teacher
(e.g. the gw10 generalist) through every member of a rand<K> ensemble and
keep only the SUCCESSFUL episodes as a matched demo corpus — expert
guidance whose worlds match the student's training distribution, unlike
the RRC-recorded corpus that made guided-on-rand8 a mismatch negative
(74% RRC / 22% hospital, BENCH.md round 4).

Demos land in the reference npz layout (obs/act/goal/reward/next_obs/
next_goal/done — demonstration.py:237-245) with deployment-consistent
normalized actions (main.py:385 convention), directly consumable by
--expert-glob / --demos.

Run (CPU fine, ~1 min/100 eps; chip if attached):
    PYTHONPATH=. python tools/record_teacher_demos.py \
        --actor artifacts/r3/gen_fused/gw10_winner_actor.npz \
        --world rand8 --episodes 200 --out results/distill/demos
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from dgvit_tpu.agents.teacher import SACTeacher
from dgvit_tpu.config import Config
from dgvit_tpu.envs import KinematicNavEnv
from dgvit_tpu.envs.worlds import get_world, random_ensemble
from dgvit_tpu.train.demo_record import record_episodes


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--actor", required=True,
                   help="<name>_actor.npz teacher params (save_params_npz)")
    p.add_argument("--world", default="rand8",
                   help="world preset or rand/randm/randh<K> ensemble spec; "
                        "episodes split evenly across ensemble members")
    p.add_argument("--world-seed", type=int, default=0,
                   help="ensemble stream seed (random_ensemble)")
    p.add_argument("--episodes", type=int, default=200)
    p.add_argument("--max-steps", type=int, default=200)
    p.add_argument("--out", default="results/distill/demos")
    p.add_argument("--keep-failures", action="store_true",
                   help="keep unsuccessful episodes too (default: only "
                        "episodes that reached the goal survive — failed "
                        "rollouts are not expert behavior)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="pin the JAX backend (the machine's sitecustomize "
                        "eagerly locks the tunneled TPU in; JAX_PLATFORMS "
                        "alone is ignored). Single-frame teacher acting is "
                        "dispatch-RTT-bound on the tunnel — use cpu while "
                        "the chip trains")
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    cfg = Config()
    d, f = os.path.split(args.actor)
    if not f.endswith("_actor.npz"):
        p.error(f"--actor must be a <name>_actor.npz file, got {f!r}")
    teacher = SACTeacher(cfg, f[: -len("_actor.npz")], d or ".")
    source, to_env = teacher.as_pilot()

    try:
        members = list(random_ensemble(args.world, seed=args.world_seed))
    except ValueError:
        members = [get_world(args.world)]
    per = max(1, args.episodes // len(members))

    written = []
    for i, preset in enumerate(members):
        env = KinematicNavEnv(seed=1000 + i, world=preset,
                              image_hw=tuple(cfg.model.image_size))
        written += record_episodes(
            env, source, args.out, env_name=args.world, driver="teacher",
            episodes=per, max_steps=args.max_steps, start_index=i * per,
            action_to_env=to_env)

    kept = dropped = 0
    for path in written:
        with np.load(path) as z:
            # +200 only fires at the goal (env_lab.py:170-181 scale)
            success = bool(z["reward"].max() >= 100.0)
        if success or args.keep_failures:
            kept += 1
        else:
            os.remove(path)
            dropped += 1
    print(f"teacher demos: kept {kept} / dropped {dropped} "
          f"(of {len(written)} recorded over {len(members)} worlds) "
          f"-> {args.out}", flush=True)
    if not kept:
        raise SystemExit("no successful teacher episodes — corpus is empty")


if __name__ == "__main__":
    main()
