"""Sensor-fault robustness study on a FULL-geometry flagship actor.

The reference's perturbation suite (env_lab.py:33-90: Gaussian noise,
pixel/superpixel occlusion, greying) is its headline robustness story;
round 3 ran the in-graph version only on the tiny demo geometry (flat
curves — synthetic frames are row-redundant at dim 32). This tool runs the
full grid on the 128x160 flagship checkpoints, per world, through the
dynamic-knob sweep path of run_eval_vec: ONE compile per (actor, world),
one cheap dispatch per sweep point, noise realizations paired across
points.

Run on a quiet chip:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/robustness_sweep.py \
        --actor artifacts/r3/gen_fused/gw10_winner_actor.npz \
        --worlds rrc hospital --episodes 100 --out results/robustness
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dgvit_tpu.utils.compcache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from dgvit_tpu.config import Config  # noqa: E402
from dgvit_tpu.core import checkpoint as ckpt  # noqa: E402
from dgvit_tpu.models.policies import build_actor  # noqa: E402
from dgvit_tpu.train.evaluate import run_eval_vec  # noqa: E402

# sigma=50/255 is the reference's own training-time noise (env_lab.py:78-90);
# blur = blend toward the 5x5-blurred frame; patch_occlusion = one random
# contiguous rectangle of that area fraction (superpixel-occlusion analog)
GRID = ([{}] +
        [{"obs_noise": s} for s in (0.1, 50 / 255, 0.3, 0.5)] +
        [{"blur": b} for b in (0.5, 1.0)] +
        [{"occlusion": f} for f in (0.25, 0.5, 0.75)] +
        [{"patch_occlusion": f} for f in (0.1, 0.25, 0.5)] +
        [{"greying": g} for g in (0.3, 0.6, 0.9)])
KNOBS = ("obs_noise", "blur", "occlusion", "patch_occlusion", "greying")


def load_actor(cfg: Config, path: str):
    actor = build_actor(cfg)
    ih, iw = cfg.model.image_size
    if cfg.model.patch_mode == "channels":
        obs0 = np.zeros((1, cfg.env.frame_stack, ih, iw))
    else:
        obs0 = np.zeros((1, ih, iw))
    template = actor.init(jax.random.PRNGKey(0), obs0,
                          np.zeros((1, cfg.sac.pstate_dim)))["params"]
    return ckpt.load_params_npz(path, template)


def load_checkpoint_actor(cfg: Config, path: str):
    """Actor params out of a full train-state checkpoint (a step_N dir or a
    checkpoints/ dir, newest step) — same contract as `dgvit-test
    --checkpoint`."""
    import os

    from dgvit_tpu.agents.sac import SACAgent

    if not os.path.basename(os.path.normpath(path)).startswith("step_"):
        newest = ckpt.latest_checkpoint(path)
        assert newest is not None, f"no step_* checkpoints under {path}"
        path = newest
    state = ckpt.restore_train_state(path, SACAgent(cfg).init_state(
        cfg.train.seed))
    return state.actor_params, os.path.basename(path)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--actor", default=None)
    p.add_argument("--checkpoint", default=None,
                   help="full train-state checkpoint (step_N or checkpoints/"
                        " dir) instead of an actor npz")
    p.add_argument("--worlds", nargs="+", default=["rrc", "hospital"])
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--out", default="results/robustness")
    p.add_argument("--config", default=None)
    p.add_argument("--export-actor", default=None,
                   help="also save the loaded actor params to this npz "
                        "(durable artifact for checkpoint-loaded sweeps)")
    args = p.parse_args(argv)
    if bool(args.actor) == bool(args.checkpoint):
        p.error("exactly one of --actor / --checkpoint is required")

    cfg = Config.from_yaml(args.config) if args.config else Config()
    cfg.model.compute_dtype = "bfloat16"
    if args.checkpoint:
        params, name = load_checkpoint_actor(cfg, args.checkpoint)
    else:
        params, name = load_actor(cfg, args.actor), Path(args.actor).stem
    if args.export_actor:
        d = Path(args.export_actor)
        ckpt.save_params_npz(str(d.parent), d.name.removesuffix(".npz")
                             .removesuffix("_actor"), params)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    rows = []
    with open(out_dir / "sweep.jsonl", "w") as fh:
        for world in args.worlds:
            reports = run_eval_vec(cfg, params, args.episodes, world,
                                   str(out_dir), name, sweep=GRID)
            for rep in reports:
                row = {"actor": name, "world": world,
                       "episodes": args.episodes,
                       **{k: rep[k] for k in KNOBS},
                       "success_rate": rep["success_rate"],
                       "successes": rep["successes"],
                       "collisions": rep["collisions"]}
                rows.append(row)
                fh.write(json.dumps(row) + "\n")
                fh.flush()
                print(json.dumps(row), flush=True)

    # markdown summary, one table per world
    with open(out_dir / "sweep.md", "w") as fh:
        fh.write(f"# Robustness sweep — {name}, {args.episodes} eps/point\n")
        for world in args.worlds:
            fh.write(f"\n## {world}\n\n| fault | success | collisions |\n"
                     "|---|---|---|\n")
            for row in rows:
                if row["world"] != world:
                    continue
                fault = ", ".join(f"{k}={row[k]:.3g}" for k in KNOBS
                                  if row[k]) or "clean"
                fh.write(f"| {fault} | {row['success_rate'] * 100:.0f}% "
                         f"| {row['collisions']} |\n")
    print(f"wrote {out_dir}/sweep.jsonl and sweep.md", flush=True)


if __name__ == "__main__":
    main()
