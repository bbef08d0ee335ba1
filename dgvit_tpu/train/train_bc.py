"""Offline imitation-learning driver — Imitation_learning.py __main__
(:721-845) as a CLI: glob demos, fit BC, save lowest-val actor + loss curve."""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from dgvit_tpu.agents.bc import BCTrainer, il_policy
from dgvit_tpu.core import checkpoint as ckpt


def load_bc_dataset(pattern: str):
    try:
        from natsort import natsorted
        files = natsorted(glob.glob(pattern))
    except ImportError:
        files = sorted(glob.glob(pattern))
    if not files:
        raise FileNotFoundError(pattern)
    obs, act, goal = [], [], []
    for f in files:
        d = np.load(f)
        obs.append(d["obs"])
        act.append(d["act"])
        goal.append(d["goal"])
    return (np.concatenate(obs), np.concatenate(act), np.concatenate(goal))


def main(argv=None):
    p = argparse.ArgumentParser(description="dgvit_tpu imitation learning")
    p.add_argument("--data-glob", required=True)
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--block", type=int, default=4)
    p.add_argument("--head", type=int, default=4)
    p.add_argument("--l-f-size", type=int, default=32)
    p.add_argument("--out", default="pytorch_models")
    p.add_argument("--name", default="gtrl")
    args = p.parse_args(argv)

    obs, act, goal = load_bc_dataset(args.data_glob)
    print(f"dataset: obs={obs.shape} act={act.shape} goal={goal.shape}")

    trainer = BCTrainer(
        model=il_policy(args.block, args.head, args.l_f_size),
        lr=args.lr, batch_size=args.batch_size, seed=args.seed)
    best, hist = trainer.fit(obs, goal, act, epochs=args.epochs, verbose=True)

    os.makedirs(args.out, exist_ok=True)
    path = ckpt.save_params_npz(args.out, args.name, best)
    np.save(os.path.join(args.out, f"{args.name}_loss_curves.npy"),
            {"train": hist["train"], "val": hist["val"]}, allow_pickle=True)
    print(f"best val loss {min(hist['val']):.4f} -> {path}")


if __name__ == "__main__":
    main()
