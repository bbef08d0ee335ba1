"""Observability: metrics logging, reward curves, profiler hooks.

Replaces the reference's scattered instrumentation (SURVEY.md §5): matplotlib
reward PNGs (main.py:118-128), npy reward dumps (main.py:353,406), append-only
txt summaries (main.py:412-417, testing.py:146-150), plus structured JSONL and
jax.profiler traces the reference lacked."""

from __future__ import annotations

import json
import os
import time
from collections import deque
from pathlib import Path
from typing import Dict, List, Optional


class RewardCurve:
    """Rolling-20 mean like main.py:341-342, with npy + optional png dumps."""

    def __init__(self, window: int = 20):
        self.window = window
        self.rewards: List[float] = []
        self.means: List[float] = []

    def append(self, episode_reward: float) -> float:
        self.rewards.append(float(episode_reward))
        mean = float(sum(self.rewards[-self.window:]) /
                     min(len(self.rewards), self.window))
        self.means.append(mean)
        return mean

    @property
    def max_mean(self) -> float:
        return max(self.means) if self.means else float("-inf")

    def save_npy(self, path: str):
        import numpy as np

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.save(path, np.asarray(self.means), allow_pickle=True,
                fix_imports=True)

    def save_png(self, path: str, title: str = ""):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            return
        import numpy as np

        fig = plt.figure()
        plt.title(title)
        plt.xlabel("Episode")
        plt.ylabel("Overall Reward")
        plt.plot(np.arange(len(self.rewards)), self.rewards)
        plt.plot(np.arange(len(self.means)), self.means)
        plt.tight_layout()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        plt.savefig(path)
        plt.close(fig)


class MetricsLogger:
    """Structured JSONL metrics + the reference's append-only txt summaries."""

    def __init__(self, directory: str, run_name: str = "run"):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = self.dir / f"{run_name}.jsonl"
        self.t0 = time.time()

    def log(self, step: int, **metrics):
        rec = {"step": step, "wall_s": round(time.time() - self.t0, 3)}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        with open(self.jsonl, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def append_txt(self, filename: str, text: str):
        """main.py:412-417 / testing.py:146-150 style run summaries."""
        with open(self.dir / filename, "a") as f:
            f.write(text)


class Profiler:
    """jax.profiler trace wrapper — the TPU answer to the reference's absent
    tracing (SURVEY.md §5 'Tracing/profiling')."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False
