"""Recorded-trajectory replay env over the reference's Data/ npz corpus
(component #23: obs (N,128,160,4), act (N,2), goal (N,4), reward, next_obs,
next_goal, done — demonstration.py:237-245).

Implements the Env protocol by stepping through logged transitions; the
caller's action is recorded but does not influence the trajectory. This is
the Gazebo-free backbone for CI integration tests, benchmarks, and the
action-parity fidelity gate (BASELINE.md)."""

from __future__ import annotations

import glob
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from dgvit_tpu.envs.base import Env, ResetResult, StepResult


def load_demo_npz(paths: Sequence[str]) -> dict:
    """Concatenate demo npz files like main.py:232-256 (natsorted upstream)."""
    fields = ("obs", "act", "goal", "reward", "next_obs", "next_goal", "done")
    out = {k: [] for k in fields}
    for p in paths:
        d = np.load(p)
        n = d["obs"].shape[0]
        for k in fields:
            a = np.asarray(d[k])
            # some recordings have truncated reward arrays; resize like the
            # consumer would broadcast (guarded, reference shape quirk)
            if a.shape[0] != n:
                a = np.resize(a, (n,) + a.shape[1:])
            out[k].append(a)
    return {k: np.concatenate(v, axis=0) for k, v in out.items()}


class ReplayEnv:
    """Env over logged transitions. Episodes are delimited by `done`."""

    def __init__(self, data: Optional[dict] = None,
                 glob_pattern: Optional[str] = None,
                 channel: Optional[int] = 0):
        if data is None:
            assert glob_pattern is not None
            files = sorted(glob.glob(glob_pattern))
            if not files:
                raise FileNotFoundError(glob_pattern)
            data = load_demo_npz(files)
        self.data = data
        self.n = data["obs"].shape[0]
        self.channel = channel
        self._t = 0
        self.divergence: List[float] = []  # |taken - logged| per step
        self.collision = 0  # reference env attribute used by drivers

    def _obs(self, i: int, key: str) -> np.ndarray:
        o = self.data[key][i]
        if o.ndim == 3 and self.channel is not None:
            o = o[..., self.channel]
        if o.ndim == 2:
            o = o[..., None]
        return o.astype(np.float32)

    def reset(self) -> ResetResult:
        if self._t >= self.n:
            self._t = 0
        state = self._obs(self._t, "obs")
        goal = self.data["goal"][self._t].astype(np.float32)
        return ResetResult(state=state, xR=0.0, yR=0.0, to_goal=goal)

    def step(self, action, t: int) -> StepResult:
        i = min(self._t, self.n - 1)
        logged = self.data["act"][i]
        self.divergence.append(float(np.abs(np.asarray(action) - logged).max()))
        state = self._obs(i, "next_obs")
        goal = self.data["next_goal"][i].astype(np.float32)
        rew_arr = self.data["reward"]
        reward = float(rew_arr[i]) if i < len(rew_arr) else 0.0
        done = bool(self.data["done"][i])
        self._t += 1
        target = done and reward > 0
        return StepResult(state=state, reward=reward, done=done,
                          to_goal=goal, target=target)

    def stop(self) -> None:
        pass
