"""Env protocol — the reset/step contract of the reference GazeboEnv
(env_lab.py:190,303) as a typed interface.

reset() -> (state, xR, yR, toGoal)
step(action, t) -> (state, reward, done, toGoal, target)

state: (H, W, 1) float in [0, 1] (resized, scaled observation)
toGoal: np.array([dist_norm, heading_norm, act0, act1]) (env_lab.py:298)

The device graph never sees an Env directly: drivers move states across the
host boundary (or via io_callback for fully on-device loops).
"""

from __future__ import annotations

from typing import NamedTuple, Protocol, Sequence, Tuple

import numpy as np


class ResetResult(NamedTuple):
    state: np.ndarray
    xR: float
    yR: float
    to_goal: np.ndarray


class StepResult(NamedTuple):
    state: np.ndarray
    reward: float
    done: bool
    to_goal: np.ndarray
    target: bool


class Env(Protocol):
    def reset(self) -> ResetResult: ...

    def step(self, action: Sequence[float], t: int) -> StepResult: ...

    def stop(self) -> None: ...
