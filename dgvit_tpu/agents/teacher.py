"""Frozen trained actor as an action source — the reference's SAC_teacher
(main.py:27-53: a bare GoTPolicy + load_actor + deterministic-ish
choose_action; its call sites are commented out at main.py:271,403, making
it dead code there).

Here it gets the production consumers the reference never wired up:
  * `choose_action(obs, goal)` — single or batched deterministic actions in
    policy units (the serving contract), usable anywhere an act-fn goes
    (FleetRunner, BatchingActorServer, run_eval act paths).
  * `as_pilot(cfg)` — a `(obs, goal, t) -> [policy action]` source plus the
    deployment command map for train/demo_record.record_episodes: record a
    TRAINED policy's demonstrations instead of the scripted pilot, i.e.
    teacher-generated demo corpora for BC / expert-guided SAC (the
    teacher-student workflow SAC_teacher was evidently written for).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dgvit_tpu.core import checkpoint as ckpt
from dgvit_tpu.models import build_actor
from dgvit_tpu.serve.export import make_action_fn


class SACTeacher:
    """Load `<directory>/<filename>_actor.npz` (save_params_npz layout — the
    analogue of the reference's torch .pth state_dict) and act with the
    deterministic deployment policy."""

    def __init__(self, cfg, filename: str, directory: str = ".",
                 dtype: Optional[str] = None):
        self.cfg = cfg
        actor = build_actor(cfg)
        template = actor.init(jax.random.PRNGKey(0),
                              jnp.zeros((1,) + tuple(cfg.model.image_size)),
                              jnp.zeros((1, cfg.sac.pstate_dim)))["params"]
        import os
        self.params = ckpt.load_params_npz(
            os.path.join(directory, f"{filename}_actor.npz"), template)
        self._act = jax.jit(make_action_fn(cfg, self.params))

    def choose_action(self, obs, goal) -> np.ndarray:
        """Deterministic policy-unit action; obs (H, W) or (B, H, W)."""
        obs = jnp.asarray(obs, jnp.float32)
        goal = jnp.asarray(goal, jnp.float32)
        single = goal.ndim == 1
        if single:
            obs, goal = obs[None], goal[None]
        a = np.asarray(self._act(obs, goal[:, :2]))
        return a[0] if single else a

    def as_pilot(self):
        """(action_source, action_to_env) pair for record_episodes: the
        teacher records deployment-consistent policy-unit actions while the
        env receives command units (main.py:320,370 map)."""
        e = self.cfg.env

        def source(obs, goal, t):
            o = obs[..., 0] if obs.ndim == 3 and obs.shape[-1] == 1 else obs
            a = self.choose_action(o, np.asarray(goal)[:2])
            return np.clip(a, -e.max_action, e.max_action)

        def to_env(a):
            return [(a[0] + 1.0) * e.linear_cmd_scale,
                    a[1] * e.angular_cmd_scale]

        return source, to_env
