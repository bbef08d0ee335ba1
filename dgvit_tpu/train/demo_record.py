"""Demonstration recorder — demonstration.py:122-291 rebuilt.

Collects human-teleop (or scripted-policy) transitions per episode and saves
npz files with the reference's exact key layout obs/act/goal/reward/next_obs/
next_goal/done (demonstration.py:237-245), including its filtering quirks:
zero-action frames skipped (:269-270), (H,W,1)->(H,W) squeeze (:271-274),
shape-mismatch guard (:279-283)."""

from __future__ import annotations

import argparse
import os
from typing import Callable, Optional, Sequence

import numpy as np

from dgvit_tpu.envs import Env, KinematicNavEnv


def record_episodes(env: Env, action_source: Callable[[np.ndarray, np.ndarray, int], Sequence[float]],
                    out_dir: str, env_name: str = "RRC", driver: str = "jax",
                    episodes: int = 5, max_steps: int = 800,
                    start_index: int = 0,
                    action_to_env: Optional[Callable] = None) -> list:
    """action_source(obs, goal, t) -> [linear, angular] (the teleop mirror of
    Telekey_subscriber, demonstration.py:33-46).

    `action_to_env` maps the RECORDED action to the env command. The reference
    records raw teleop commands (demonstration.py:263) while its RL driver
    stores pre-scaling policy actions (main.py:385) and deploys with
    a_in=[(a0+1)*L_SCALE, a1*A_SCALE] — two incompatible action conventions in
    the same Data/ corpus. Pass the driver mapping here to record
    deployment-consistent (normalized) actions."""
    dest = os.path.join(out_dir, env_name, driver)
    os.makedirs(dest, exist_ok=True)
    written = []
    for ep in range(episodes):
        obs_l, act_l, goal_l, rew_l, nobs_l, ngoal_l, done_l = ([] for _ in range(7))
        r = env.reset()
        obs, goal = r.state, r.to_goal
        for t in range(max_steps):
            action = np.asarray(action_source(obs, goal, t), np.float32)
            cmd = action if action_to_env is None else \
                np.asarray(action_to_env(action), np.float32)
            s = env.step(cmd, t)
            # skip zero actions (demonstration.py:269-270)
            if not np.allclose(action, 0.0):
                o = obs.squeeze(-1) if obs.ndim == 3 and obs.shape[-1] == 1 else obs
                no = (s.state.squeeze(-1) if s.state.ndim == 3 and
                      s.state.shape[-1] == 1 else s.state)
                if o.shape == no.shape:  # mismatch guard (:279-283)
                    obs_l.append(o)
                    act_l.append(action)
                    goal_l.append(goal)
                    rew_l.append(s.reward)
                    nobs_l.append(no)
                    ngoal_l.append(s.to_goal)
                    done_l.append(s.done)
            obs, goal = s.state, s.to_goal
            if s.done:
                break
        if not obs_l:
            continue
        path = os.path.join(dest, f"demo_{env_name}_{start_index + ep}.npz")
        np.savez_compressed(
            path,
            obs=np.stack(obs_l).astype(np.float32),
            act=np.stack(act_l).astype(np.float32),
            goal=np.stack(goal_l).astype(np.float32),
            reward=np.asarray(rew_l, np.float32),
            next_obs=np.stack(nobs_l).astype(np.float32),
            next_goal=np.stack(ngoal_l).astype(np.float32),
            done=np.asarray(done_l, bool),
        )
        written.append(path)
    return written


def scripted_pilot(obs, goal, t):
    """A simple goal-seeking pilot for synthetic demo generation: steer
    toward the goal bearing, slow when misaligned."""
    heading = float(goal[1])  # normalized beta2
    w = np.clip(2.0 * heading, -0.6, 0.6)
    v = float(np.clip(0.5 * (1.0 - abs(heading)), 0.05, 0.5))
    return [v, w]


def main(argv=None):
    p = argparse.ArgumentParser(description="dgvit_tpu demonstration recorder")
    p.add_argument("--out", default="Data")
    p.add_argument("--env-name", default="RRC")
    p.add_argument("--driver", default="jax")
    p.add_argument("--episodes", type=int, default=5)
    p.add_argument("--teleop", action="store_true",
                   help="read actions from the keyboard (needs a TTY)")
    args = p.parse_args(argv)

    env = KinematicNavEnv()
    if args.teleop:
        from dgvit_tpu.train.keyboard_control import KeyboardTeleop
        tele = KeyboardTeleop()
        source = lambda obs, goal, t: tele.read_action()
    else:
        source = scripted_pilot
    paths = record_episodes(env, source, args.out, args.env_name,
                            args.driver, args.episodes)
    print(f"wrote {len(paths)} episodes -> {paths}")


if __name__ == "__main__":
    main()
