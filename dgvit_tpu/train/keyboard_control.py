"""Keyboard teleop — keyboard_control.py:24-143 rebuilt without ROS.

Raw-terminal key loop producing [linear, angular] commands with the
reference's velocity clamps (0.5 m/s, 0.6 rad/s; keyboard_control.py:35-36,
83-90) and the engage('1')/disengage('2') gate for the human-intervention
workflow."""

from __future__ import annotations

import sys
from typing import List, Optional

LIN_MAX = 0.5
ANG_MAX = 0.6
LIN_STEP = 0.05
ANG_STEP = 0.1

KEYMAP = {
    "w": (LIN_STEP, 0.0), "s": (-LIN_STEP, 0.0),
    "a": (0.0, ANG_STEP), "d": (0.0, -ANG_STEP),
    "x": None,  # stop
}


class KeyboardTeleop:
    def __init__(self):
        self.linear = 0.0
        self.angular = 0.0
        self.engaged = False
        self._fd = None

    def update(self, key: str) -> List[float]:
        if key == "1":
            self.engaged = True
        elif key == "2":
            self.engaged = False
        elif key == "x":
            self.linear = self.angular = 0.0
        elif key in KEYMAP and KEYMAP[key] is not None:
            dl, da = KEYMAP[key]
            self.linear = max(-LIN_MAX, min(LIN_MAX, self.linear + dl))
            self.angular = max(-ANG_MAX, min(ANG_MAX, self.angular + da))
        return [self.linear, self.angular]

    # -- raw tty input (optional; requires a terminal) -----------------------
    def _getch(self) -> Optional[str]:
        import select
        import termios
        import tty

        fd = sys.stdin.fileno()
        old = termios.tcgetattr(fd)
        try:
            tty.setraw(fd)
            r, _, _ = select.select([sys.stdin], [], [], 0.1)
            return sys.stdin.read(1) if r else None
        finally:
            termios.tcsetattr(fd, termios.TCSADRAIN, old)

    def read_action(self) -> List[float]:
        key = self._getch()
        if key == "\x03":  # Ctrl-C
            raise KeyboardInterrupt
        if key:
            self.update(key)
        return [self.linear, self.angular]


def teleop_loop(env, teleop: KeyboardTeleop, max_steps: int = 10 ** 9,
                key_source=None, log=print) -> int:
    """Drive `env` from the keyboard — the reference's control_loop
    (keyboard_control.py:62-117) with the env's step() standing in for the
    /scout/cmd_vel publisher. `key_source() -> Optional[str]` is injectable
    for tests; the default reads the raw tty. Returns steps driven."""
    get_key = key_source or teleop._getch
    env.reset()
    steps = t = 0
    try:
        while steps < max_steps:
            key = get_key()
            if key == "\x03" or key == "q":
                break
            if key:
                teleop.update(key)
            r = env.step([teleop.linear, teleop.angular], t)
            steps += 1
            t += 1
            state = "ENGAGED" if teleop.engaged else "idle"
            log(f"[{state}] lin {teleop.linear:+.2f} ang "
                f"{teleop.angular:+.2f} reward {r.reward:+7.1f} "
                f"dist {float(r.to_goal[0]):.3f}")
            if r.done:
                env.reset()
                t = 0
    except KeyboardInterrupt:
        pass
    return steps


def main(argv=None):
    """Console entry — mirrors the reference's keyboard_control.py script
    (setup.py:24-32): a raw-terminal teleop loop with the 0.5/0.6 clamps and
    the engage('1')/disengage('2') intervention gate. Drives the kinematic
    env by default; `--env ros2` drives a live robot through the ROS2
    adapter (requires rclpy)."""
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--env", choices=("kinematic", "ros2"), default="kinematic")
    p.add_argument("--world", default="rrc")
    p.add_argument("--max-steps", type=int, default=10 ** 9)
    args = p.parse_args(argv)

    if args.env == "ros2":
        from dgvit_tpu.config import Config
        from dgvit_tpu.envs.ros2_adapter import GazeboRos2Env
        env = GazeboRos2Env(Config())
    else:
        from dgvit_tpu.envs import KinematicNavEnv
        env = KinematicNavEnv(seed=0, world=args.world)

    print("teleop: w/s linear  a/d angular  x stop  1 engage  2 disengage  "
          "q quit")
    teleop = KeyboardTeleop()
    teleop_loop(env, teleop, max_steps=args.max_steps,
                log=lambda s: print("\r" + s + "  ", end="", flush=True))
    print()


if __name__ == "__main__":
    main()
