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
