#!/usr/bin/env python3
"""Live-Gazebo evaluation — the reference's testing_simulation.launch.py
with `dgvit-test` as the protocol process. Set DGVIT_ACTOR to the trained
`<name>_actor.npz` path."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import (driver_process, gzserver, robot_state_publisher,  # noqa: E402
                     sim_asset, spawn_entity)


def generate_launch_description():
    from launch import LaunchDescription

    world = sim_asset("world", "final_world_presidence.world")
    urdf = sim_asset("urdf", "robot_w.urdf")
    actor = os.environ.get("DGVIT_ACTOR", "results/models/model_actor.npz")
    return LaunchDescription([
        gzserver(world),
        robot_state_publisher(urdf),
        spawn_entity("scout"),
        driver_process(["dgvit_tpu.train.evaluate", "--actor", actor]),
    ])
