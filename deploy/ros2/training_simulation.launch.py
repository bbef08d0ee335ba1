#!/usr/bin/env python3
"""Live-Gazebo SAC training — the reference's training_simulation.launch.py
(:22-52) with `dgvit-train --env ros2` as the learner process. Headless
gzserver (gzclient commented out in the reference too), one robot."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import (driver_process, gzserver, robot_state_publisher,  # noqa: E402
                     sim_asset, spawn_entity)


def generate_launch_description():
    from launch import LaunchDescription

    world = sim_asset("world", "final_world_presidence.world")
    urdf = sim_asset("urdf", "robot_w.urdf")
    return LaunchDescription([
        gzserver(world),
        robot_state_publisher(urdf),
        spawn_entity("scout"),
        driver_process(["dgvit_tpu.train.train_rl", "--env", "ros2"]),
    ])
