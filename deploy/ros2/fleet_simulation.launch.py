#!/usr/bin/env python3
"""Multi-robot fleet over one live Gazebo world — no reference analogue
(the reference is strictly single-robot). Spawns DGVIT_FLEET namespaced
robots (`scout<i>` under `/robot<i>/...`, the serve.make_ros2_fleet
contract: free-running physics, per-robot entities) and runs either the
fleet evaluation protocol (`dgvit-test --fleet N --fleet-env ros2`,
DGVIT_FLEET_MODE=test, default) or fleet-collection training
(`dgvit-train-fleet --env ros2`, DGVIT_FLEET_MODE=train)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import (driver_process, gzserver, robot_state_publisher,  # noqa: E402
                     sim_asset, spawn_entity)


def generate_launch_description():
    from launch import LaunchDescription

    n = int(os.environ.get("DGVIT_FLEET", "2"))
    world = sim_asset("world", "final_world_presidence.world")
    urdf = sim_asset("urdf", "robot_w.urdf")
    actions = [gzserver(world)]
    for i in range(n):
        ns = f"/robot{i}"
        actions.append(robot_state_publisher(urdf, namespace=ns))
        # spread spawn rows so robots don't stack (reference single spawn
        # is (0, 2), robot_state_publisher.launch.py:43-46)
        actions.append(spawn_entity(f"scout{i}", namespace=ns,
                                    x=float(i), y=2.0))
    if os.environ.get("DGVIT_FLEET_MODE", "test") == "train":
        actions.append(driver_process(
            ["dgvit_tpu.train.train_fleet", "--env", "ros2",
             "--fleet", str(n)]))
    else:
        actor = os.environ.get("DGVIT_ACTOR",
                               "results/models/model_actor.npz")
        actions.append(driver_process(
            ["dgvit_tpu.train.evaluate", "--actor", actor,
             "--fleet", str(n), "--fleet-env", "ros2"]))
    return LaunchDescription(actions)
