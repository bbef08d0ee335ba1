"""deploy/ros2 launch descriptions, exercised over a fake launch stack
(no ROS2 needed): the structural contract of the reference's launch
choreography (training_simulation.launch.py:22-52,
robot_state_publisher.launch.py:33-58) plus the new fleet launch."""

import importlib.util
import os
import sys
import types
from pathlib import Path

import pytest

DEPLOY = Path(__file__).resolve().parent.parent / "deploy" / "ros2"


class FakeLaunchDescription:
    def __init__(self, actions):
        self.actions = list(actions)


class FakeInclude:
    def __init__(self, source, launch_arguments=None):
        self.source = source
        self.launch_arguments = dict(launch_arguments or {})


class FakeExecuteProcess:
    def __init__(self, cmd, output=None):
        self.cmd = list(cmd)


class FakeNode:
    def __init__(self, package=None, executable=None, name=None,
                 namespace="", output=None, parameters=None, arguments=None):
        self.package = package
        self.executable = executable
        self.name = name
        self.namespace = namespace
        self.parameters = parameters or []
        self.arguments = arguments or []


@pytest.fixture()
def fake_launch(tmp_path, monkeypatch):
    """Install fake launch/launch_ros/ament_index_python modules + fake
    vis_nav share assets; returns the share dir."""
    share = tmp_path / "share"
    (share / "vis_nav" / "world").mkdir(parents=True)
    (share / "vis_nav" / "description" / "urdf").mkdir(parents=True)
    (share / "gazebo_ros" / "launch").mkdir(parents=True)
    (share / "vis_nav" / "world" / "final_world_presidence.world").write_text(
        "<sdf/>")
    (share / "vis_nav" / "description" / "urdf" / "robot_w.urdf").write_text(
        "<robot name='scout'/>")

    ament = types.ModuleType("ament_index_python")
    ament_pkgs = types.ModuleType("ament_index_python.packages")
    ament_pkgs.get_package_share_directory = lambda p: str(share / p)
    ament.packages = ament_pkgs

    launch = types.ModuleType("launch")
    launch.LaunchDescription = FakeLaunchDescription
    launch_actions = types.ModuleType("launch.actions")
    launch_actions.IncludeLaunchDescription = FakeInclude
    launch_actions.ExecuteProcess = FakeExecuteProcess
    launch_src = types.ModuleType("launch.launch_description_sources")
    launch_src.PythonLaunchDescriptionSource = lambda p: p
    launch.actions = launch_actions
    launch.launch_description_sources = launch_src

    launch_ros = types.ModuleType("launch_ros")
    launch_ros_actions = types.ModuleType("launch_ros.actions")
    launch_ros_actions.Node = FakeNode
    launch_ros.actions = launch_ros_actions

    mods = {"ament_index_python": ament,
            "ament_index_python.packages": ament_pkgs,
            "launch": launch, "launch.actions": launch_actions,
            "launch.launch_description_sources": launch_src,
            "launch_ros": launch_ros,
            "launch_ros.actions": launch_ros_actions}
    monkeypatch.setattr(sys, "modules", {**sys.modules, **mods})
    for var in ("DGVIT_WORLD", "DGVIT_URDF", "DGVIT_ACTOR", "DGVIT_FLEET",
                "DGVIT_FLEET_MODE", "DGVIT_ARGS"):
        monkeypatch.delenv(var, raising=False)
    sys.modules.pop("_common", None)  # re-import against the fakes
    yield share
    sys.modules.pop("_common", None)


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name.replace(".launch", "_launch"), str(DEPLOY / f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_training_launch_structure(fake_launch):
    ld = _load("training_simulation.launch").generate_launch_description()
    kinds = [type(a).__name__ for a in ld.actions]
    assert kinds == ["FakeInclude", "FakeNode", "FakeNode",
                     "FakeExecuteProcess"]
    gz, rsp, spawn, proc = ld.actions
    assert gz.launch_arguments["world"].endswith(
        "final_world_presidence.world")  # reference default world
    assert rsp.package == "robot_state_publisher"
    assert rsp.parameters[0]["robot_description"].startswith("<robot")
    assert spawn.executable == "spawn_entity.py"
    assert "scout" in spawn.arguments  # reference entity name
    assert proc.cmd[-3:] == ["dgvit_tpu.train.train_rl", "--env", "ros2"]


def test_testing_launch_uses_actor_env(fake_launch, monkeypatch):
    monkeypatch.setenv("DGVIT_ACTOR", "/ckpt/best_actor.npz")
    ld = _load("testing_simulation.launch").generate_launch_description()
    proc = ld.actions[-1]
    assert proc.cmd[-2:] == ["--actor", "/ckpt/best_actor.npz"]


def test_fleet_launch_namespaced_robots(fake_launch, monkeypatch):
    monkeypatch.setenv("DGVIT_FLEET", "3")
    ld = _load("fleet_simulation.launch").generate_launch_description()
    spawns = [a for a in ld.actions
              if isinstance(a, FakeNode) and a.executable == "spawn_entity.py"]
    rsps = [a for a in ld.actions
            if isinstance(a, FakeNode)
            and a.package == "robot_state_publisher"]
    assert len(spawns) == len(rsps) == 3
    # the serve.make_ros2_fleet contract: scout<i> under /robot<i>/...
    for i, (sp, rp) in enumerate(zip(spawns, rsps)):
        assert f"scout{i}" in sp.arguments
        assert f"/robot{i}/robot_description" in sp.arguments
        assert rp.namespace == f"/robot{i}"
    proc = ld.actions[-1]
    assert proc.cmd[-4:] == ["--fleet", "3", "--fleet-env", "ros2"]

    # train mode drives the fleet-collection trainer instead
    monkeypatch.setenv("DGVIT_FLEET_MODE", "train")
    sys.modules.pop("_common", None)
    ld2 = _load("fleet_simulation.launch").generate_launch_description()
    assert "dgvit_tpu.train.train_fleet" in ld2.actions[-1].cmd


def test_env_overrides_world_and_urdf(fake_launch, tmp_path, monkeypatch):
    w = tmp_path / "custom.world"
    w.write_text("<sdf/>")
    u = tmp_path / "custom.urdf"
    u.write_text("<robot name='x'/>")
    monkeypatch.setenv("DGVIT_WORLD", str(w))
    monkeypatch.setenv("DGVIT_URDF", str(u))
    ld = _load("training_simulation.launch").generate_launch_description()
    assert ld.actions[0].launch_arguments["world"] == str(w)
    assert ld.actions[1].parameters[0]["robot_description"] == \
        "<robot name='x'/>"
