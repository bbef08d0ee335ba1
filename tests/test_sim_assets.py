"""Generated Gazebo assets (dgvit_tpu/envs/sim_assets.py): the URDF and SDF
worlds must parse as XML, carry the reference live-robot sensor contract
(robot_w.urdf anchors in the module docstring), and the world boxes must
equal the envs/worlds preset tables the kinematic env navigates."""

import math
import xml.etree.ElementTree as ET

from dgvit_tpu.envs.kinematic import KinematicNavEnv
from dgvit_tpu.envs.sim_assets import (robot_urdf, world_sdf, write_assets)
from dgvit_tpu.envs.worlds import HOSPITAL, RRC


def test_urdf_parses_and_matches_kinematic_constants():
    root = ET.fromstring(robot_urdf())
    assert root.tag == "robot"
    links = {l.get("name") for l in root.findall("link")}
    assert {"base_link", "chassis", "left_wheel", "right_wheel",
            "camera_link", "camera_link_optical", "front_laser"} <= links

    # depth camera: FOV/clip are THE kinematic env's constants
    cam = root.find(".//sensor[@name='camera']")
    assert cam.get("type") == "depth"
    assert math.isclose(float(cam.find("camera/horizontal_fov").text),
                        KinematicNavEnv.CAM_FOV)
    assert float(cam.find("camera/clip/near").text) == \
        KinematicNavEnv.CAM_CLIP[0]
    assert float(cam.find("camera/clip/far").text) == \
        KinematicNavEnv.CAM_CLIP[1]
    assert cam.find("camera/image/width").text == "640"
    assert cam.find("camera/image/height").text == "512"
    assert cam.find(".//plugin[@name='camera_controller']"
                    "/frame_name").text == "camera_link_optical"

    # laser: +-LASER_FOV/2, max range LASER_MAX, reference remap topic
    laser = root.find(".//sensor[@name='laser']")
    half = KinematicNavEnv.LASER_FOV / 2.0
    assert math.isclose(float(
        laser.find("ray/scan/horizontal/max_angle").text), half)
    assert math.isclose(float(
        laser.find("ray/scan/horizontal/min_angle").text), -half)
    assert float(laser.find("ray/range/max").text) == \
        KinematicNavEnv.LASER_MAX
    assert "/front_laser/scan" in \
        laser.find("plugin/ros/remapping").text

    # diff drive: live-robot wheel geometry + cmd_vel/odom contract
    drive = root.find(".//plugin[@name='differential_drive_controller']")
    assert float(drive.find("wheel_separation").text) == 0.165
    assert float(drive.find("wheel_diameter").text) == 0.067
    assert drive.find("command_topic").text == "cmd_vel"
    assert drive.find("odometry_topic").text == "odom"

    # every continuous joint is a wheel; optical joint carries REP-103 rot
    cont = [j for j in root.findall("joint")
            if j.get("type") == "continuous"]
    assert {j.get("name") for j in cont} == \
        {"left_wheel_joint", "right_wheel_joint"}
    opt = root.find(".//joint[@name='camera_optical_joint']")
    rpy = [float(v) for v in opt.find("origin").get("rpy").split()]
    assert math.isclose(rpy[0], -math.pi / 2) and \
        math.isclose(rpy[2], -math.pi / 2)


def test_world_sdf_boxes_equal_preset_tables():
    for preset in (RRC, HOSPITAL):
        root = ET.fromstring(world_sdf(preset))
        world = root.find("world")
        assert world.get("name") == preset.name
        models = world.findall("model")
        walls = [m for m in models if m.get("name").startswith("wall_")]
        obst = [m for m in models if m.get("name").startswith("obstacle_")]
        assert len(walls) == 4
        assert len(obst) == len(preset.boxes)
        for m in obst:
            i = int(m.get("name").split("_")[1])
            x0, x1, y0, y1 = preset.boxes[i]
            sx, sy, _ = [float(v) for v in m.find(
                "link/collision/geometry/box/size").text.split()]
            cx, cy = [float(v) for v in m.find("pose").text.split()][:2]
            assert math.isclose(cx, (x0 + x1) / 2, abs_tol=1e-3)
            assert math.isclose(cy, (y0 + y1) / 2, abs_tol=1e-3)
            assert math.isclose(sx, x1 - x0, abs_tol=1e-3)
            assert math.isclose(sy, y1 - y0, abs_tol=1e-3)
            assert m.find("static").text == "true"


def test_write_assets_and_rand_ensemble(tmp_path):
    paths = write_assets(str(tmp_path), worlds=["rrc", "rand3"], seed=7)
    assert set(paths) == {"urdf", "rrc", "rand3_0", "rand3_1", "rand3_2"}
    for p in paths.values():
        ET.parse(p)  # everything parses
    # ensemble member i matches make_consts' lane world i % K (same seeds)
    from dgvit_tpu.envs.worlds import random_world
    w1 = random_world(1000 * 7 + 1)
    root = ET.parse(paths["rand3_1"]).getroot()
    obst = [m for m in root.find("world").findall("model")
            if m.get("name").startswith("obstacle_")]
    assert len(obst) == len(w1.boxes)
    x0, x1, y0, y1 = w1.boxes[0]
    cx, cy = [float(v) for v in obst[0].find("pose").text.split()][:2]
    assert math.isclose(cx, (x0 + x1) / 2, abs_tol=1e-3)
    assert math.isclose(cy, (y0 + y1) / 2, abs_tol=1e-3)


def test_common_fallback_generates_assets(tmp_path, monkeypatch):
    """deploy/ros2/_common.sim_asset falls back to generated assets when
    neither the env override nor the vis_nav package exists."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "_dgvit_launch_common",
        Path(__file__).resolve().parent.parent / "deploy/ros2/_common.py")
    common = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(common)

    monkeypatch.delenv("DGVIT_WORLD", raising=False)
    monkeypatch.delenv("DGVIT_URDF", raising=False)
    monkeypatch.setenv("DGVIT_ASSET_DIR", str(tmp_path / "assets"))
    world = common.sim_asset("world", "hospital.world")
    assert world.endswith("hospital.world")
    urdf = common.sim_asset("urdf", "robot_w.urdf")
    assert urdf.endswith("robot.urdf")
    ET.parse(world), ET.parse(urdf)
