"""GazeboRos2Env unit tests over the fake rclpy stack (tests/fake_ros2.py).

Covers the reset/step/teleport/decode contract of the reference GazeboEnv
(env_lab.py:190-343,409-472) with no live ROS2/Gazebo:
  * image decode for all three encodings (32FC1 / 16UC1 / mono8)
  * all-zero-frame detection
  * reset teleport sequencing + record iteration
  * /cmd_vel publication + pause/unpause stepping
  * service-availability wait loop
  * collision / goal-reached reward semantics
"""

import numpy as np
import pytest

from dgvit_tpu.config import Config

import fake_ros2


@pytest.fixture()
def ros2(monkeypatch):
    world = fake_ros2.install()
    # reset/step sleep 0.2/0.1 s (env_lab.py:204,330-343); zero them in CI
    import time as _time
    monkeypatch.setattr(_time, "sleep", lambda s: None)
    from dgvit_tpu.envs import ros2_adapter
    assert ros2_adapter.HAS_ROS2
    yield ros2_adapter, world
    fake_ros2.uninstall()


def _cfg(sensor="depth_image"):
    return Config.from_dict({"env": {"vis_sensor": sensor}})


def _mk_env(ros2_adapter, world, sensor="depth_image", records=None):
    env = ros2_adapter.GazeboRos2Env(_cfg(sensor), position_records=records)
    # preload the sensor mailboxes (latest-wins globals in the reference,
    # env_lab.py:24-28); the fake executor delivers synchronously
    topic = {"depth_image": "/camera/depth/image_raw",
             "fish_image": "/camera_fesh/image_raw",
             "image": "/camera/image_raw"}[sensor]
    return env, topic


def _depth_msg(h=64, w=80, encoding="32FC1", seed=0, zero=False):
    rng = np.random.default_rng(seed)
    if encoding == "32FC1":
        img = np.zeros((h, w), np.float32) if zero else \
            rng.uniform(0.1, 8.0, (h, w)).astype(np.float32)
    elif encoding == "16UC1":
        img = np.zeros((h, w), np.uint16) if zero else \
            rng.integers(1, 60000, (h, w)).astype(np.uint16)
    else:
        img = np.zeros((h, w), np.uint8) if zero else \
            rng.integers(1, 255, (h, w)).astype(np.uint8)
    return fake_ros2.Image(height=h, width=w, encoding=encoding,
                           data=img.tobytes()), img


def test_constructor_raises_without_ros2():
    fake_ros2.uninstall()
    from dgvit_tpu.envs import ros2_adapter
    if ros2_adapter.HAS_ROS2:  # a real ROS2 install would legitimately pass
        pytest.skip("real rclpy present")
    with pytest.raises(ImportError, match="rclpy not available"):
        ros2_adapter.GazeboRos2Env(_cfg())


def test_image_decode_32fc1(ros2):
    ros2_adapter, world = ros2
    env, topic = _mk_env(ros2_adapter, world)
    msg, img = _depth_msg(encoding="32FC1")
    world.deliver(topic, msg)
    assert env._last_image is not None
    np.testing.assert_array_equal(env._last_image, img)
    assert env._last_image.dtype == np.float32


def test_image_decode_16uc1(ros2):
    ros2_adapter, world = ros2
    env, topic = _mk_env(ros2_adapter, world)
    msg, img = _depth_msg(encoding="16UC1")
    world.deliver(topic, msg)
    np.testing.assert_array_equal(env._last_image, img)
    assert env._last_image.dtype == np.uint16


def test_image_decode_mono8(ros2):
    ros2_adapter, world = ros2
    env, topic = _mk_env(ros2_adapter, world, sensor="image")
    msg, img = _depth_msg(encoding="mono8")
    world.deliver(topic, msg)
    np.testing.assert_array_equal(env._last_image, img)
    assert env._last_image.dtype == np.uint8


def test_zero_frame_detection_logs_error(ros2):
    ros2_adapter, world = ros2
    env, topic = _mk_env(ros2_adapter, world)
    msg, _ = _depth_msg(zero=True)
    world.deliver(topic, msg)
    assert ("error", "Image null!") in world.logs  # env_lab.py:435-436


def _prime(world, topic, x=0.0, y=0.0, qz=0.0, qw=1.0, ranges=None):
    msg, _ = _depth_msg()
    world.deliver(topic, msg)
    world.deliver("/odom", fake_ros2.Odometry(x=x, y=y, qz=qz, qw=qw))
    world.deliver("/front_laser/scan",
                  fake_ros2.LaserScan(ranges or [5.0] * 36))


def test_reset_teleports_robot_then_target_and_iterates_records(ros2):
    ros2_adapter, world = ros2
    recs = [{"xR": 1.0, "yR": -1.0, "xG": 3.0, "yG": 2.0,
             "quaterZ": 0.0, "quaterW": 1.0},
            {"xR": -2.0, "yR": 0.5, "xG": 0.0, "yG": -3.0}]
    env, topic = _mk_env(ros2_adapter, world, records=recs)
    _prime(world, topic, x=1.0, y=-1.0)

    r = env.reset()
    calls = world.calls("gazebo/set_entity_state")
    assert len(calls) == 2  # robot first, then target cone (env_lab.py:320-321)
    assert calls[0].state.name == "scout"
    assert calls[0].state.pose.position.x == 1.0
    assert calls[0].state.pose.position.y == -1.0
    assert calls[1].state.name == "target_cone"
    assert calls[1].state.pose.position.x == 3.0
    assert (env.goalX, env.goalY) == (3.0, 2.0)
    assert env.indice_position == 1
    assert r.state.shape == (128, 160, 1)
    assert r.to_goal.shape == (4,)

    env.reset()  # second record, then wrap
    assert (env.goalX, env.goalY) == (0.0, -3.0)
    assert env.indice_position == 0


def test_reset_state_normalized_and_physics_cycled(ros2):
    ros2_adapter, world = ros2
    env, topic = _mk_env(ros2_adapter, world)
    _prime(world, topic)
    r = env.reset()
    assert r.state.min() >= 0.0 and r.state.max() <= 1.0  # /255 scale
    assert len(world.calls("/unpause_physics")) == 1
    assert len(world.calls("/pause_physics")) == 1


def test_step_publishes_cmd_vel_and_cycles_physics(ros2):
    ros2_adapter, world = ros2
    env, topic = _mk_env(ros2_adapter, world)
    _prime(world, topic, x=0.0, y=0.0)
    env.reset()
    s = env.step([0.3, -0.4], t=1)
    tw = world.twists()
    assert len(tw) == 1
    assert tw[0].linear.x == pytest.approx(0.3)
    assert tw[0].angular.z == pytest.approx(-0.4)
    assert len(world.calls("/unpause_physics")) == 2  # reset + step
    assert s.state.shape == (128, 160, 1)
    assert np.isfinite(s.reward)


def test_service_wait_loop_retries_until_available(ros2):
    ros2_adapter, world = ros2
    env, topic = _mk_env(ros2_adapter, world)
    world.fail_first_wait["/unpause_physics"] = 2  # two failed waits first
    _prime(world, topic)
    env.reset()
    waits = [m for lvl, m in world.logs if "service not available" in m]
    assert len(waits) == 2  # env_lab.py:197-211 wait loop exercised
    assert len(world.calls("/unpause_physics")) == 1  # still called once


def test_step_collision_sets_done_and_counts(ros2):
    ros2_adapter, world = ros2
    env, topic = _mk_env(ros2_adapter, world)
    _prime(world, topic, x=0.0, y=0.0)
    env.reset()
    # laser sees an obstacle inside the 0.2 m collision range
    world.deliver("/front_laser/scan",
                  fake_ros2.LaserScan([0.1] + [5.0] * 35))
    s = env.step([0.2, 0.0], t=1)
    assert s.done and not s.target
    assert env.collision == 1
    assert s.reward < 0  # r_collision=-100 dominates (env_lab.py:289)


def test_step_goal_reached_sets_target(ros2):
    ros2_adapter, world = ros2
    recs = [{"xR": 0.0, "yR": 0.0, "xG": 0.2, "yG": 0.0}]
    env, topic = _mk_env(ros2_adapter, world, records=recs)
    _prime(world, topic, x=0.0, y=0.0)
    env.reset()
    _prime(world, topic, x=0.1, y=0.0)  # within goal_radius 0.5
    s = env.step([0.1, 0.0], t=1)
    assert s.target and s.done
    assert s.reward > 100  # r_target=200 (env_lab.py:286)


def test_image_decode_rgb8_and_bgr8_to_mono(ros2):
    """Color cameras are converted to mono8 like cv_bridge's
    imgmsg_to_cv2(..., 'mono8') (env_lab.py:460-471), not reshape-crashed."""
    ros2_adapter, world = ros2
    env, topic = _mk_env(ros2_adapter, world, sensor="image")
    rng = np.random.default_rng(3)
    rgb = rng.integers(1, 255, (64, 80, 3)).astype(np.uint8)
    want = (rgb.astype(np.float32)
            @ np.array([0.299, 0.587, 0.114], np.float32)).astype(np.uint8)

    world.deliver(topic, fake_ros2.Image(height=64, width=80, encoding="rgb8",
                                         data=rgb.tobytes()))
    np.testing.assert_array_equal(env._last_image, want)
    assert env._last_image.dtype == np.uint8

    world.deliver(topic, fake_ros2.Image(
        height=64, width=80, encoding="bgr8",
        data=rgb[..., ::-1].copy().tobytes()))
    np.testing.assert_array_equal(env._last_image, want)


def test_goal_marker_published_on_reset_and_step(ros2):
    """The RViz goal cylinder (env_lab.py:254-271) rides every reset+step."""
    ros2_adapter, world = ros2
    recs = [{"xR": 0.0, "yR": 0.0, "xG": 3.0, "yG": 2.0}]
    env, topic = _mk_env(ros2_adapter, world, records=recs)
    _prime(world, topic)
    env.reset()
    markers = world.published.get("/goal_mark_array", [])
    assert len(markers) == 1
    m = markers[0].markers[0]
    assert m.header.frame_id == "odom"
    assert m.type == fake_ros2.Marker.CYLINDER
    assert (m.pose.position.x, m.pose.position.y) == (3.0, 2.0)
    assert (m.scale.x, m.scale.y, m.scale.z) == (0.3, 0.3, 0.01)
    assert m.color.a == 1.0
    env.step([0.1, 0.0], t=0)
    assert len(world.published["/goal_mark_array"]) == 2


def test_set_entity_does_not_spin_a_second_executor(ros2, monkeypatch):
    """Reset must wait on the teleport future directly — spinning the node
    from the reset thread conflicts with the per-env background executor
    (and a fleet of N concurrent resets would all spin the global executor
    at once)."""
    ros2_adapter, world = ros2
    import rclpy

    def _boom(node, fut):
        raise AssertionError("spin_until_future_complete must not be called")

    monkeypatch.setattr(rclpy, "spin_until_future_complete", _boom)
    recs = [{"xR": 0.0, "yR": 0.0, "xG": 1.0, "yG": 1.0}]
    env, topic = _mk_env(ros2_adapter, world, records=recs)
    _prime(world, topic)
    env.reset()  # would raise if _set_entity still spins
    assert len(world.calls("gazebo/set_entity_state")) == 2


def test_sim_clock_mailbox(ros2):
    """/clock feeds sim_now() — fleet durations can ride real sim time
    instead of assuming real-time-factor 1 (free-running Gazebo)."""
    ros2_adapter, world = ros2
    env, topic = _mk_env(ros2_adapter, world)
    assert env.sim_now() is None
    world.deliver("/clock", fake_ros2.Clock(sec=12, nanosec=500_000_000))
    assert env.sim_now() == pytest.approx(12.5)


def test_step_infinite_ranges_sanitized(ros2):
    ros2_adapter, world = ros2
    env, topic = _mk_env(ros2_adapter, world)
    _prime(world, topic)
    env.reset()
    world.deliver("/front_laser/scan",
                  fake_ros2.LaserScan([float("inf"), float("nan")] + [5.0] * 34))
    s = env.step([0.1, 0.0], t=1)
    assert not s.done  # inf/nan mapped to 10.0, no phantom collision
