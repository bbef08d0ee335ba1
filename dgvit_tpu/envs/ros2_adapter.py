"""ROS2/Gazebo adapter — the thin host-boundary shim around the real
simulator (env_lab.py GazeboEnv + subscriber nodes), import-gated so the
framework never requires ROS.

Responsibilities mapped from the reference:
  * /cmd_vel Twist publishing + pause/unpause physics stepping
    (env_lab.py:132-136,190-212)
  * gazebo/set_entity_state teleports on reset (env_lab.py:152-168,320-321)
  * latest-value sensor mailboxes fed by a MultiThreadedExecutor daemon
    thread (main.py:199-204; the benign races are identical by design,
    SURVEY.md §5 'Race detection')
  * depth/fisheye frame ingest runs through ops/preprocess (the Pallas/XLA
    replacement for the cv_bridge+cv2 chain, env_lab.py:420-434,450-458)

The device graph stays clean: this class is pure host code implementing the
Env protocol; drivers (train_rl/evaluate) are agnostic to it.
"""

from __future__ import annotations

import math
import threading
import time
from typing import Optional

import numpy as np

from dgvit_tpu.envs.base import ResetResult, StepResult
from dgvit_tpu.envs import reward as R

try:  # pragma: no cover - exercised only on a ROS2 machine
    import rclpy
    from rclpy.node import Node
    HAS_ROS2 = True
except ImportError:
    HAS_ROS2 = False
    Node = object  # type: ignore


class GazeboRos2Env:
    """Env-protocol adapter over ROS2 topics/services. Requires rclpy.

    Multi-robot fleets (serve/fleet.py): pass a per-robot `namespace`
    (topics become <ns>/cmd_vel, <ns>/odom, ...) plus distinct
    `robot_name`/`target_name` Gazebo entities, and set
    `manage_physics=False` so robots don't fight over the GLOBAL
    pause/unpause services — a fleet runs Gazebo free-running real-time
    (the reference's lockstep 0.1 s pause cycle, env_lab.py:197-212, only
    makes sense for one robot owning the clock)."""

    def __init__(self, cfg, position_records: Optional[list] = None,
                 use_jax_preprocess: bool = True, namespace: str = "",
                 robot_name: Optional[str] = None,
                 target_name: str = "target_cone",
                 manage_physics: bool = True):
        if not HAS_ROS2:
            raise ImportError(
                "rclpy not available — GazeboRos2Env needs a ROS2 Humble "
                "environment (reference package.xml). Use KinematicNavEnv or "
                "ReplayEnv for Gazebo-free runs.")
        from geometry_msgs.msg import Twist
        from std_srvs.srv import Empty
        from gazebo_msgs.srv import SetEntityState
        from nav_msgs.msg import Odometry
        from sensor_msgs.msg import Image, LaserScan

        self.cfg = cfg
        self._lock = threading.Lock()
        self._last_odom = None
        self._last_image = None
        self._scan = None
        self.collision = 0
        self.indice_position = 0
        self.records = position_records or []
        self.dist_old = 1.0
        self.goalX = self.goalY = 2.0
        self._use_jax_pre = use_jax_preprocess
        self._noise_key = 0
        assert namespace == "" or namespace.startswith("/"), \
            "namespace must be '' or start with '/' (ROS2 convention)"
        self.namespace = namespace
        self.robot_name = robot_name or getattr(cfg.train, "robot", "scout")
        self.target_name = target_name
        self.manage_physics = manage_physics
        self.DT = 0.1  # sim-time per action step (env_lab.py:204)

        try:
            rclpy.init(args=None)
        except RuntimeError:  # context already initialized — fleet case:
            pass               # one rclpy context, one node per robot
        self.node = rclpy.create_node(
            "dgvit_env" + namespace.replace("/", "_"))
        self.vel_pub = self.node.create_publisher(
            Twist, f"{namespace}/cmd_vel", 1)
        # physics + teleport services are Gazebo-global (never namespaced)
        self.unpause = self.node.create_client(Empty, "/unpause_physics")
        self.pause = self.node.create_client(Empty, "/pause_physics")
        self.set_state = self.node.create_client(SetEntityState,
                                                 "gazebo/set_entity_state")
        # RViz goal marker (env_lab.py:135,254-271): a flat white cylinder at
        # the live goal, republished every step. Import-gated — a bare-bones
        # ROS2 install without visualization_msgs just skips the marker.
        self._marker_pub = None
        try:
            from visualization_msgs.msg import Marker, MarkerArray  # noqa: F401
            self._marker_pub = self.node.create_publisher(
                MarkerArray, f"{namespace}/goal_mark_array", 3)
        except ImportError:
            pass
        # /clock mailbox: with manage_physics=False (fleet mode) Gazebo runs
        # free and advances sim time by wall-clock x real-time-factor, so
        # (t+1)*DT is only correct at RTF==1 — durations should come from the
        # sim clock itself when it is published (gazebo_ros use_sim_time).
        self._sim_clock = None
        try:
            from rosgraph_msgs.msg import Clock
            self.node.create_subscription(Clock, "/clock", self._on_clock, 10)
        except ImportError:
            pass

        topic = {"depth_image": f"{namespace}/camera/depth/image_raw",
                 "fish_image": f"{namespace}/camera_fesh/image_raw",
                 "image": f"{namespace}/camera/image_raw"}[cfg.env.vis_sensor]
        self.node.create_subscription(Image, topic, self._on_image, 10)
        self.node.create_subscription(Odometry, f"{namespace}/odom",
                                      self._on_odom, 10)
        self.node.create_subscription(LaserScan,
                                      f"{namespace}/front_laser/scan",
                                      self._on_scan, 1)
        self._executor = rclpy.executors.MultiThreadedExecutor()
        self._executor.add_node(self.node)
        self._thread = threading.Thread(target=self._executor.spin, daemon=True)
        self._thread.start()

    # -- sensor mailboxes (latest-wins, like env_lab.py:24-28) ---------------
    def _on_odom(self, msg):
        self._last_odom = msg

    def _on_scan(self, msg):
        self._scan = msg

    def _on_clock(self, msg):
        self._sim_clock = float(msg.clock.sec) + float(msg.clock.nanosec) * 1e-9

    def sim_now(self) -> Optional[float]:
        """Latest /clock sim time in seconds, or None before the first tick
        (no /clock publisher, or a world not yet unpaused)."""
        return self._sim_clock

    def _on_image(self, msg):
        """Raw-bytes -> array decode at the host boundary; the noise/blur
        chain runs on-device via ops.preprocess (SURVEY.md §2.2)."""
        h, w = msg.height, msg.width
        if msg.encoding in ("32FC1",):
            img = np.frombuffer(msg.data, np.float32).reshape(h, w)
        elif msg.encoding in ("16UC1",):
            img = np.frombuffer(msg.data, np.uint16).reshape(h, w)
        elif msg.encoding in ("rgb8", "bgr8", "8UC3"):
            # cv_bridge imgmsg_to_cv2(..., "mono8") equivalent
            # (env_lab.py:460-471): ITU-R BT.601 luma, 8UC3 treated as BGR
            # like OpenCV does
            rgb = np.frombuffer(msg.data, np.uint8).reshape(h, w, 3)
            if msg.encoding != "rgb8":
                rgb = rgb[..., ::-1]
            img = (rgb @ np.array([0.299, 0.587, 0.114], np.float32)).astype(
                np.uint8)
        else:  # mono8
            img = np.frombuffer(msg.data, np.uint8).reshape(h, w)
        if not img.any():  # all-zero frame detection (env_lab.py:435-436)
            self.node.get_logger().error("Image null!")
        self._last_image = img

    # -- physics stepping -----------------------------------------------------
    def _call_empty(self, client):
        from std_srvs.srv import Empty

        while not client.wait_for_service(timeout_sec=1.0):
            self.node.get_logger().info("service not available, waiting...")
        client.call_async(Empty.Request())

    def _set_entity(self, name, x, y, qz=0.0, qw=1.0):
        from gazebo_msgs.srv import SetEntityState

        req = SetEntityState.Request()
        req.state.name = name
        req.state.pose.position.x = float(x)
        req.state.pose.position.y = float(y)
        req.state.pose.orientation.z = float(qz)
        req.state.pose.orientation.w = float(qw)
        fut = self.set_state.call_async(req)
        # Do NOT spin here: the node already spins in its own background
        # MultiThreadedExecutor (which completes this future), and in a fleet
        # N concurrent resets would all try to attach the nodes to the global
        # executor and spin it from multiple threads at once. Wait on the
        # future directly instead.
        done = threading.Event()
        fut.add_done_callback(lambda _fut: done.set())
        if fut.done():  # completed before the callback was registered
            done.set()
        if not done.wait(timeout=5.0):
            self.node.get_logger().error(
                f"set_entity_state({name}) timed out after 5 s")

    def _publish_goal_marker(self):
        """RViz goal visualization (env_lab.py:254-271): one flat white
        cylinder in the odom frame at the current goal, republished on every
        reset and step so RViz always shows the live target."""
        if self._marker_pub is None:
            return
        from visualization_msgs.msg import Marker, MarkerArray

        marker = Marker()
        marker.header.frame_id = "odom"
        marker.type = Marker.CYLINDER
        marker.action = Marker.ADD
        marker.scale.x = 0.3
        marker.scale.y = 0.3
        marker.scale.z = 0.01
        marker.color.a = 1.0
        marker.color.r = 1.0
        marker.color.g = 1.0
        marker.color.b = 1.0
        marker.pose.orientation.w = 1.0
        marker.pose.position.x = float(self.goalX)
        marker.pose.position.y = float(self.goalY)
        marker.pose.position.z = 0.0
        arr = MarkerArray()
        arr.markers.append(marker)
        self._marker_pub.publish(arr)

    def _preprocess(self, raw) -> np.ndarray:
        import jax

        from dgvit_tpu.ops import preprocess as pp

        key = jax.random.PRNGKey(self._noise_key)
        self._noise_key += 1
        if self.cfg.env.vis_sensor == "depth_image":
            dtype_in = "float" if raw.dtype.kind == "f" else "uint16"
            out = pp.preprocess_depth(raw[None].astype(np.float32), key,
                                      dtype_in=dtype_in)[0]
        elif self.cfg.env.vis_sensor == "fish_image":
            out = pp.preprocess_fisheye(raw[None].astype(np.float32))[0]
        else:
            out = pp.resize_bilinear(raw[None].astype(np.float32),
                                     (128, 160))[0] / 255.0
        return np.asarray(out)[..., None]

    def _pose(self):
        od = self._last_odom
        x = od.pose.pose.position.x
        y = od.pose.pose.position.y
        q = od.pose.pose.orientation
        yaw = float(np.asarray(R.quaternion_yaw(q.w, q.x, q.y, q.z)))
        return x, y, yaw

    # -- Env protocol ---------------------------------------------------------
    def reset(self) -> ResetResult:
        if self.records:
            rec = self.records[self.indice_position]
            self.indice_position = (self.indice_position + 1) % len(self.records)
            self._set_entity(self.robot_name,
                             rec["xR"], rec["yR"],
                             rec.get("quaterZ", 0), rec.get("quaterW", 1))
            self._set_entity(self.target_name, rec["xG"], rec["yG"])
            self.goalX, self.goalY = rec["xG"], rec["yG"]
        self._publish_goal_marker()
        if self.manage_physics:
            self._call_empty(self.unpause)
            time.sleep(0.2)
            self._call_empty(self.pause)
        else:  # free-running sim: just let the teleport settle
            time.sleep(0.2)
        while self._last_image is None or self._last_odom is None:
            time.sleep(0.05)
        x, y, yaw = self._pose()
        self.dist_old = math.hypot(x - self.goalX, y - self.goalY)
        state = self._preprocess(self._last_image)
        to_goal = np.asarray(R.polar_goal(x, y, self.goalX, self.goalY, yaw),
                             np.float32)
        return ResetResult(state=state, xR=x, yR=y, to_goal=to_goal)

    def step(self, action, t: int) -> StepResult:
        from geometry_msgs.msg import Twist

        cmd = Twist()
        cmd.linear.x = float(action[0])
        cmd.angular.z = float(action[1])
        self.vel_pub.publish(cmd)
        self._publish_goal_marker()
        if self.manage_physics:
            self._call_empty(self.unpause)
            time.sleep(self.DT)  # 0.1 s sim step (env_lab.py:204)
            self._call_empty(self.pause)
        else:  # fleet mode: real-time sim, fixed control cadence
            time.sleep(self.DT)

        scan = self._scan
        ranges = np.asarray(scan.ranges, np.float32)
        ranges[~np.isfinite(ranges)] = 10.0
        col, _ = R.laser_collision(ranges, self.cfg.env.collision_range)
        col = bool(col)
        x, y, yaw = self._pose()
        dist = math.hypot(x - self.goalX, y - self.goalY)
        out = R.step_reward(self.dist_old, dist, col,
                            float(action[0]), float(action[1]),
                            goal_radius=self.cfg.env.goal_radius,
                            r_target=self.cfg.env.r_target,
                            r_collision=self.cfg.env.r_collision,
                            heuristic_scale=self.cfg.env.heuristic_scale,
                            clip=tuple(self.cfg.env.reward_clip))
        self.dist_old = float(out.dist)
        if col:
            self.collision += 1
        state = self._preprocess(self._last_image)
        to_goal = np.asarray(R.polar_goal(x, y, self.goalX, self.goalY, yaw,
                                          float(action[0]), float(action[1])),
                             np.float32)
        return StepResult(state=state, reward=float(out.reward),
                          done=bool(out.done), to_goal=to_goal,
                          target=bool(out.target))

    def stop(self):
        from geometry_msgs.msg import Twist

        self.vel_pub.publish(Twist())
