"""Shared pieces for the dgvit_tpu ROS2 launch descriptions.

Clean-room equivalents of the reference's launch choreography
(training_simulation.launch.py:22-52 gzserver+driver+state-publisher;
robot_state_publisher.launch.py:33-58 spawn+publisher). Simulation assets
(worlds, URDF) come from the installed reference `vis_nav` package so a
switch-over keeps the sim untouched; every path is overridable via env
vars because launch files resolve them at description-generation time.
"""

import os
import sys


# vis_nav world files <-> envs/worlds presets (for the generated fallback)
_WORLD_PRESET = {"final_world_presidence.world": "rrc",
                 "final_world_presidence_box.world": "rrc",
                 "hospital.world": "hospital"}


def sim_asset(kind: str, default_name: str) -> str:
    """Resolve a sim asset (world/URDF): env-var override first, then the
    installed reference `vis_nav` package (a switch-over keeps the sim
    untouched), else GENERATE the self-contained equivalent from the
    framework's own constants (dgvit_tpu.envs.sim_assets — same sensor
    geometry as the kinematic env, same obstacle tables as envs/worlds)."""
    env = {"world": "DGVIT_WORLD", "urdf": "DGVIT_URDF"}[kind]
    override = os.environ.get(env)
    if override:
        return override
    try:
        from ament_index_python.packages import get_package_share_directory

        share = get_package_share_directory("vis_nav")
        sub = {"world": "world", "urdf": os.path.join("description", "urdf")}
        path = os.path.join(share, sub[kind], default_name)
        if os.path.exists(path):
            return path
    except Exception:
        pass
    from dgvit_tpu.envs import sim_assets

    preset = _WORLD_PRESET.get(default_name, "rrc")
    paths = sim_assets.write_assets(sim_assets.default_asset_dir(),
                                    worlds=[preset])
    return paths["urdf" if kind == "urdf" else preset]


def gzserver(world: str):
    """Gazebo server with the given world (the reference includes
    gazebo_ros's gzserver.launch.py; gzclient stays off for headless
    training, as in the reference where it is commented out)."""
    from ament_index_python.packages import get_package_share_directory
    from launch.actions import IncludeLaunchDescription
    from launch.launch_description_sources import PythonLaunchDescriptionSource

    pkg = get_package_share_directory("gazebo_ros")
    return IncludeLaunchDescription(
        PythonLaunchDescriptionSource(
            os.path.join(pkg, "launch", "gzserver.launch.py")),
        launch_arguments={"world": world}.items(),
    )


def robot_state_publisher(urdf: str, namespace: str = "",
                          use_sim_time: bool = True):
    from launch_ros.actions import Node

    with open(urdf) as f:
        robot_desc = f.read()
    return Node(
        package="robot_state_publisher",
        executable="robot_state_publisher",
        name="robot_state_publisher",
        namespace=namespace,
        output="screen",
        parameters=[{"use_sim_time": use_sim_time,
                     "robot_description": robot_desc}],
        arguments=[urdf],
    )


def spawn_entity(entity: str, namespace: str = "", x: float = 0.0,
                 y: float = 2.0):
    """gazebo_ros spawn from the (optionally namespaced) robot_description
    topic — the reference spawns 'scout' at (0, 2) the same way
    (robot_state_publisher.launch.py:41-47)."""
    from launch_ros.actions import Node

    topic = f"{namespace}/robot_description" if namespace \
        else "robot_description"
    return Node(
        package="gazebo_ros",
        executable="spawn_entity.py",
        arguments=["-topic", topic, "-entity", entity,
                   "-x", str(x), "-y", str(y), "-z", "0.0"],
        output="screen",
    )


def driver_process(argv):
    """Run a dgvit_tpu console driver as a launch process (our drivers are
    pip entry points, not ament package executables like the reference's
    testing.py node)."""
    from launch.actions import ExecuteProcess

    extra = os.environ.get("DGVIT_ARGS", "").split()
    return ExecuteProcess(cmd=[sys.executable, "-m"] + argv + extra,
                          output="screen")
