"""Fleet serving: N robots share one BatchingActorServer (serve/fleet.py).

The reference is strictly 1 robot : 1 process : 1 policy loop
(main.py:369); the fleet layer scales that to N concurrent Env clients
whose action requests coalesce into shared padded-bucket dispatches.
Covers:
  * deterministic equivalence — batched-server fleet results match a
    direct (unbatched) run of the same robots
  * request coalescing — fewer dispatches than requests, every row served
  * reference evaluation semantics per robot (success/collision/bad-init
    accounting, durations in simulated seconds, testing.py:103-150)
  * namespaced multi-robot GazeboRos2Env adapters over fake rclpy
    (distinct topics/entities, free-running physics)
"""

import numpy as np
import pytest

import jax

from dgvit_tpu.config import Config
from dgvit_tpu.envs import KinematicNavEnv
from dgvit_tpu.models import build_actor
from dgvit_tpu.serve import FleetRunner, make_action_fn, serve_fleet

import fake_ros2


def fleet_cfg(max_steps=12):
    return Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 16, "mlp_dim": 32,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "env": {"max_steps": max_steps},
    })


@pytest.fixture(scope="module")
def actor_setup():
    cfg = fleet_cfg()
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(0), np.zeros((1, 32, 40)),
                        np.zeros((1, 2)))["params"]
    act = jax.jit(make_action_fn(cfg, params))
    return cfg, act


def _kin_envs(n, max_steps=12):
    return [KinematicNavEnv(seed=100 + i, image_hw=(32, 40))
            for i in range(n)]


def test_fleet_matches_direct_run(actor_setup):
    cfg, act = actor_setup
    n = 4

    # server pinned to bucket size 1 so every dispatch has EXACTLY the same
    # shape as the direct batch-1 calls — XLA GEMM blocking can differ by
    # batch shape, and tiny per-row action deltas compound over episode
    # dynamics into different success/duration outcomes (ADVICE r3)
    from dgvit_tpu.serve import BatchingActorServer

    with BatchingActorServer(act, max_wait_ms=30.0, buckets=(1,)) as srv:
        out_srv = FleetRunner(_kin_envs(n), srv, cfg).run(
            episodes_per_robot=2)
    # same robots, direct per-request calls (no server, no coalescing)
    direct = FleetRunner(_kin_envs(n),
                         lambda o, g: np.asarray(act(o[None], g[None]))[0],
                         cfg)
    out_dir = direct.run(episodes_per_robot=2)

    assert out_srv["episodes"] == out_dir["episodes"] == 2 * n
    assert out_srv["successes"] == out_dir["successes"]
    assert out_srv["collisions"] == out_dir["collisions"]
    assert out_srv["bad_inits"] == out_dir["bad_inits"]
    np.testing.assert_allclose(out_srv["durations"], out_dir["durations"])
    np.testing.assert_allclose(out_srv["total_reward"],
                               out_dir["total_reward"], rtol=1e-4)
    # per-robot reports carry their own accounting
    assert [r.robot for r in out_srv["per_robot"]] == list(range(n))
    assert sum(r.successes for r in out_srv["per_robot"]) == \
        out_srv["successes"]


def test_fleet_coalesces_requests(actor_setup):
    cfg, act = actor_setup
    n = 6
    out = serve_fleet(cfg, _kin_envs(n), act, episodes_per_robot=1,
                      max_wait_ms=50.0)
    st = out["serving"]
    # every action request was answered through the server...
    assert st["requests"] == st["rows"] >= n  # one per robot-step
    # ...in strictly fewer dispatches than requests (real coalescing)
    assert st["dispatches"] < st["requests"]
    assert st["mean_batch"] > 1.0
    # durations are simulated seconds: multiples of env.DT within an episode
    dt = KinematicNavEnv(seed=0, image_hw=(32, 40)).DT
    for d in out["durations"]:
        assert abs(d / dt - round(d / dt)) < 1e-6
        assert d <= cfg.env.max_steps * dt + 1e-9


def test_fleet_partial_failure_returns_completed_reports(actor_setup):
    """One dead robot must not throw away the other N-1 robots' campaigns
    (VERDICT r3 weak #4): the run returns every completed RobotReport with
    the failing robot's error attached + server stats; the caller decides."""
    cfg, act = actor_setup

    class Boom:
        def reset(self):
            raise RuntimeError("sensor offline")

    envs = _kin_envs(2) + [Boom()]
    out = serve_fleet(cfg, envs, act, episodes_per_robot=2, max_wait_ms=30.0)
    assert out["errors"] == {2: "RuntimeError: sensor offline"}
    assert out["per_robot"][2].error == "RuntimeError: sensor offline"
    assert out["episodes"] == 4  # both healthy robots' campaigns completed
    assert all(r.error is None and r.episodes == 2
               for r in out["per_robot"][:2])
    assert out["serving"]["rows"] >= 4

    # the strict eval caller turns attached errors back into a failure
    from dgvit_tpu.train import evaluate
    import unittest.mock as mock

    with mock.patch.object(evaluate, "KinematicNavEnv",
                           side_effect=lambda **kw: Boom()), \
            pytest.raises(RuntimeError, match="fleet eval incomplete"):
        evaluate.run_eval_fleet(cfg, None, max_episodes=2, n_robots=2)


def test_fleet_mid_campaign_death_keeps_finished_episodes(actor_setup):
    """A robot dying between episodes still reports the episodes it
    finished; the error marks the report."""
    cfg, act = actor_setup

    class DiesAfterOneEpisode:
        def __init__(self, inner):
            self.inner = inner
            self.resets = 0
            self.DT = inner.DT

        def reset(self):
            self.resets += 1
            if self.resets > 1:
                raise RuntimeError("battery died")
            return self.inner.reset()

        def step(self, a, t):
            return self.inner.step(a, t)

    envs = [_kin_envs(1)[0], DiesAfterOneEpisode(_kin_envs(2)[1])]
    out = FleetRunner(envs,
                      lambda o, g: np.asarray(act(o[None], g[None]))[0],
                      cfg).run(episodes_per_robot=2)
    assert out["errors"] == {1: "RuntimeError: battery died"}
    assert out["per_robot"][0].episodes == 2
    assert out["per_robot"][1].episodes == 1  # the one it finished counts
    assert out["episodes"] == 3


def test_bad_init_episode_excluded_from_stream_and_reward(actor_setup):
    """testing.py:117-121 bad-init exclusion applies to EVERYTHING the
    episode produced: not just the counters but also the on_transition
    stream and total_reward (ADVICE r3) — replay consumers never ingest
    data from episodes the protocol skips."""
    cfg, act = actor_setup
    from dgvit_tpu.envs.base import ResetResult, StepResult

    class BadInit:
        DT = 0.1

        def reset(self):
            return ResetResult(state=np.zeros((32, 40, 1), np.float32),
                               xR=0.0, yR=0.0,
                               to_goal=np.zeros(4, np.float32))

        def step(self, a, t):
            return StepResult(state=np.zeros((32, 40, 1), np.float32),
                              reward=-100.0, done=True,
                              to_goal=np.zeros(4, np.float32), target=False)

    rows = []
    out = FleetRunner([BadInit()],
                      lambda o, g: np.asarray(act(o[None], g[None]))[0], cfg,
                      on_transition=lambda *tr: rows.append(tr)).run(1)
    assert out["bad_inits"] == 1 and out["episodes"] == 0
    assert rows == []  # nothing streamed from the excluded episode
    assert out["total_reward"] == 0.0


def test_fleet_durations_use_sim_clock_when_available(actor_setup):
    """With free-running Gazebo (manage_physics=False) sim time advances by
    wall-clock x RTF; when the env exposes sim_now() (the /clock mailbox)
    durations must come from the sim clock, not (t+1)*DT (ADVICE r3)."""
    cfg, act = actor_setup
    from dgvit_tpu.envs.base import ResetResult, StepResult

    class ClockedEnv:
        DT = 0.1

        def __init__(self):
            self.t = 0.0

        def sim_now(self):
            return self.t

        def reset(self):
            self.t = 5.0
            return ResetResult(state=np.zeros((32, 40, 1), np.float32),
                               xR=0.0, yR=0.0,
                               to_goal=np.zeros(4, np.float32))

        def step(self, a, t):
            self.t += 0.25  # free-running at real-time-factor 2.5
            hit = t == 2
            return StepResult(state=np.zeros((32, 40, 1), np.float32),
                              reward=1.0, done=hit,
                              to_goal=np.zeros(4, np.float32), target=hit)

    out = FleetRunner([ClockedEnv()],
                      lambda o, g: np.asarray(act(o[None], g[None]))[0],
                      cfg).run(1)
    assert out["successes"] == 1
    assert out["durations"] == [pytest.approx(0.75)]  # NOT 3 * 0.1


def test_fleet_transition_stream(actor_setup):
    """on_transition: the fleet as a multi-robot experience collector
    (demo-npz row layout, demonstration.py:237-245)."""
    cfg, act = actor_setup
    n = 3
    rows = []  # list.append is atomic under the GIL — thread-safe consumer
    runner = FleetRunner(
        _kin_envs(n),
        lambda o, g: np.asarray(act(o[None], g[None]))[0], cfg,
        on_transition=lambda *tr: rows.append(tr))
    out = runner.run(episodes_per_robot=1)

    assert {r[0] for r in rows} == set(range(n))  # every robot contributed
    for robot, obs, a, goal, rew, nobs, ngoal, done in rows:
        assert obs.shape == nobs.shape == (32, 40)
        assert a.shape == (2,) and np.all(np.abs(a) <= cfg.env.max_action)
        assert goal.shape == ngoal.shape == (4,)
        assert np.isfinite(rew) and isinstance(done, bool)
    # one terminal row per completed episode that ended via done
    per_robot_last = {r[0]: r for r in rows}
    assert sum(r[-1] for r in per_robot_last.values()) <= out["episodes"]


def test_evaluate_fleet_mode(actor_setup, tmp_path):
    """run_eval_fleet + the dgvit-test --fleet CLI: the evaluation protocol
    split across concurrent robots sharing one batching server."""
    import yaml

    from dgvit_tpu.core import checkpoint as ckpt
    from dgvit_tpu.train import evaluate

    cfg, _ = actor_setup
    cfg.env.max_steps = 10
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(1), np.zeros((1, 32, 40)),
                        np.zeros((1, 2)))["params"]
    out = evaluate.run_eval_fleet(cfg, params, max_episodes=4, n_robots=2,
                                  out_dir=str(tmp_path))
    assert 0.0 <= out["success_rate"] <= 1.0
    assert out["serving"]["rows"] >= 4  # at least one step per episode
    assert (tmp_path / "testing_data.txt").exists()

    with pytest.raises(ValueError, match="divide evenly"):
        evaluate.run_eval_fleet(cfg, params, max_episodes=5, n_robots=2,
                                out_dir=str(tmp_path))

    # CLI path
    npz = ckpt.save_params_npz(str(tmp_path), "fleet_test", params)
    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(yaml.safe_dump(cfg.to_dict()))
    out_dir = tmp_path / "cli"
    evaluate.main(["--actor", npz, "--config", str(cfg_yaml),
                   "--episodes", "4", "--fleet", "2", "--out", str(out_dir)])
    assert (out_dir / "testing_data.txt").exists()
    with pytest.raises(SystemExit):  # host-loop only
        evaluate.main(["--actor", npz, "--config", str(cfg_yaml),
                       "--fleet", "2", "--vec-eval"])


@pytest.fixture()
def ros2(monkeypatch):
    world = fake_ros2.install()
    import time as _time
    monkeypatch.setattr(_time, "sleep", lambda s: None)
    from dgvit_tpu.envs import ros2_adapter
    assert ros2_adapter.HAS_ROS2
    yield ros2_adapter, world
    fake_ros2.uninstall()


def _prime_robot(world, ns, x=0.0, y=0.0):
    rng = np.random.default_rng(abs(hash(ns)) % 2**31)
    img = rng.uniform(0.1, 8.0, (64, 80)).astype(np.float32)
    world.deliver(f"{ns}/camera/depth/image_raw",
                  fake_ros2.Image(height=64, width=80, encoding="32FC1",
                                  data=img.tobytes()))
    world.deliver(f"{ns}/odom", fake_ros2.Odometry(x=x, y=y))
    world.deliver(f"{ns}/front_laser/scan",
                  fake_ros2.LaserScan([5.0] * 36))


def test_ros2_fleet_namespaced_and_free_running(ros2):
    from dgvit_tpu.serve.fleet import FleetRunner, make_ros2_fleet

    _, world = ros2
    cfg = fleet_cfg(max_steps=3)
    recs = [[{"xR": 0.0, "yR": 0.0, "xG": 3.0, "yG": 0.0}],
            [{"xR": 1.0, "yR": 1.0, "xG": -3.0, "yG": 0.0}]]
    envs = make_ros2_fleet(cfg, 2, records_per_robot=recs)
    # distinct nodes + topics per robot
    assert envs[0].node.name == "dgvit_env_robot0"
    assert envs[1].node.name == "dgvit_env_robot1"
    for i in range(2):
        _prime_robot(world, f"/robot{i}", x=float(i), y=float(i))

    out = FleetRunner(envs, lambda o, g: np.array([0.1, 0.0], np.float32),
                      cfg).run(episodes_per_robot=1)
    assert out["robots"] == 2 and out["episodes"] == 2

    # per-robot teleports hit per-robot Gazebo entities (robot threads reset
    # concurrently, so only the per-robot order is deterministic)
    names = [c.state.name for c in world.calls("gazebo/set_entity_state")]
    assert sorted(names) == ["scout0", "scout1",
                             "target_cone0", "target_cone1"]
    for i in range(2):
        assert names.index(f"scout{i}") < names.index(f"target_cone{i}")
    # commands went to the namespaced topics, 3 steps each
    assert len(world.twists("/robot0/cmd_vel")) >= 3  # steps + stop()
    assert len(world.twists("/robot1/cmd_vel")) >= 3
    assert not world.twists("/cmd_vel")  # nothing leaked to the global topic
    # free-running physics: the global pause/unpause gate is never touched
    assert not world.calls("/unpause_physics")
    assert not world.calls("/pause_physics")


def test_evaluate_fleet_ros2_env(ros2, monkeypatch, tmp_path):
    """run_eval_fleet(env_kind='ros2'): the evaluation protocol over
    namespaced live-Gazebo adapters (dgvit-test --fleet N --fleet-env ros2),
    exercised over fake rclpy."""
    import dgvit_tpu.serve as serve_pkg
    from dgvit_tpu.train import evaluate

    _, world = ros2
    # adapter output is the reference frame geometry (128x160); model must
    # match it, unlike the kinematic lanes which render any size
    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 16, "mlp_dim": 32,
                  "image_size": (128, 160), "patch_size": (64, 80)},
        "env": {"max_steps": 3, "vis_sensor": "depth_image"},
    })
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(0), np.zeros((1, 128, 160)),
                        np.zeros((1, 2)))["params"]

    real = serve_pkg.make_ros2_fleet

    def primed(c, n, **kw):
        recs = [[{"xR": 0.0, "yR": 0.0, "xG": 3.0, "yG": 0.0}]
                for _ in range(n)]
        envs = real(c, n, records_per_robot=recs, **kw)
        for i in range(n):
            _prime_robot(world, f"/robot{i}")
        return envs

    monkeypatch.setattr(serve_pkg, "make_ros2_fleet", primed)
    out = evaluate.run_eval_fleet(cfg, params, max_episodes=2, n_robots=2,
                                  out_dir=str(tmp_path), env_kind="ros2")
    assert out["serving"]["rows"] >= 2  # robot actions rode the server
    assert world.twists("/robot0/cmd_vel") and world.twists("/robot1/cmd_vel")
    assert not world.calls("/unpause_physics")  # free-running fleet physics


def test_ros2_single_robot_default_unchanged(ros2):
    """Default constructor args keep the reference single-robot contract
    (un-namespaced topics, 'scout' entity, managed pause/unpause)."""
    ros2_adapter, world = ros2
    cfg = Config.from_dict({"env": {"vis_sensor": "depth_image",
                                    "max_steps": 2}})
    env = ros2_adapter.GazeboRos2Env(
        cfg, position_records=[{"xR": 0, "yR": 0, "xG": 2, "yG": 2}])
    _prime_robot(world, "")
    env.reset()
    env.step([0.1, 0.0], 0)
    assert [c.state.name for c in world.calls("gazebo/set_entity_state")] == \
        ["scout", "target_cone"]
    assert world.twists("/cmd_vel")
    assert len(world.calls("/unpause_physics")) == 2  # reset + step
