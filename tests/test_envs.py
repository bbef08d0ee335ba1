"""Env layer tests: reward golden cases, polar-goal math vs the reference's
literal formulas, laser binning, replay env, kinematic rollouts
(SURVEY.md §4 'reward function (golden cases)', 'polar-goal math')."""

import math

import numpy as np
import pytest

from dgvit_tpu.envs import KinematicNavEnv, ReplayEnv
from dgvit_tpu.envs import reward as R
from dgvit_tpu.envs.kinematic import default_records


# --- reference-literal oracles (transcribed formulas, numpy) ---------------

def ref_heading(odomX, odomY, goalX, goalY, angle):
    """env_lab.py:231-250 verbatim in numpy."""
    skewX = goalX - odomX
    skewY = goalY - odomY
    dot = skewX * 1 + skewY * 0
    mag1 = math.sqrt(skewX ** 2 + skewY ** 2)
    beta = math.acos(dot / (mag1 * 1.0))
    if skewY < 0:
        beta = -beta
    beta2 = beta - angle
    if beta2 > np.pi:
        beta2 = np.pi - beta2
        beta2 = -np.pi - beta2
    if beta2 < -np.pi:
        beta2 = -np.pi - beta2
        beta2 = np.pi - beta2
    return beta2


def test_heading_error_matches_reference_formula():
    rng = np.random.default_rng(0)
    for _ in range(200):
        ox, oy = rng.uniform(-5, 5, 2)
        gx, gy = rng.uniform(-5, 5, 2)
        if math.hypot(ox - gx, oy - gy) < 1e-3:
            continue
        ang = rng.uniform(-np.pi, np.pi)
        ours = float(R.heading_error(ox, oy, gx, gy, ang))
        ref = ref_heading(ox, oy, gx, gy, ang)
        # jnp runs fp32; the reference math.* path is fp64
        assert abs(ours - ref) < 1e-5, (ox, oy, gx, gy, ang)


def test_polar_goal_normalization():
    tg = np.asarray(R.polar_goal(0.0, 0.0, 30.0, 0.0, 0.0, 0.5, -0.5))
    assert tg[0] == 1.0          # clipped at 15 m (env_lab.py:296)
    assert tg[1] == 0.0          # dead ahead
    assert tg[2] == 0.5 and tg[3] == -0.5


def test_quaternion_yaw():
    # 90-degree yaw: q = (w=cos45, z=sin45)
    yaw = float(R.quaternion_yaw(math.cos(math.pi / 4), 0, 0,
                                 math.sin(math.pi / 4)))
    assert abs(yaw - math.pi / 2) < 1e-3


def test_reward_golden_cases():
    # approach: 0.1 m closer -> +2
    out = R.step_reward(1.0, 0.9, False, 0.2, 0.0)
    assert abs(float(out.reward) - 2.0) < 1e-5
    assert not bool(out.done)

    # goal reached: +200 + heuristic, done+target, r_arret computed not added
    out = R.step_reward(0.6, 0.4, False, 0.25, 0.1)
    assert abs(float(out.reward) - (200.0 + 4.0)) < 1e-4
    assert bool(out.done) and bool(out.target)
    expected_arret = 50.0 * (2.0 - 0.1) * (1.0 - 0.25)
    assert abs(float(out.r_arret) - expected_arret) < 1e-4

    # collision: -100 + heuristic, done, no target
    out = R.step_reward(1.0, 1.05, True, 0.2, 0.0)
    assert abs(float(out.reward) - (-100.0 - 1.0)) < 1e-4
    assert bool(out.done) and not bool(out.target)

    # clip at +500 (env_lab.py:301)
    out = R.step_reward(40.0, 0.4, False, 0.0, 0.0)
    assert float(out.reward) == 500.0
    # clip at -200
    out = R.step_reward(0.0, 10.0, True, 0.0, 0.0)
    assert float(out.reward) == -200.0


def test_laser_collision():
    ranges = np.array([5.0, 3.0, 0.15, 8.0], np.float32)
    col, mn = R.laser_collision(ranges)
    assert bool(col) and abs(float(mn) - 0.15) < 1e-6
    col, _ = R.laser_collision(np.array([5.0, 0.0, 3.0], np.float32))
    assert not bool(col)  # zero ranges are ignored (env_lab.py:178)


def test_binning_matches_reference():
    import sys
    data = np.linspace(10, 1, 360).astype(np.float32)

    # reference utils.binning transcription (utils.py:92-98)
    def ref_binning(lower_bound, data, quantity):
        width = round(len(data) / quantity)
        quantity -= 1
        bins = []
        for low in range(lower_bound, lower_bound + quantity * width + 1, width):
            bins.append(min(data[low:low + width]))
        return np.array([bins])

    ours = np.asarray(R.binning(0, data, 20))
    ref = ref_binning(0, data, 20)
    assert ours.shape == ref.shape == (1, 20)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_replay_env_walks_logged_transitions():
    data = {
        "obs": np.random.rand(5, 128, 160, 4).astype(np.float32),
        "act": np.random.rand(5, 2).astype(np.float32),
        "goal": np.random.rand(5, 4).astype(np.float32),
        "reward": np.arange(5, dtype=np.float32),
        "next_obs": np.random.rand(5, 128, 160, 4).astype(np.float32),
        "next_goal": np.random.rand(5, 4).astype(np.float32),
        "done": np.array([0, 0, 0, 0, 1], bool),
    }
    env = ReplayEnv(data=data)
    r = env.reset()
    assert r.state.shape == (128, 160, 1)
    steps = 0
    done = False
    while not done:
        s = env.step([0.1, 0.0], steps)
        done = s.done
        steps += 1
    assert steps == 5
    assert len(env.divergence) == 5
    np.testing.assert_allclose(s.reward, 4.0)


def test_replay_env_real_corpus():
    import os
    path = "/root/reference/Data/Bachelor/Regragui_RGB_Image2/demo_bot_202.npz"
    if not os.path.exists(path):
        pytest.skip("reference data not mounted")
    env = ReplayEnv(glob_pattern=path)
    r = env.reset()
    assert r.state.shape == (128, 160, 1)
    s = env.step([0.0, 0.0], 0)
    assert np.isfinite(s.reward)


def test_kinematic_env_reaches_goal_with_scripted_policy():
    recs = [{"xR": 0.0, "yR": 0.0, "xG": 1.5, "yG": 0.0,
             "quaterZ": 0.0, "quaterW": 1.0, "distance": 1.5}]
    env = KinematicNavEnv(records=recs)
    r = env.reset()
    assert r.state.shape == (128, 160, 1)
    assert 0.0 <= r.state.min() and r.state.max() <= 1.0
    np.testing.assert_allclose(r.to_goal[0], 0.1, atol=1e-6)  # 1.5/15

    total = 0.0
    for t in range(40):
        s = env.step([0.5, 0.0], t)  # drive straight at the goal
        total += s.reward
        if s.done:
            break
    assert s.target, "straight drive must reach the goal"
    assert total > 200.0  # goal bonus + positive heuristic


def test_kinematic_env_collision():
    # start facing the big right-side box (3.6 < x < 5.5)
    recs = [{"xR": 3.0, "yR": 0.0, "xG": -4.7, "yG": 1.0,
             "quaterZ": 0.0, "quaterW": 1.0, "distance": 7.7}]
    env = KinematicNavEnv(records=recs)
    env.reset()
    done = False
    rew = 0.0
    for t in range(60):
        s = env.step([0.5, 0.0], t)  # drive into the wall
        rew = s.reward
        if s.done:
            break
    assert s.done and not s.target
    assert rew <= -90.0  # collision penalty dominates
    assert env.collision == 1


def test_default_records_respect_obstacles():
    for rec in default_records(16, seed=3):
        assert R.check_pos(rec["xR"], rec["yR"])
        assert R.check_pos(rec["xG"], rec["yG"])
        assert rec["distance"] >= 1.0


# ---------------------------------------------------------------------------
# world presets (round 2: unseen-layout generalization, hospital.world)
# ---------------------------------------------------------------------------

def test_world_presets_registry():
    from dgvit_tpu.envs.worlds import RRC, HOSPITAL, get_world

    assert get_world("rrc") is RRC
    assert get_world("hospital") is HOSPITAL
    import pytest as _pytest
    with _pytest.raises(KeyError, match="unknown world"):
        get_world("moonbase")
    # hospital boxes must all lie inside its arena
    ax0, ax1, ay0, ay1 = HOSPITAL.arena
    for x0, x1, y0, y1 in HOSPITAL.boxes:
        assert ax0 <= x0 < x1 <= ax1 and ay0 <= y0 < y1 <= ay1


def test_hospital_env_runs_and_differs_from_rrc():
    from dgvit_tpu.envs.kinematic import KinematicNavEnv, default_records
    from dgvit_tpu.envs.worlds import HOSPITAL

    env = KinematicNavEnv(seed=3, image_hw=(32, 40), world="hospital")
    r = env.reset()
    assert r.state.shape == (32, 40, 1)
    s = env.step([0.3, 0.0], 0)
    assert np.isfinite(s.reward)
    # records respect the hospital obstacles
    for rec in default_records(n=16, seed=1, world=HOSPITAL):
        for x0, x1, y0, y1 in HOSPITAL.boxes:
            assert not (x0 <= rec["xR"] <= x1 and y0 <= rec["yR"] <= y1)
            assert not (x0 <= rec["xG"] <= x1 and y0 <= rec["yG"] <= y1)
    # different geometry -> different depth images from the same pose
    env_rrc = KinematicNavEnv(seed=3, image_hw=(32, 40))
    env.x = env_rrc.x = 0.0
    env.y = env_rrc.y = -3.0
    env.theta = env_rrc.theta = 1.57
    assert not np.allclose(env._depth_image(), env_rrc._depth_image())


def _scalar_default_records(n, seed, clearance=0.4, world=None):
    """The pre-vectorization scalar sampler, kept verbatim as the oracle for
    test_default_records_bitexact_vs_scalar."""
    import math
    from dgvit_tpu.envs.kinematic import BOXES, ARENA, _box_clearance

    rng = np.random.default_rng(seed)
    if world is None or world.name == "rrc":
        boxes, arena = BOXES, ARENA
        free = lambda x, y: R.check_pos(x, y)  # noqa: E731
    else:
        boxes, arena = list(world.boxes), world.arena

        def free(x, y):
            return not any(x0 <= x <= x1 and y0 <= y <= y1
                           for x0, x1, y0, y1 in boxes)
    lo_x, hi_x = arena[0] + 0.4, arena[1] - 0.4
    lo_y, hi_y = arena[2] + 0.4, arena[3] - 0.4
    recs = []
    while len(recs) < n:
        xR, yR = rng.uniform(lo_x, hi_x), rng.uniform(lo_y, hi_y)
        xG, yG = rng.uniform(lo_x, hi_x), rng.uniform(lo_y, hi_y)
        if not (free(xR, yR) and free(xG, yG)):
            continue
        if _box_clearance(xR, yR, boxes, arena) < clearance or \
                _box_clearance(xG, yG, boxes, arena) < clearance:
            continue
        d = math.hypot(xR - xG, yR - yG)
        if d < 1.0:
            continue
        recs.append({"xR": xR, "yR": yR, "xG": xG, "yG": yG,
                     "quaterZ": 0.0, "quaterW": 1.0, "distance": d})
    return recs


def test_default_records_bitexact_vs_scalar():
    """The block-vectorized sampler must reproduce the scalar rejection loop
    bit-for-bit: same PRNG stream consumption order (xR,yR,xG,yG per
    candidate), same acceptance predicates, for both world flavors."""
    from dgvit_tpu.envs.kinematic import default_records
    from dgvit_tpu.envs.worlds import HOSPITAL

    # one seed per world flavor; the scalar oracle's python check_pos loop
    # dominates (RRC acceptance is low), so the RRC case uses a small n —
    # every predicate path is crossed by the rejected candidates either way
    for world, seed, n in ((None, 0, 3), (HOSPITAL, 7, 8)):
        fast = default_records(n=n, seed=seed, world=world)
        slow = _scalar_default_records(n=n, seed=seed, world=world)
        assert fast == slow


def test_rrc_default_records_unchanged_by_world_refactor():
    from dgvit_tpu.envs.kinematic import default_records
    from dgvit_tpu.envs.worlds import RRC

    a = default_records(n=8, seed=5)
    b = default_records(n=8, seed=5, world=RRC)
    for ra, rb in zip(a, b):
        assert ra == rb
