"""Sensor-fault transforms (envs/fault_aug.py) + training-time augmentation
(make_collect_fn(fault_knobs=...), train_fused(fault_knobs=...)).

The round-4 robustness sweeps (BENCH.md) showed structural dropout is the
one fault family neither world-diversity DR nor plain training absorbs —
augmentation feeds the faults into collection itself. The eval sweep path
shares perturb_obs, so its pairing/gating contract is pinned here too
(and end-to-end in test_jax_kinematic.py::test_vec_eval_sweep_matches_static).
"""

import numpy as np

import jax
import jax.numpy as jnp

from dgvit_tpu.config import Config
from dgvit_tpu.envs.fault_aug import KNOB_KEYS, knobs_array, perturb_obs


def test_zero_knobs_bit_identical():
    """0.0 knobs are where-gated to the EXACT clean frames (the sweep's
    clean point must equal a no-sweep eval bit-for-bit)."""
    obs = jax.random.uniform(jax.random.PRNGKey(0), (3, 16, 20))
    out = perturb_obs(obs, jax.random.PRNGKey(1), knobs_array({}))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(obs))
    # frame-stacked layout too
    obs4 = jax.random.uniform(jax.random.PRNGKey(2), (3, 4, 16, 20))
    out4 = perturb_obs(obs4, jax.random.PRNGKey(1), knobs_array({}))
    np.testing.assert_array_equal(np.asarray(out4), np.asarray(obs4))


def test_knobs_array_order_and_validation():
    k = knobs_array({"patch_occlusion": 0.25, "obs_noise": 0.1})
    assert k.shape == (5,)
    assert KNOB_KEYS.index("obs_noise") == 0
    np.testing.assert_allclose([float(k[0]), float(k[3])], [0.1, 0.25],
                               rtol=1e-6)
    import pytest
    with pytest.raises(AssertionError, match="unknown fault knobs"):
        knobs_array({"nope": 1.0})


def test_patch_zeroes_one_contiguous_rectangle():
    obs = jnp.ones((4, 32, 40))
    out = np.asarray(perturb_obs(obs, jax.random.PRNGKey(3),
                                 knobs_array({"patch_occlusion": 0.25})))
    for lane in out:
        zero_rows = np.flatnonzero((lane == 0).any(axis=1))
        zero_cols = np.flatnonzero((lane == 0).any(axis=0))
        # contiguous span in both axes, and the zero set is their product
        assert (np.diff(zero_rows) == 1).all()
        assert (np.diff(zero_cols) == 1).all()
        assert (lane[np.ix_(zero_rows, zero_cols)] == 0).all()
        area = zero_rows.size * zero_cols.size / lane.size
        assert 0.15 < area < 0.35  # ~25% +- rounding of the side lengths
    # full-frame patch blanks everything
    out1 = np.asarray(perturb_obs(obs, jax.random.PRNGKey(3),
                                  knobs_array({"patch_occlusion": 1.0})))
    assert (out1 == 0).all()


def test_greying_blends_toward_mid():
    obs = jnp.zeros((2, 8, 10))
    out = np.asarray(perturb_obs(obs, jax.random.PRNGKey(0),
                                 knobs_array({"greying": 0.6})))
    np.testing.assert_allclose(out, 0.3, rtol=1e-6)


def _tiny_cfg():
    return Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 128},
        "env": {"max_steps": 8},
        "train": {"pre_buffer": False, "pre_train": False, "save": False},
    })


def _collect_once(fault_knobs, aug_prob=1.0, seed=0):
    from dgvit_tpu.agents.sac import SACAgent
    from dgvit_tpu.envs.jax_kinematic import make_consts, vec_reset
    from dgvit_tpu.train.vec_rollout import make_collect_fn

    cfg = _tiny_cfg()
    agent = SACAgent(cfg)
    state = agent.init_state(seed)
    consts = make_consts(world="rrc", image_hw=(32, 40), max_steps=8)
    fn = jax.jit(make_collect_fn(
        agent, consts, chunk=6, l_scale=cfg.env.linear_cmd_scale,
        a_scale=cfg.env.angular_cmd_scale, fault_knobs=fault_knobs,
        aug_prob=aug_prob))
    carry = vec_reset(consts, 4)
    carry, traj = fn(state.actor_params, carry, jax.random.PRNGKey(seed))
    return {k: np.asarray(v) for k, v in traj.items()}


def test_collect_stores_perturbed_frames():
    """patch=1.0 blanks every stored obs/next_obs while the episode still
    advances (env dynamics see the true world, only the sensor is faulty)."""
    traj = _collect_once({"patch_occlusion": 1.0})
    assert (traj["obs"] == 0).all()
    assert (traj["next_obs"] == 0).all()
    assert np.isfinite(traj["rew"]).all()
    clean = _collect_once(None)
    assert (clean["obs"] != 0).any()


def test_aug_prob_zero_gates_everything():
    traj = _collect_once({"patch_occlusion": 1.0}, aug_prob=0.0)
    assert (traj["obs"] != 0).any()          # gate blocked the blanking
    assert (traj["next_obs"] != 0).any()


def test_aug_prob_mixes_clean_and_perturbed():
    traj = _collect_once({"greying": 1.0}, aug_prob=0.5, seed=1)
    rows = traj["obs"].reshape(-1, *traj["obs"].shape[2:])
    greyed = np.array([(np.abs(r - 0.5) < 1e-6).all() for r in rows])
    assert greyed.any() and not greyed.all()


def test_train_fused_with_aug(tmp_path):
    from dgvit_tpu.train.fused_train import train_fused

    out = train_fused(_tiny_cfg(), out_dir=str(tmp_path), n_envs=4, chunk=6,
                      rounds=2, rounds_per_dispatch=2, updates_per_round=1,
                      ring_capacity=64,
                      fault_knobs={"patch_occlusion": 0.25,
                                   "obs_noise": 0.1}, aug_prob=0.5)
    assert out["rounds"] == 2 and out["env_steps"] == 2 * 4 * 6


def test_fused_cli_parses_aug(tmp_path):
    import yaml

    from dgvit_tpu.train import fused_train

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": [32, 40], "patch_size": [16, 20]},
        "sac": {"batch_size": 4, "buffer_size": 128},
        "env": {"max_steps": 8},
        "train": {"pre_buffer": False, "pre_train": False, "save": False},
    }))
    fused_train.main([
        "--config", str(cfg_path),
        "--out", str(tmp_path), "--n-envs", "2", "--chunk", "4",
        "--rounds", "1", "--rounds-per-dispatch", "1",
        "--ring-capacity", "32",
        "--aug", "patch_occlusion=0.25", "--aug", "obs_noise=0.1",
        "--aug-prob", "0.5"])


def test_sharded_aug_decorrelates_across_devices():
    """Under shard_map the aug key folds in the device's axis index: each
    device must draw its OWN patch rectangles. Regression for the review
    finding that the replicated rng gave every device bit-identical fault
    realizations (the mesh rng arrives replicated; round_body splits it
    identically per device)."""
    import pytest
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from dgvit_tpu.agents.sac import SACAgent
    from dgvit_tpu.core.mesh import MeshRuntime
    from dgvit_tpu.envs.jax_kinematic import make_consts
    from dgvit_tpu.parallel.shard import shardmap_fused_round

    cfg = _tiny_cfg()
    agent = SACAgent(cfg, grad_axis="data")
    consts = make_consts(world="rrc", image_hw=(32, 40), max_steps=8)
    cap_per = 16
    run, init = shardmap_fused_round(
        agent, MeshRuntime.create(data=8), consts, n_envs=8, chunk=6,
        updates_per_round=1, batch_size=8, ring_capacity=cap_per * 8,
        l_scale=0.25, a_scale=1.0,
        fault_knobs={"patch_occlusion": 0.25})
    state = agent.init_state(0)
    env_carry, ring = init((32, 40))
    state, env_carry, ring, stats = run(
        state, env_carry, ring, jax.random.PRNGKey(0), jnp.arange(1))
    obs = np.asarray(ring.obs)          # (8*cap_per, 32, 40), shard-major
    # same written row index on different shards -> different rectangle.
    # Depth frames are strictly positive (cam_near/cam_far floor), so
    # exact zeros ARE the patch.
    masks = [(obs[d * cap_per] == 0) for d in range(8)]
    assert all(m.any() for m in masks)  # every device did perturb
    distinct = {m.tobytes() for m in masks}
    assert len(distinct) > 1, "all devices drew the same patch rectangle"
