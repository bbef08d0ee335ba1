"""Fully-fused on-device training loop: ring semantics + end-to-end rounds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvit_tpu.config import Config
from dgvit_tpu.train.fused_train import (ring_init, ring_load, ring_sample,
                                         ring_save, ring_write, train_fused)


def test_ring_wraparound_and_sampling():
    ring = ring_init(8, (4, 5), pdim=2)
    mk = lambda n, base: {
        "obs": np.full((n, 4, 5), base, np.float32),
        "act": np.full((n, 2), base, np.float32),
        "pobs": np.zeros((n, 2), np.float32),
        "next_pobs": np.zeros((n, 2), np.float32),
        "rew": np.arange(base, base + n, dtype=np.float32),
        "next_obs": np.zeros((n, 4, 5), np.float32),
        "done": np.zeros((n,), np.float32),
    }
    ring = ring_write(ring, {k: jnp.asarray(v) for k, v in mk(6, 0).items()})
    assert int(ring.cursor) == 6
    # second write wraps: rows 6,7 then 0,1
    ring = ring_write(ring, {k: jnp.asarray(v) for k, v in mk(4, 10).items()})
    assert int(ring.cursor) == 10
    rews = np.asarray(ring.rew)
    np.testing.assert_allclose(rews[6:8], [10, 11])
    np.testing.assert_allclose(rews[0:2], [12, 13])   # wrapped
    np.testing.assert_allclose(rews[2:6], [2, 3, 4, 5])  # untouched middle

    batch = ring_sample(ring, jax.random.PRNGKey(0), 16)
    assert batch["rew"].shape == (16, 1)
    assert batch["done"].shape == (16, 1)
    assert batch["obs"].shape == (16, 4, 5)
    # all sampled rewards are values actually present in the ring
    assert np.isin(np.asarray(batch["rew"])[:, 0], rews).all()


def test_sample_respects_partial_fill():
    ring = ring_init(64, (4, 5))
    rows = {
        "obs": jnp.ones((3, 4, 5)), "act": jnp.ones((3, 2)),
        "pobs": jnp.zeros((3, 2)), "next_pobs": jnp.zeros((3, 2)),
        "rew": jnp.asarray([7.0, 8.0, 9.0]), "next_obs": jnp.ones((3, 4, 5)),
        "done": jnp.zeros((3,)),
    }
    ring = ring_write(ring, rows)
    batch = ring_sample(ring, jax.random.PRNGKey(1), 32)
    # only the 3 valid rows may appear — never the zero-initialized tail
    assert np.isin(np.asarray(batch["rew"])[:, 0], [7.0, 8.0, 9.0]).all()


def test_ring_save_load_roundtrip(tmp_path):
    """Chunked device->host snapshot + restore is exact (chunk_rows smaller
    than the ring forces the multi-slice path)."""
    rng = np.random.default_rng(0)
    ring = ring_init(8, (4, 5), pdim=2)
    rows = {
        "obs": rng.normal(size=(6, 4, 5)).astype(np.float32),
        "act": rng.normal(size=(6, 2)).astype(np.float32),
        "pobs": rng.normal(size=(6, 2)).astype(np.float32),
        "next_pobs": rng.normal(size=(6, 2)).astype(np.float32),
        "rew": rng.normal(size=(6,)).astype(np.float32),
        "next_obs": rng.normal(size=(6, 4, 5)).astype(np.float32),
        "done": np.zeros((6,), np.float32),
    }
    ring = ring_write(ring, {k: jnp.asarray(v) for k, v in rows.items()})
    path = str(tmp_path / "ring.npz")
    ring_save(ring, path, chunk_rows=3)
    back = ring_load(path, ring_init(8, (4, 5), pdim=2))
    assert back is not None
    assert int(back.cursor) == 6
    for name in ring._fields:
        np.testing.assert_array_equal(np.asarray(getattr(back, name)),
                                      np.asarray(getattr(ring, name)))
    # geometry mismatch (different capacity / image size) -> None, not a
    # corrupt ring
    assert ring_load(path, ring_init(16, (4, 5), pdim=2)) is None
    assert ring_load(path, ring_init(8, (6, 5), pdim=2)) is None


def test_train_fused_warm_ring_resume(tmp_path):
    """--resume reloads ring_latest.npz: the resumed run's buffer picks up
    where the crashed run's left off instead of refilling from zero
    (VERDICT r3 weak #3 — warm-buffer fused restarts)."""
    import json

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 128},
        "env": {"max_steps": 4},
        "train": {"pre_buffer": False, "pre_train": False, "save": True},
    })
    out1 = train_fused(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                       rounds=2, rounds_per_dispatch=2, updates_per_round=1,
                       ring_capacity=64, ring_snapshot_every=1)
    snap = tmp_path / "checkpoints" / "ring_latest.npz"
    assert snap.exists()
    back = ring_load(str(snap), ring_init(64, (32, 40), pdim=2))
    assert int(back.cursor) == out1["env_steps"] == 24

    train_fused(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                rounds=4, rounds_per_dispatch=2, updates_per_round=1,
                ring_capacity=64, resume=True, ring_snapshot_every=1)
    jsonl = next(tmp_path.glob("train_fused_*.jsonl"))
    rows = [json.loads(ln) for ln in jsonl.read_text().splitlines() if ln]
    by_round = {r["step"]: r for r in rows}
    # round 3 = first round after resume: 24 warm + 12 fresh rows stored
    assert by_round[3]["buffer"] == 36.0  # cold resume would read 12
    # a mismatched geometry falls back to a cold ring instead of crashing
    out3 = train_fused(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                       rounds=5, rounds_per_dispatch=1, updates_per_round=1,
                       ring_capacity=32, resume=True)
    assert out3["rounds"] == 5


def test_train_fused_warm_ring_resume_per(tmp_path):
    """Warm resume under on-device PER: reloaded rows come back at max
    priority (cpprb load_transitions semantics) and sampling works."""
    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 128,
                "prioritized_replay": True},
        "env": {"max_steps": 4},
        "train": {"pre_buffer": False, "pre_train": False, "save": True},
    })
    out1 = train_fused(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                       rounds=1, rounds_per_dispatch=1, updates_per_round=1,
                       ring_capacity=64, ring_snapshot_every=1)
    assert (tmp_path / "checkpoints" / "ring_latest.npz").exists()
    out2 = train_fused(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                       rounds=2, rounds_per_dispatch=1, updates_per_round=1,
                       ring_capacity=64, resume=True, ring_snapshot_every=0)
    assert out2["rounds"] == 2
    assert int(out2["state"].itera) > int(out1["state"].itera)


@pytest.mark.slow
def test_shardmap_fused_round():
    """The ENTIRE fused loop (collect -> sharded replay ring -> pmean'd
    updates) under the 8-device data mesh: distributed RL training with zero
    host involvement per round."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from dgvit_tpu.agents.sac import SACAgent
    from dgvit_tpu.core.mesh import MeshRuntime
    from dgvit_tpu.envs.jax_kinematic import make_consts
    from dgvit_tpu.parallel.shard import shardmap_fused_round

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 8},
    })
    agent = SACAgent(cfg, grad_axis="data")
    consts = make_consts(world="rrc", image_hw=(32, 40), max_steps=6)
    run, init = shardmap_fused_round(
        agent, MeshRuntime.create(data=8), consts, n_envs=8, chunk=6,
        updates_per_round=2, batch_size=8, ring_capacity=128,
        l_scale=0.25, a_scale=1.0)
    state = agent.init_state(0)
    env_carry, ring = init((32, 40))
    state, env_carry, ring, stats = run(state, env_carry, ring,
                                        jax.random.PRNGKey(0),
                                        jnp.arange(3))
    # 1 lane/device x 6 steps/round fills each local ring past the local
    # batch (1) in round 1 -> 2 updates per round from the start
    assert int(state.itera) == 6
    host = {k: np.asarray(v) for k, v in stats.items()}
    for k in ("qf1_loss", "policy_loss", "alpha", "reward_sum"):
        assert np.isfinite(host[k]).all(), k
    # buffer stat is mesh-global: 8 devices x 6 rows after round 1
    assert int(host["buffer"][0]) == 48
    assert int(host["buffer"][2]) == 8 * min(18, 128 // 8)


@pytest.mark.slow
def test_train_fused_channels(tmp_path):
    """Channels-mode (frame-stacked) actors through the fused loop: the
    ring stores (C, H, W) stacks, collection carries the in-graph stack."""
    from dgvit_tpu.config import Config
    from dgvit_tpu.train.fused_train import train_fused

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20),
                  "patch_mode": "channels"},
        "sac": {"batch_size": 4, "buffer_size": 128},
        "env": {"max_steps": 8, "use_frame_stack": True, "frame_stack": 2},
        "train": {"pre_buffer": False, "pre_train": False},
    })
    out = train_fused(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                      rounds=3, rounds_per_dispatch=3, updates_per_round=1,
                      ring_capacity=64)
    assert out["rounds"] == 3
    assert out["updates"] >= 2


def test_train_fused_max_episodes(tmp_path):
    """max_episodes stops the run by episode count (the reference's
    MAX_EPISODES protocol, config.yaml:10) rather than round budget."""
    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 128},
        "env": {"max_steps": 4},   # lanes finish an episode every <=4 steps
        "train": {"pre_buffer": False, "pre_train": False, "save": False},
    })
    out = train_fused(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                      rounds=100, rounds_per_dispatch=2, updates_per_round=1,
                      ring_capacity=64, max_episodes=3)
    assert out["episodes"] >= 3
    assert out["rounds"] < 100   # stopped by the episode criterion


def _write_tiny_demos(path, n=24, hw=(32, 40)):
    """Synthesize a demo npz in the reference's recording schema
    (demonstration.py:237-245 keys; goal is (N, 4) polar+yaw)."""
    rng = np.random.default_rng(0)
    h, w = hw
    np.savez(path,
             obs=rng.uniform(0, 1, (n, h, w)).astype(np.float32),
             act=rng.uniform(-1, 1, (n, 2)).astype(np.float32),
             goal=rng.uniform(-1, 1, (n, 4)).astype(np.float32),
             reward=rng.normal(size=(n,)).astype(np.float32),
             next_obs=rng.uniform(0, 1, (n, h, w)).astype(np.float32),
             next_goal=rng.uniform(-1, 1, (n, 4)).astype(np.float32),
             done=np.zeros((n,), np.float32))


@pytest.mark.parametrize("per", [False, True])
def test_train_fused_expert_guidance(tmp_path, per):
    """The reference's PRE_BUFFER expert-guidance workflow (main.py:223-268,
    DRL.py:195-276) through the fused on-device loop: the demo corpus is
    staged to HBM once and every update runs the guided (or guided+PER)
    step with the dynamic n_expert = min(floor(N/stored*batch), batch)."""
    demo = tmp_path / "demo_bot_1.npz"
    _write_tiny_demos(str(demo))
    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 128,
                "prioritized_replay": per, "guidence_weight": 3.0},
        "env": {"max_steps": 8},
        "train": {"pre_buffer": True, "pre_train": False, "save": False},
    })
    out = train_fused(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                      rounds=3, rounds_per_dispatch=3, updates_per_round=2,
                      ring_capacity=64, expert_glob=str(tmp_path / "*.npz"))
    assert out["rounds"] == 3
    assert out["updates"] >= 4
    # the guided step ran: its metric keys landed in the JSONL
    import json as _json
    jsonl = [p for p in tmp_path.iterdir() if p.suffix == ".jsonl"]
    rows = [_json.loads(ln) for ln in jsonl[0].read_text().splitlines()]
    assert all(np.isfinite(r["qf1_loss"]) for r in rows)


def test_train_fused_resume(tmp_path):
    """resume=True restores the checkpointed train state AND the cumulative
    episode/goal counters from the JSONL, so a crashed run can continue
    toward the same MAX_EPISODES budget without restarting it."""
    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 128},
        "env": {"max_steps": 4},
        "train": {"pre_buffer": False, "pre_train": False, "save": True},
    })
    out1 = train_fused(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                       rounds=2, rounds_per_dispatch=2, updates_per_round=1,
                       ring_capacity=64)
    assert out1["rounds"] == 2 and out1["updates"] >= 2
    # "crash": relaunch with a larger budget and resume — counters continue
    out2 = train_fused(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                       rounds=4, rounds_per_dispatch=2, updates_per_round=1,
                       ring_capacity=64, resume=True)
    assert out2["rounds"] == 4                      # 2 resumed + 2 new
    assert out2["episodes"] >= out1["episodes"]     # cumulative, not reset
    assert int(out2["state"].itera) > int(out1["state"].itera)


@pytest.mark.slow
def test_train_fused_end_to_end(tmp_path):
    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 128},
        "env": {"max_steps": 10},
        "train": {"pre_buffer": False, "pre_train": False},
    })
    out = train_fused(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                      rounds=4, rounds_per_dispatch=2, updates_per_round=2,
                      ring_capacity=64)
    assert out["rounds"] == 4
    assert out["env_steps"] == 4 * 2 * 6
    # first round fills the ring past batch_size, so >= 3 rounds update
    assert out["updates"] >= 6
    assert list(tmp_path.glob("train_fused_*.jsonl"))
    assert list((tmp_path / "checkpoints").glob("step_*"))


def test_dead_run_detector_aborts(tmp_path):
    """Once nan_guard freezes a diverged state, the fused host loop stops
    instead of burning the whole round budget (the round-4 drr_rand8
    collapse ran 120+ dead rounds). lr=1e12 diverges immediately: params
    blow up on update 1, every later update is nonfinite and rolls back."""
    from dgvit_tpu.config import Config
    from dgvit_tpu.train.fused_train import train_fused

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 128, "nan_guard": True,
                "lr_critic": 1e12, "lr_actor": 1e12},
        "env": {"max_steps": 8},
        "train": {"pre_buffer": False, "pre_train": False, "save": False},
    })
    out = train_fused(cfg, out_dir=str(tmp_path), n_envs=4, chunk=8,
                      rounds=40, rounds_per_dispatch=2, updates_per_round=2,
                      ring_capacity=64, dead_segments_abort=2)
    assert out["aborted_dead"] is True
    assert out["rounds"] < 40      # stopped well short of the budget
