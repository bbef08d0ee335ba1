"""On-device PER (replay/device_per.py): semantics pinned against the C++
buffer (replay/csrc/replay.cpp) that defines the contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvit_tpu.replay.device_per import (ALPHA, per_init, per_on_write,
                                         per_sample, per_update)


def test_write_and_update_semantics():
    per = per_init(8)
    assert float(per.max_p) == 1.0
    per = per_on_write(per, jnp.asarray([0, 1, 2]))
    np.testing.assert_allclose(np.asarray(per.prios)[:3], 1.0)  # 1.0**alpha
    # raising a row's raw priority raises the running max
    per = per_update(per, jnp.asarray([1]), jnp.asarray([5.0]))
    np.testing.assert_allclose(float(per.max_p), 5.0)
    np.testing.assert_allclose(np.asarray(per.prios)[1], 5.0 ** ALPHA,
                               rtol=1e-6)
    # subsequent writes inherit the new max (replay.cpp:127-130)
    per = per_on_write(per, jnp.asarray([3]))
    np.testing.assert_allclose(np.asarray(per.prios)[3], 5.0 ** ALPHA,
                               rtol=1e-6)


def test_sampling_proportional_and_excludes_empty():
    per = per_init(16)
    per = per_on_write(per, jnp.asarray([0, 1]))
    per = per_update(per, jnp.asarray([0, 1]),
                     jnp.asarray([9.0 ** (1 / ALPHA), 1.0]))
    idx, w = per_sample(per, jax.random.PRNGKey(0), 4000,
                        stored=jnp.int32(2))
    idx = np.asarray(idx)
    assert set(np.unique(idx)) <= {0, 1}      # empty slots never sampled
    frac0 = (idx == 0).mean()
    assert 0.85 < frac0 < 0.95                # ~0.9 by construction


def test_uniform_priorities_give_unit_weights():
    per = per_init(8)
    per = per_on_write(per, jnp.arange(5))
    _, w = per_sample(per, jax.random.PRNGKey(1), 64, stored=jnp.int32(5))
    np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-5)


def test_is_weights_match_cpp_buffer():
    """Device IS weights equal the C++ implementation's for the same
    priority vector (replay.cpp:143-160 formula)."""
    from dgvit_tpu.replay.buffer import PrioritizedReplayBuffer

    prios = np.asarray([0.5, 2.0, 7.0, 1.0], np.float64)
    host = PrioritizedReplayBuffer(
        8, {"x": {"shape": ()}}, seed=0)
    host.add(x=np.zeros(4, np.float32))
    host.update_priorities(np.arange(4), prios)
    # collect the host weight attached to each index
    host_w = {}
    for _ in range(200):
        out = host.sample(16, beta=0.4)
        for i, wi in zip(out["indexes"], out["weights"]):
            host_w[int(i)] = float(wi)
        if len(host_w) == 4:
            break
    assert len(host_w) == 4

    per = per_init(8)
    per = per_on_write(per, jnp.arange(4))
    per = per_update(per, jnp.arange(4), jnp.asarray(prios))
    idx, w = per_sample(per, jax.random.PRNGKey(2), 512,
                        stored=jnp.int32(4), beta=0.4)
    idx, w = np.asarray(idx), np.asarray(w)
    for i in range(4):
        got = w[idx == i]
        assert got.size, f"index {i} never sampled"
        np.testing.assert_allclose(got, host_w[i], rtol=1e-4,
                                   err_msg=f"index {i}")


@pytest.mark.slow
def test_shardmap_fused_round_prioritized():
    """Distributed fused loop with on-device PER: ring AND priority shards
    per device, running max pmax'd, IS-weighted updates pmean'd."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from dgvit_tpu.agents.sac import SACAgent
    from dgvit_tpu.config import Config
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
        l_scale=0.25, a_scale=1.0, prioritized=True)
    state = agent.init_state(0)
    env_carry, ring, per = init((32, 40))
    state, env_carry, ring, stats, per = run(
        state, env_carry, ring, jax.random.PRNGKey(0), jnp.arange(3), per)
    assert int(state.itera) == 6
    host = {k: np.asarray(v) for k, v in stats.items()}
    for k in ("qf1_loss", "policy_loss", "alpha", "reward_sum"):
        assert np.isfinite(host[k]).all(), k
    # priorities were actually updated away from the write-time default
    prios = np.asarray(per.prios)
    written = prios[prios > 0]
    assert written.size and not np.allclose(written, written[0])


@pytest.mark.slow
def test_train_fused_prioritized(tmp_path):
    from dgvit_tpu.config import Config
    from dgvit_tpu.train.fused_train import train_fused

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 128,
                "prioritized_replay": True},
        "env": {"max_steps": 10},
        "train": {"pre_buffer": False, "pre_train": False},
    })
    out = train_fused(cfg, out_dir=str(tmp_path), n_envs=2, chunk=6,
                      rounds=4, rounds_per_dispatch=2, updates_per_round=2,
                      ring_capacity=64)
    assert out["rounds"] == 4
    assert out["updates"] >= 6
    assert list(tmp_path.glob("train_fused_*.jsonl"))
