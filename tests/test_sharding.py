"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4
'Distributed'): mesh construction, TP param layout, and the invariant that a
data+model-sharded train step computes the SAME update as single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvit_tpu.agents import SACAgent
from dgvit_tpu.config import Config
from dgvit_tpu.core.mesh import AXIS_DATA, AXIS_MODEL, MeshRuntime, make_mesh
from dgvit_tpu.parallel import shard_batch, shard_sac_state, sharded_learn


pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")]


def tiny_cfg(batch=16):
    return Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 256,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": batch},
    })


def make_batch(key, b=16, hw=(32, 40)):
    ks = jax.random.split(key, 6)
    return {
        "obs": jax.random.uniform(ks[0], (b,) + hw),
        "act": jax.random.uniform(ks[1], (b, 2), minval=-1, maxval=1),
        "pobs": jax.random.uniform(ks[2], (b, 2)),
        "next_pobs": jax.random.uniform(ks[3], (b, 2)),
        "rew": jax.random.normal(ks[4], (b, 1)),
        "next_obs": jax.random.uniform(ks[5], (b,) + hw),
        "engage": jnp.zeros((b, 1)),
        "done": jnp.zeros((b, 1)),
    }


def test_mesh_construction():
    m = make_mesh(data=4, model=2)
    assert m.shape[AXIS_DATA] == 4 and m.shape[AXIS_MODEL] == 2
    m = make_mesh()  # all devices on data
    assert m.shape[AXIS_DATA] == jax.device_count()


def test_tp_param_sharding_targets_mlp():
    runtime = MeshRuntime.create(data=4, model=2)
    agent = SACAgent(tiny_cfg())
    params = agent.init_state(0).actor_params
    sh = runtime.param_sharding(params)
    up = sh["trans"]["transformer"]["block_0"]["ff"]["fc1"]["kernel"]
    down = sh["trans"]["transformer"]["block_0"]["ff"]["fc2"]["kernel"]
    assert up.spec == jax.sharding.PartitionSpec(None, AXIS_MODEL)
    assert down.spec == jax.sharding.PartitionSpec(AXIS_MODEL, None)
    # small heads stay replicated
    assert sh["fc1"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_tp_param_sharding_flagship_got_tree():
    """Pin param_sharding's output on the FLAGSHIP GoT actor+critic trees
    (dim 64, mlp 2048, got_sac_network.py:176-185) so a param-path rename
    can't silently de-shard TP (core/mesh.py:126-137 matches by name)."""
    from dgvit_tpu.config import Config

    P = jax.sharding.PartitionSpec
    runtime = MeshRuntime.create(data=4, model=2)
    agent = SACAgent(Config())  # flagship geometry
    state = agent.init_state(0)

    for params, trunk in ((state.actor_params, "trans"),
                          (state.critic_params, "trans")):
        for blk in range(4):
            b = runtime.param_sharding(params)[trunk]["transformer"][f"block_{blk}"]
            # Megatron column/row pair over the 64->2048->64 MLP
            assert b["ff"]["fc1"]["kernel"].spec == P(None, AXIS_MODEL), blk
            assert b["ff"]["fc2"]["kernel"].spec == P(AXIS_MODEL, None), blk
            # attention: qkv column-parallel (64 -> 3*256), out row-parallel
            assert b["attn"]["to_qkv"]["kernel"].spec == P(None, AXIS_MODEL)
            assert b["attn"]["to_out"]["kernel"].spec == P(AXIS_MODEL, None)
    sh_a = runtime.param_sharding(state.actor_params)
    # heads/embeds replicated: fc1/fc2 (64/128-dim MLP heads), fc_embed,
    # patch_embed (320->64), mean/log_std
    for name in ("fc1", "fc2", "fc_embed", "mean_linear", "log_std_linear"):
        assert sh_a[name]["kernel"].spec == P(), name
    assert sh_a[trunk := "trans"]["patch_embed"]["kernel"].spec == P()
    # twin critic heads replicated
    sh_c = runtime.param_sharding(state.critic_params)
    for name in ("fc1", "fc11", "fc3", "fc31"):
        assert sh_c[name]["kernel"].spec == P(), name


def test_sharded_step_matches_single_device():
    cfg = tiny_cfg()
    batch = make_batch(jax.random.PRNGKey(0))

    # single device
    agent1 = SACAgent(cfg)
    s1 = agent1.init_state(3)
    s1b = jax.tree_util.tree_map(np.asarray, s1)  # pre-donation snapshot
    s1, m1 = agent1.learn(s1, batch)
    m1 = {k: float(v) for k, v in m1.items()}
    a1 = jax.tree_util.tree_map(np.asarray, s1.actor_params)

    # 4x2 data x model mesh
    runtime = MeshRuntime.create(data=4, model=2)
    agent2 = SACAgent(cfg)
    s2 = shard_sac_state(runtime, agent2.init_state(3))
    learn = sharded_learn(agent2, runtime)
    s2, m2 = learn(s2, shard_batch(runtime, batch))
    m2 = {k: float(v) for k, v in m2.items()}
    a2 = jax.tree_util.tree_map(np.asarray, s2.actor_params)

    for k in m1:
        assert m1[k] == pytest.approx(m2[k], rel=2e-4, abs=2e-5), k
    flat1 = jax.tree_util.tree_leaves(a1)
    flat2 = jax.tree_util.tree_leaves(a2)
    for x, y in zip(flat1, flat2):
        np.testing.assert_allclose(x, y, atol=5e-6, rtol=1e-4)


def test_data_only_mesh_runs():
    runtime = MeshRuntime.create()  # data=8
    agent = SACAgent(tiny_cfg(batch=8))
    state = shard_sac_state(runtime, agent.init_state(0))
    learn = sharded_learn(agent, runtime)
    state, metrics = learn(state, shard_batch(runtime, make_batch(
        jax.random.PRNGKey(1), b=8)))
    assert np.isfinite(float(metrics["policy_loss"]))


def test_seq_sharded_vit_matches_local():
    """model.seq_shard=True routes attention through parallel/ring_attention
    under an active seq>1 mesh; output must equal the local (unsharded)
    forward (ring softmax is streamed, not approximated)."""
    import numpy as np

    from dgvit_tpu.core.mesh import MeshRuntime, use_mesh
    from dgvit_tpu.models.policies import ViTGaussianPolicy

    obs = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 40))
    goal = jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    local = ViTGaussianPolicy(dim=32, depth=1, heads=2, mlp_dim=64,
                              seq_shard=False)
    ring = ViTGaussianPolicy(dim=32, depth=1, heads=2, mlp_dim=64,
                             seq_shard=True)
    params = local.init(jax.random.PRNGKey(2), obs, goal)["params"]
    m_ref, ls_ref = local.apply({"params": params}, obs, goal)

    runtime = MeshRuntime.create(data=2, model=2, seq=2)
    with use_mesh(runtime.mesh):
        m_ring, ls_ring = jax.jit(
            lambda p, o, g: ring.apply({"params": p}, o, g))(params, obs, goal)
    np.testing.assert_allclose(np.asarray(m_ring), np.asarray(m_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ls_ring), np.asarray(ls_ref),
                               atol=1e-5, rtol=1e-5)


def test_seq_shard_falls_back_when_tokens_indivisible():
    """GoT has 65 tokens (goal CLS + 64 patches) — not divisible by seq=2;
    seq_shard must silently fall back to local attention, same output."""
    import numpy as np

    from dgvit_tpu.core.mesh import MeshRuntime, use_mesh
    from dgvit_tpu.models.policies import GoTPolicy

    obs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 40))
    goal = jax.random.normal(jax.random.PRNGKey(1), (2, 2))
    kw = dict(block=1, head=2, l_f_size=32, mlp_dim=64,
              image_size=(32, 40), patch_size=(16, 20), emb_dropout=0.0)
    local = GoTPolicy(seq_shard=False, **kw)
    ring = GoTPolicy(seq_shard=True, **kw)
    params = local.init(jax.random.PRNGKey(2), obs, goal)["params"]
    m_ref, _ = local.apply({"params": params}, obs, goal)
    runtime = MeshRuntime.create(data=2, model=2, seq=2)
    with use_mesh(runtime.mesh):
        m_ring, _ = ring.apply({"params": params}, obs, goal)
    np.testing.assert_allclose(np.asarray(m_ring), np.asarray(m_ref),
                               atol=1e-6)
