"""Round-2 regression tests — VERDICT.md (round 1) items:

* BatchPrefetcher exception propagation (Weak #2)
* PER min-tree weight math after update_priorities (Weak #4)
* evaluate.py deterministic-actor action path (Weak #6)
* attention-freeze fine-tuning masks (Missing #3 / Next #4)
* ViT deterministic policy + backbone-aware factory (Missing #5 / Next #7)
"""

import numpy as np
import pytest

import jax

from dgvit_tpu.config import Config
from dgvit_tpu.replay import PrioritizedReplayBuffer, ReplayBuffer
from dgvit_tpu.replay.staging import BatchPrefetcher


# ---------------------------------------------------------------------------
# staging
# ---------------------------------------------------------------------------

def test_prefetcher_reraises_sampler_errors():
    def bad():
        raise ValueError("boom in sample_fn")

    pf = BatchPrefetcher(bad, depth=1)
    with pytest.raises(RuntimeError, match="sample_fn failed") as ei:
        next(pf)
    assert isinstance(ei.value.__cause__, ValueError)
    pf.close()


def test_prefetcher_normal_flow_still_iterates():
    calls = {"n": 0}

    def sample():
        calls["n"] += 1
        return {"x": np.full((2,), calls["n"], np.float32)}

    pf = BatchPrefetcher(sample, depth=2)
    a = next(pf)
    b = next(pf)
    assert np.asarray(a["x"]).shape == (2,)
    assert not np.array_equal(np.asarray(a["x"]), np.asarray(b["x"]))
    pf.close()


# ---------------------------------------------------------------------------
# PER min-tree
# ---------------------------------------------------------------------------

def test_per_weights_uniform_priorities_are_one():
    buf = PrioritizedReplayBuffer(8, {"x": {"shape": ()}}, seed=0)
    buf.add(x=np.arange(6, dtype=np.float32))
    out = buf.sample(64, beta=0.4)
    assert np.allclose(out["weights"], 1.0)


def test_per_min_tree_tracks_update_priorities():
    buf = PrioritizedReplayBuffer(8, {"x": {"shape": ()}}, seed=1)
    buf.add(x=np.arange(6, dtype=np.float32))
    # raise one item's priority: min stays at the old value, so the raised
    # item's IS weight must drop below 1 while min-priority items stay at 1
    buf.update_priorities(np.array([2]), np.array([5.0]))
    out = buf.sample(512, beta=1.0)
    w_hi = out["weights"][out["indexes"] == 2]
    w_lo = out["weights"][out["indexes"] != 2]
    assert len(w_hi) and np.all(w_hi < 1.0)
    assert np.allclose(w_lo, 1.0)
    # now drop an item BELOW everything: it becomes the new min (weight 1)
    # and every other item's weight falls below 1 — this is exactly what the
    # old O(stored) scan computed, now answered by the min-tree in O(1)
    buf.update_priorities(np.array([3]), np.array([0.1]))
    out = buf.sample(512, beta=1.0)
    w3 = out["weights"][out["indexes"] == 3]
    rest = out["weights"][out["indexes"] != 3]
    if len(w3):
        assert np.allclose(w3, 1.0)
    assert np.all(rest < 1.0)


def test_per_min_tree_overwrite_resets_priority():
    # ring overwrite must refresh both trees (new samples get max priority)
    buf = PrioritizedReplayBuffer(4, {"x": {"shape": ()}}, seed=2)
    buf.add(x=np.arange(4, dtype=np.float32))
    buf.update_priorities(np.array([1]), np.array([0.01]))
    # wrap the ring fully: every slot rewritten at max priority
    buf.add(x=np.arange(4, dtype=np.float32) + 10)
    out = buf.sample(64, beta=1.0)
    assert np.allclose(out["weights"], 1.0)


# ---------------------------------------------------------------------------
# factory / ViT deterministic policy
# ---------------------------------------------------------------------------

def test_actor_factory_backbone_aware():
    from dgvit_tpu.models.policies import (DeterministicGoTPolicy,
                                           DeterministicPolicy,
                                           GaussianPolicy, GoTPolicy,
                                           ViTDeterministicPolicy,
                                           ViTGaussianPolicy, build_actor)

    combos = [
        ("got", "GaussianTransformer", GoTPolicy),
        ("simple_vit", "GaussianTransformer", ViTGaussianPolicy),
        ("got", "DeterministicTransformer", DeterministicGoTPolicy),
        ("simple_vit", "DeterministicTransformer", ViTDeterministicPolicy),
        ("got", "GaussianConvNet", GaussianPolicy),
        ("got", "Deterministic", DeterministicPolicy),
    ]
    for backbone, actor_type, cls in combos:
        cfg = Config.from_dict(
            {"model": {"backbone": backbone, "actor_type": actor_type}})
        assert isinstance(build_actor(cfg), cls), (backbone, actor_type)


def test_critic_factory_backbone_aware():
    from dgvit_tpu.models.policies import (GoTQNetwork, QNetwork,
                                           ViTQNetwork, build_critic)

    for backbone, critic_type, cls in [
        ("got", "Transformer", GoTQNetwork),
        ("simple_vit", "Transformer", ViTQNetwork),
        ("got", "CNN", QNetwork),
    ]:
        cfg = Config.from_dict(
            {"model": {"backbone": backbone, "critic_type": critic_type}})
        assert isinstance(build_critic(cfg), cls), (backbone, critic_type)


def test_vit_deterministic_policy_shapes_and_bounds():
    from dgvit_tpu.models.policies import ViTDeterministicPolicy

    m = ViTDeterministicPolicy(dim=64, depth=1, heads=2, mlp_dim=32)
    obs = np.random.default_rng(0).normal(size=(3, 32, 40)).astype(np.float32)
    goal = np.zeros((3, 2), np.float32)
    params = m.init(jax.random.PRNGKey(0), obs, goal)["params"]
    act = m.apply({"params": params}, obs, goal)
    assert act.shape == (3, 2)
    assert np.all(np.abs(np.asarray(act)) <= 1.0)  # tanh-bounded
    # matches the reference layout: trans + fc_embed + fc1/fc2 + mean_linear
    assert set(params) == {"trans", "fc_embed", "fc1", "fc2", "mean_linear"}


# ---------------------------------------------------------------------------
# attention-freeze fine-tuning
# ---------------------------------------------------------------------------

def _tiny_cfg(extra_train=None):
    d = {
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 64},
    }
    if extra_train:
        d["train"] = extra_train
    return Config.from_dict(d)


def _tiny_batch(cfg, n=4, seed=0):
    rng = np.random.default_rng(seed)
    ih, iw = cfg.model.image_size
    f32 = lambda a: np.asarray(a, np.float32)
    return {
        "obs": f32(rng.normal(size=(n, ih, iw))),
        "pobs": f32(rng.normal(size=(n, 2))),
        "act": f32(rng.uniform(-1, 1, size=(n, 2))),
        "rew": f32(rng.normal(size=(n, 1))),
        "next_obs": f32(rng.normal(size=(n, ih, iw))),
        "next_pobs": f32(rng.normal(size=(n, 2))),
        "done": f32(np.zeros((n, 1))),
    }


def _flat_np(tree):
    return {jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_attention_fix_freezes_trunk_and_fc_embed():
    from dgvit_tpu.agents import SACAgent

    cfg = _tiny_cfg({"policy_attention_fix": True,
                     "critic_attention_fix": True})
    agent = SACAgent(cfg)
    state = agent.init_state(0)
    before_a = _flat_np(state.actor_params)
    before_c = _flat_np(state.critic_params)
    state, _ = agent.learn(state, _tiny_batch(cfg))
    after_a = _flat_np(state.actor_params)
    after_c = _flat_np(state.critic_params)

    for name, (before, after) in {"actor": (before_a, after_a),
                                  "critic": (before_c, after_c)}.items():
        frozen = [k for k in before
                  if k.startswith("['trans']") or k.startswith("['fc_embed']")]
        trained = [k for k in before if k not in frozen]
        assert frozen and trained
        for k in frozen:  # DRL.py:107-110,144-149: trunk+fc_embed not in Adam
            np.testing.assert_array_equal(before[k], after[k],
                                          err_msg=f"{name}{k} moved")
        moved = [k for k in trained
                 if not np.array_equal(before[k], after[k])]
        assert moved, f"{name} head layers did not train"


def test_attention_fix_off_trains_trunk():
    from dgvit_tpu.agents import SACAgent

    cfg = _tiny_cfg()
    agent = SACAgent(cfg)
    state = agent.init_state(0)
    before = _flat_np(state.actor_params)
    state, _ = agent.learn(state, _tiny_batch(cfg))
    after = _flat_np(state.actor_params)
    trans_moved = [k for k in before if k.startswith("['trans']")
                   and not np.array_equal(before[k], after[k])]
    assert trans_moved, "trunk should train when the fix flag is off"


def test_compute_dtype_config_drives_agent_dtype():
    """model.compute_dtype='bfloat16' must reach the model modules (it was a
    dead knob before round 2)."""
    import jax.numpy as jnp

    from dgvit_tpu.agents import SACAgent

    cfg = _tiny_cfg()
    cfg.model.compute_dtype = "bfloat16"
    agent = SACAgent(cfg)
    assert agent.actor.dtype == jnp.bfloat16
    assert agent.critic.dtype == jnp.bfloat16
    # params still fp32 (mixed precision: bf16 compute, fp32 master weights)
    state = agent.init_state(0)
    leaf = jax.tree_util.tree_leaves(state.actor_params)[0]
    assert leaf.dtype == jnp.float32
    # default stays fp32
    assert SACAgent(_tiny_cfg()).actor.dtype is None
