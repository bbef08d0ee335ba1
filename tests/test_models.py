"""Unit tests: shapes, goal-token insertion, patch embedding, norms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvit_tpu.models import (
    GoT,
    GoTPolicy,
    GoTQNetwork,
    GaussianPolicy,
    QNetwork,
    DeterministicPolicy,
    DeterministicGoTPolicy,
    SimpleViT,
)
from dgvit_tpu.models.got import patchify_2d, patchify_channels
from dgvit_tpu.models.policies import ViTGaussianPolicy, ViTQNetwork


def test_patchify_2d_matches_einops_semantics():
    # 'b (h p1) (w p2) -> b (h w) (p1 p2)' with p1=16, p2=20 (GoalFormer.py:138)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 128, 160)).astype(np.float32)
    out = np.asarray(patchify_2d(jnp.asarray(img), 16, 20))
    assert out.shape == (2, 64, 320)
    # patch (h_idx=1, w_idx=2) should equal the raw 16x20 tile flattened row-major
    tile = img[1, 16:32, 40:60].reshape(-1)
    np.testing.assert_allclose(out[1, 1 * 8 + 2], tile)


def test_patchify_channels_matches_einops_semantics():
    # 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)' (Imitation_learning.py:118-121)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 4, 128, 160)).astype(np.float32)
    out = np.asarray(patchify_channels(jnp.asarray(img), 16, 20))
    assert out.shape == (2, 64, 320 * 4)
    tile = img[0, :, 0:16, 0:20]  # (c, p1, p2)
    expect = tile.transpose(1, 2, 0).reshape(-1)  # (p1 p2 c) ordering
    np.testing.assert_allclose(out[0, 0], expect)


def test_got_forward_shape_and_goal_token():
    model = GoT(dim=64, depth=2, heads=4, mlp_dim=128)
    img = jnp.zeros((3, 128, 160))
    goal = jnp.ones((3, 64))
    params = model.init(jax.random.PRNGKey(0), img, goal)
    out = model.apply(params, img, goal)
    assert out.shape == (3, 64)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_got_policy_and_critic_shapes():
    policy = GoTPolicy(block=2, head=2, l_f_size=32, mlp_dim=64)
    img = jnp.zeros((4, 128, 160))
    goal = jnp.zeros((4, 2))
    p = policy.init(jax.random.PRNGKey(0), img, goal)
    mean, log_std = policy.apply(p, img, goal)
    assert mean.shape == (4, 2) and log_std.shape == (4, 2)
    assert bool(jnp.all(log_std >= -20)) and bool(jnp.all(log_std <= 2))

    critic = GoTQNetwork(block=2, head=2, l_f_size=32, mlp_dim=64)
    a = jnp.zeros((4, 2))
    cp = critic.init(jax.random.PRNGKey(1), img, goal, a)
    q1, q2 = critic.apply(cp, img, goal, a)
    assert q1.shape == (4, 2) and q2.shape == (4, 2)
    # twin heads share one trunk but have independent head weights
    assert not np.allclose(np.asarray(q1), np.asarray(q2))


def test_cnn_policy_and_critic_shapes():
    img = jnp.zeros((2, 128, 160))
    goal = jnp.zeros((2, 2))
    a = jnp.zeros((2, 2))

    pol = GaussianPolicy()
    p = pol.init(jax.random.PRNGKey(0), img, goal)
    mean, log_std = pol.apply(p, img, goal)
    assert mean.shape == (2, 2)

    q = QNetwork()
    qp = q.init(jax.random.PRNGKey(0), img, goal, a)
    q1, q2 = q.apply(qp, img, goal, a)
    assert q1.shape == (2, 2) and q2.shape == (2, 2)

    det = DeterministicPolicy()
    stacked = jnp.zeros((2, 128, 160, 4))
    dp = det.init(jax.random.PRNGKey(0), stacked, goal)
    out = det.apply(dp, stacked, goal)
    assert out.shape == (2, 2)
    assert bool(jnp.all(jnp.abs(out) <= 1.0))


def test_deterministic_got_policy_shape():
    det = DeterministicGoTPolicy(block=1, head=2, l_f_size=32, mlp_dim=64)
    img = jnp.zeros((2, 128, 160))
    goal = jnp.zeros((2, 2))
    p = det.init(jax.random.PRNGKey(0), img, goal)
    out = det.apply(p, img, goal)
    assert out.shape == (2, 2)


def test_simple_vit_shapes_and_predict():
    vit = SimpleViT(dim=64, depth=1, heads=2, mlp_dim=128, num_classes=2)
    img = jnp.zeros((2, 128, 160))
    p = vit.init(jax.random.PRNGKey(0), img, method=vit.full)
    out = vit.apply(p, img)
    assert out.shape == (2, 64)
    logits = vit.apply(p, img, method=vit.predict)
    assert logits.shape == (2, 2)


def test_vit_zoo_shapes():
    img = jnp.zeros((2, 4, 128, 160))  # 4-channel frame stack
    goal = jnp.zeros((2, 2))
    a = jnp.zeros((2, 2))
    pol = ViTGaussianPolicy(dim=64, depth=1, heads=2, mlp_dim=128)
    p = pol.init(jax.random.PRNGKey(0), img, goal)
    mean, log_std = pol.apply(p, img, goal)
    assert mean.shape == (2, 2)
    q = ViTQNetwork(dim=64, depth=1, heads=2, mlp_dim=128)
    qp = q.init(jax.random.PRNGKey(0), img, goal, a)
    q1, q2 = q.apply(qp, img, goal, a)
    assert q1.shape == (2, 2)


def test_emb_dropout_active_in_train_mode():
    """Reference GoT applies emb dropout 0.1 whenever the module is in train
    mode (GoalFormer.py:144,163; the RL loop never calls .eval())."""
    model = GoT(dim=32, depth=1, heads=2, mlp_dim=64, emb_dropout=0.5)
    img = jnp.ones((2, 128, 160))
    goal = jnp.ones((2, 32))
    params = model.init(jax.random.PRNGKey(0), img, goal)
    det = model.apply(params, img, goal, deterministic=True)
    tr = model.apply(params, img, goal, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(42)})
    assert not np.allclose(np.asarray(det), np.asarray(tr))


def test_attention_capture_sows_probs():
    """Functional replacement for the reference's bytecode visualizer
    (visualizer.py:3-42): capture=True materializes attention maps."""
    model = GoT(dim=32, depth=2, heads=2, mlp_dim=64, capture=True)
    img = jnp.ones((1, 128, 160))
    goal = jnp.ones((1, 32))
    params = model.init(jax.random.PRNGKey(0), img, goal)
    out, state = model.apply(params, img, goal, mutable=["intermediates"])
    inter = state["intermediates"]
    flat = jax.tree_util.tree_leaves(inter)
    # 2 blocks -> 2 attention maps of (B, H, N, N), N = 65 tokens
    assert len(flat) == 2
    assert flat[0].shape == (1, 2, 65, 65)
    np.testing.assert_allclose(np.asarray(flat[0].sum(-1)), 1.0, rtol=1e-5)
