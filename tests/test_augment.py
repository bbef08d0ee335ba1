"""DrQ-v2 random-shift augmentation (ops/augment.py + sac.aug_shift).

The reference trains on raw replayed frames; aug_shift is the opt-in
pixel-RL regularizer (Yarats et al. 2021; PAPERS.md ViT-RL survey), so the
tests pin (a) the transform's geometry and (b) that the opt-in leaves the
default update bit-untouched while changing the augmented one.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dgvit_tpu.ops.augment import random_shift

from test_sac import make_batch, tiny_cfg


def test_constant_image_invariant():
    # replicate padding: a constant frame is a fixed point for ANY offset
    x = jnp.full((3, 16, 20), 0.37)
    out = random_shift(x, jax.random.PRNGKey(0), pad=4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_pad_zero_is_identity():
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 10))
    assert random_shift(x, jax.random.PRNGKey(2), pad=0) is x


def test_shift_is_a_translate_of_the_padded_frame():
    """Every output must equal SOME (dy, dx) crop of the edge-padded input,
    with |dy|, |dx| <= pad — recovered exhaustively, then cross-checked."""
    pad = 3
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 12, 14))
    out = np.asarray(random_shift(x, jax.random.PRNGKey(4), pad=pad))
    xp = np.pad(np.asarray(x), ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    for i in range(x.shape[0]):
        matches = [
            (dy, dx)
            for dy in range(2 * pad + 1) for dx in range(2 * pad + 1)
            if np.array_equal(out[i], xp[i, dy:dy + 12, dx:dx + 14])
        ]
        assert matches, f"sample {i} is not a crop of its padded frame"


def test_channels_shift_together_and_deterministic():
    # a (B, C, H, W) stack shifts as one unit: per-channel offsets match
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 4, 12, 14))
    k = jax.random.PRNGKey(6)
    out1 = random_shift(x, k, pad=2)
    out2 = random_shift(x, k, pad=2)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # channel c of the output equals random_shift applied to channel c with
    # the same key (offsets are drawn per sample, not per channel)
    single = random_shift(x[:, 1], k, pad=2)
    np.testing.assert_array_equal(np.asarray(out1[:, 1]), np.asarray(single))


def test_aug_shift_changes_the_update_but_default_is_raw():
    """sac.aug_shift=2: the losses see shifted frames, so the update
    differs from the raw-frame one; the augmented run still moves params
    and reports finite metrics. aug_shift=0 reproduces the default agent
    bit-for-bit (the aug keys are fold_ins, existing streams never move)."""
    from dgvit_tpu.agents import SACAgent

    batch = make_batch(jax.random.PRNGKey(7))

    def leaves(tree):
        return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]

    ref_state, ref_m = SACAgent(tiny_cfg()).learn(
        SACAgent(tiny_cfg()).init_state(seed=0), {k: v for k, v in batch.items()})

    zero = SACAgent(tiny_cfg(aug_shift=0))
    z_state, z_m = zero.learn(zero.init_state(seed=0),
                              {k: v for k, v in batch.items()})
    for a, b in zip(leaves(ref_state.actor_params), leaves(z_state.actor_params)):
        np.testing.assert_array_equal(a, b)

    aug = SACAgent(tiny_cfg(aug_shift=2))
    a_state, a_m = aug.learn(aug.init_state(seed=0),
                             {k: v for k, v in batch.items()})
    for k, v in a_m.items():
        assert np.isfinite(float(v)), f"{k} not finite under aug"
    diffs = [float(np.abs(a - b).max()) for a, b in
             zip(leaves(ref_state.actor_params), leaves(a_state.actor_params))]
    assert max(diffs) > 0, "aug_shift=2 produced the raw-frame update"


def test_guided_update_augments_expert_frames_too():
    from dgvit_tpu.agents import SACAgent

    agent = SACAgent(tiny_cfg(aug_shift=2))
    state = agent.init_state(seed=1)
    batch = make_batch(jax.random.PRNGKey(8))
    expert = make_batch(jax.random.PRNGKey(9))
    expert.pop("engage")
    state, metrics = agent.learn_guidence(state, batch, expert,
                                          jnp.int32(2))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite under guided aug"


def _actor_leaves(state):
    return [np.asarray(x) for x in
            jax.tree_util.tree_leaves(state.actor_params)]


def _max_diff(a, b):
    return max(float(np.abs(x - y).max()) for x, y in zip(a, b))


def test_aug_critic_only_differs_from_both_raw_and_full():
    """sac.aug_actor=False (DrQ-v2 routing): the update differs from the
    raw-frame one (the critic DID see shifted views) AND from the
    fully-augmented one (the actor did NOT) — all three flavors at the
    same seed/batch."""
    from dgvit_tpu.agents import SACAgent

    batch = make_batch(jax.random.PRNGKey(10))

    def run(**kw):
        agent = SACAgent(tiny_cfg(**kw))
        st, m = agent.learn(agent.init_state(seed=0), dict(batch))
        for k, v in m.items():
            assert np.isfinite(float(v)), f"{k} not finite ({kw})"
        return _actor_leaves(st)

    raw = run(aug_shift=0)
    full = run(aug_shift=2)
    critic_only = run(aug_shift=2, aug_actor=False)
    assert _max_diff(critic_only, raw) > 0, \
        "critic-only aug reproduced the raw update (shift never applied)"
    assert _max_diff(critic_only, full) > 0, \
        "critic-only aug reproduced the full-aug update (actor still saw " \
        "shifted frames)"


def test_aug_critic_only_guided_and_per_paths():
    """The DrQ-v2 routing must hold on the guided and PER flavors too (the
    arms train through guided/PER fused steps)."""
    from dgvit_tpu.agents import SACAgent

    batch = make_batch(jax.random.PRNGKey(11))
    expert = make_batch(jax.random.PRNGKey(12))
    expert.pop("engage")
    for kw in (dict(aug_shift=2, aug_actor=False),):
        agent = SACAgent(tiny_cfg(**kw))
        st = agent.init_state(seed=2)
        st, m = agent.learn_guidence(st, dict(batch), dict(expert),
                                     jnp.int32(2))
        for k, v in m.items():
            assert np.isfinite(float(v)), f"guided {k} not finite"
        st, m, td = agent.learn_per(
            st, {k: v for k, v in batch.items() if k != "engage"},
            jnp.ones((batch["obs"].shape[0],)))
        for k, v in m.items():
            assert np.isfinite(float(v)), f"per {k} not finite"
        assert np.isfinite(np.asarray(td)).all()


def test_aug_warmup_gates_the_shift_by_step():
    """sac.aug_warmup=N: an update at itera < N is bit-identical to the
    raw-frame update; once itera >= N it matches the no-warmup augmented
    update (same key discipline — the gate is a where(), not a re-key)."""
    from dgvit_tpu.agents import SACAgent

    batch = make_batch(jax.random.PRNGKey(13))

    raw_agent = SACAgent(tiny_cfg(aug_shift=0))
    raw_st, _ = raw_agent.learn(raw_agent.init_state(seed=0), dict(batch))

    warm = SACAgent(tiny_cfg(aug_shift=2, aug_warmup=5))
    w_st, _ = warm.learn(warm.init_state(seed=0), dict(batch))  # itera=0 < 5
    assert _max_diff(_actor_leaves(w_st), _actor_leaves(raw_st)) == 0, \
        "warmup window must pass raw frames through"

    # advance the counter past the window: the augmented branch engages and
    # the update diverges from raw
    st5 = warm.init_state(seed=0).replace(itera=jnp.int32(5))
    w5_st, _ = warm.learn(st5, dict(batch))
    raw5_st, _ = raw_agent.learn(
        raw_agent.init_state(seed=0).replace(itera=jnp.int32(5)), dict(batch))
    assert _max_diff(_actor_leaves(w5_st), _actor_leaves(raw5_st)) > 0, \
        "past the warmup window the shift must apply"


def test_latent_reuse_refuses_critic_only_aug():
    from dgvit_tpu.agents import SACAgent
    import pytest

    cfg = tiny_cfg(aug_shift=2, aug_actor=False)
    cfg.sac.critic_latent_reuse = True
    with pytest.raises(ValueError, match="aug_actor"):
        SACAgent(cfg)
