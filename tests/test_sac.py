"""SAC train-step tests: mechanics, reference quirks, and optimizer parity.

The reference's learn() can't run here (cpprb absent), so semantics are tested
piecewise against closed forms and a torch.optim.Adam oracle
(SURVEY.md §4 'Unit').
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dgvit_tpu.agents import SACAgent
from dgvit_tpu.config import Config

B = 4
IH, IW = 128, 160


def tiny_cfg(**sac_overrides) -> Config:
    return Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64},
        "sac": {"batch_size": B, **sac_overrides},
    })


def make_batch(key, b=B):
    ks = jax.random.split(key, 8)
    return {
        "obs": jax.random.uniform(ks[0], (b, IH, IW)),
        "act": jax.random.uniform(ks[1], (b, 2), minval=-1, maxval=1),
        "pobs": jax.random.uniform(ks[2], (b, 2)),
        "next_pobs": jax.random.uniform(ks[3], (b, 2)),
        "rew": jax.random.normal(ks[4], (b, 1)),
        "next_obs": jax.random.uniform(ks[5], (b, IH, IW)),
        "engage": jnp.zeros((b, 1)),
        "done": jnp.zeros((b, 1)),
    }


@pytest.fixture(scope="module")
def agent():
    return SACAgent(tiny_cfg())


@pytest.fixture()
def agent_and_state(agent):
    # fresh state per test: learn() donates (and thus invalidates) its input
    return agent, agent.init_state(seed=3407)


def test_train_step_runs_and_metrics_finite(agent_and_state):
    agent, state = agent_and_state
    old_itera = int(state.itera)
    old_actor = jax.tree_util.tree_map(np.asarray, state.actor_params)
    batch = make_batch(jax.random.PRNGKey(0))
    new_state, metrics = agent.learn(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(new_state.itera) == old_itera + 1
    # parameters actually moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - np.asarray(b)).max()),
        old_actor, new_state.actor_params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_polyak_update_math(agent_and_state):
    agent, state = agent_and_state
    tau = agent.tau
    t0 = np.asarray(jax.tree_util.tree_leaves(state.critic_target_params)[0])
    batch = make_batch(jax.random.PRNGKey(1))
    new_state, _ = agent.learn(state, batch)
    # itera=0 -> soft update fires (DRL.py:431: itera % policy_freq == 0)
    c1 = np.asarray(jax.tree_util.tree_leaves(new_state.critic_params)[0])
    t1 = np.asarray(jax.tree_util.tree_leaves(new_state.critic_target_params)[0])
    np.testing.assert_allclose(t1, t0 * (1 - tau) + c1 * tau, atol=1e-6)


def test_td_target_no_done_mask_by_default():
    """The reference omits (1-done) in the target (DRL.py:394). With done=1
    and the default config, the target must still bootstrap."""
    agent = SACAgent(tiny_cfg())
    state = agent.init_state(0)
    batch = make_batch(jax.random.PRNGKey(2))
    batch["done"] = jnp.ones((B, 1))
    key = jax.random.PRNGKey(3)
    tgt = agent._td_target(state, jnp.asarray(1.0), batch, key)

    agent_fixed = SACAgent(tiny_cfg(done_mask_in_target=True))
    tgt_fixed = agent_fixed._td_target(state, jnp.asarray(1.0), batch, key)
    # masked target == pure reward when done=1
    np.testing.assert_allclose(np.asarray(tgt_fixed),
                               np.broadcast_to(np.asarray(batch["rew"]), tgt_fixed.shape),
                               atol=1e-6)
    assert not np.allclose(np.asarray(tgt), np.asarray(tgt_fixed))


def test_alpha_autotuning_updates_log_alpha(agent_and_state):
    agent, state = agent_and_state
    old_log_alpha = float(state.log_alpha)
    batch = make_batch(jax.random.PRNGKey(4))
    new_state, metrics = agent.learn(state, batch)
    assert float(new_state.log_alpha) != old_log_alpha
    # alpha reported this step is the PREVIOUS exp(log_alpha) (DRL.py order)
    np.testing.assert_allclose(float(metrics["alpha"]),
                               float(np.exp(old_log_alpha)), rtol=1e-6)


def test_optax_adam_matches_torch_adam():
    """torch.optim.Adam and optax.adam must walk identical trajectories
    (same lr/betas/eps) so from-scratch training matches the reference."""
    torch = pytest.importorskip("torch")
    w0 = np.array([1.5, -2.0, 0.5], np.float32)

    tw = torch.tensor(w0, requires_grad=True)
    topt = torch.optim.Adam([tw], lr=1e-3)
    jw = jnp.asarray(w0)
    jopt = optax.adam(1e-3, eps=1e-8)
    jstate = jopt.init(jw)

    for i in range(5):
        loss = (tw ** 2).sum()
        topt.zero_grad(); loss.backward(); topt.step()
        g = jax.grad(lambda w: jnp.sum(w ** 2))(jw)
        upd, jstate = jopt.update(g, jstate, jw)
        jw = optax.apply_updates(jw, upd)
    np.testing.assert_allclose(np.asarray(jw), tw.detach().numpy(),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_guided_step_with_and_without_expert():
    agent = SACAgent(tiny_cfg())
    state = agent.init_state(7)
    batch = make_batch(jax.random.PRNGKey(5))
    expert = make_batch(jax.random.PRNGKey(6))

    s1, m1 = agent.learn_guidence(state, batch, expert, n_expert=B)
    assert np.isfinite(float(m1["policy_loss"]))
    assert float(m1["n_expert"]) == B

    state2 = agent.init_state(7)
    s2, m2 = agent.learn_guidence(state2, batch, expert, n_expert=0)
    assert np.isfinite(float(m2["policy_loss"]))
    # different effective losses when expert rows are masked out
    assert float(m1["qf1_loss"]) != float(m2["qf1_loss"])


def test_expert_batch_size_formula():
    # DRL.py:195 min(floor(exp/agent * batch), batch)
    assert SACAgent.expert_batch_size(1000, 100, 32) == 32
    assert SACAgent.expert_batch_size(50, 1000, 32) == 1
    assert SACAgent.expert_batch_size(0, 1000, 32) == 0


def test_choose_action_shapes_and_determinism():
    agent = SACAgent(tiny_cfg())
    state = agent.init_state(0)
    obs = jnp.zeros((IH, IW))
    pobs = jnp.zeros((2,))
    a = agent.choose_action(state, obs, pobs, jax.random.PRNGKey(0))
    assert a.shape == (2,)
    e1 = agent.choose_action(state, obs, pobs, jax.random.PRNGKey(1), evaluate=True)
    e2 = agent.choose_action(state, obs, pobs, jax.random.PRNGKey(2), evaluate=True)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=0)
    assert bool(jnp.all(jnp.abs(a) <= 1.0))


def test_deterministic_actor_config():
    cfg = Config.from_dict({
        "model": {"actor_type": "DeterministicTransformer", "block": 1,
                  "head": 2, "latent_size": 32, "mlp_dim": 64},
    })
    agent = SACAgent(cfg)
    assert agent.auto_tune is False and agent.fixed_alpha == 0.0
    state = agent.init_state(0)
    batch = make_batch(jax.random.PRNGKey(8))
    new_state, metrics = agent.learn(state, batch)
    assert np.isfinite(float(metrics["policy_loss"]))
    assert float(metrics["alpha"]) == 0.0


@pytest.mark.slow
def test_nan_guard_rolls_back_bad_update():
    """Failure detection (SURVEY.md §5): a batch that produces non-finite
    losses must not change params when nan_guard is on."""
    agent = SACAgent(tiny_cfg(nan_guard=True))
    state = agent.init_state(11)
    before = jax.tree_util.tree_map(np.asarray, state.actor_params)
    batch = make_batch(jax.random.PRNGKey(9))
    batch["rew"] = jnp.full((B, 1), jnp.nan)
    new_state, metrics = agent.learn(state, batch)
    assert float(metrics["skipped_nonfinite"]) == 1.0
    after = jax.tree_util.tree_map(np.asarray, new_state.actor_params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
    assert int(new_state.itera) == 1  # counter still advances

    # and a healthy batch still updates
    good = make_batch(jax.random.PRNGKey(10))
    s2, m2 = agent.learn(new_state, good)
    assert float(m2["skipped_nonfinite"]) == 0.0


def test_agent_save_load_reference_api(tmp_path):
    """DRL.py:489-503 save/load/load_actor/load_target surface."""
    agent = SACAgent(tiny_cfg())
    s1 = agent.init_state(1)
    a_path, c_path = agent.save(s1, "gtrl44", str(tmp_path), reward=100,
                                seed=3407, nb_col=0)
    assert "reward_100_nbCol_0_seed_3407" in a_path

    s2 = agent.init_state(2)
    s2 = agent.load(s2, "gtrl44_reward_100_nbCol_0_seed_3407", str(tmp_path))
    for a, b in zip(jax.tree_util.tree_leaves(s1.actor_params),
                    jax.tree_util.tree_leaves(s2.actor_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # load_target: hard update
    s2 = agent.load_target(s2)
    for a, b in zip(jax.tree_util.tree_leaves(s2.critic_params),
                    jax.tree_util.tree_leaves(s2.critic_target_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_per_update_returns_td_errors_and_weights_matter():
    """Real PER path (the reference stubs it out, DRL.py:365-368): IS weights
    scale the critic loss; per-sample TD errors come back for priority
    updates."""
    agent = SACAgent(tiny_cfg(prioritized_replay=True))
    state = agent.init_state(21)
    batch = make_batch(jax.random.PRNGKey(20))
    w_uniform = jnp.ones((B,))
    s1, m1, td = agent.learn_per(state, batch, w_uniform)
    assert td.shape == (B,)
    assert bool(jnp.all(td >= 0))
    # uniform-weight PER critic loss == plain learn critic loss
    state2 = agent.init_state(21)
    s2, m2 = agent.learn(state2, batch)
    np.testing.assert_allclose(float(m1["qf1_loss"]), float(m2["qf1_loss"]),
                               rtol=1e-5)
    # non-uniform weights change the loss
    state3 = agent.init_state(21)
    w = jnp.linspace(0.1, 2.0, B)
    s3, m3, _ = agent.learn_per(state3, batch, w)
    assert float(m3["qf1_loss"]) != pytest.approx(float(m1["qf1_loss"]), rel=1e-6)


@pytest.mark.slow
def test_offline_per_training(tmp_path):
    from dgvit_tpu.train.train_offline import (
        fill_buffer_from_demos, train_offline)

    n = 16
    rng = np.random.default_rng(2)
    data = {
        "obs": rng.random((n, IH, IW), np.float32),
        "act": rng.uniform(-1, 1, (n, 2)).astype(np.float32),
        "goal": rng.random((n, 4), np.float32),
        "reward": rng.random(n).astype(np.float32),
        "next_obs": rng.random((n, IH, IW), np.float32),
        "next_goal": rng.random((n, 4), np.float32),
        "done": np.zeros(n, bool),
    }
    cfg = tiny_cfg(prioritized_replay=True)
    buf = fill_buffer_from_demos(data, cfg)
    state, stats = train_offline(cfg, buf, steps=3, out_dir=str(tmp_path))
    assert np.isfinite(stats["final"]["policy_loss"])


@pytest.mark.slow
def test_nan_guard_covers_guided_and_per_steps():
    """Regression: the gw=30 generalization run NaN'd straight through the
    guard because only the PLAIN step honored it — learn_guidence (the path
    every expert-buffer run takes) and learn_per must roll back too."""
    agent = SACAgent(tiny_cfg(nan_guard=True, prioritized_replay=True))
    state = agent.init_state(12)
    before = jax.tree_util.tree_map(np.asarray, state.actor_params)
    bad = make_batch(jax.random.PRNGKey(20))
    bad["rew"] = jnp.full((B, 1), jnp.inf)
    expert = {k: v for k, v in make_batch(jax.random.PRNGKey(21)).items()
              if k != "engage"}

    s1, m1 = agent.learn_guidence(state, bad, expert, 2)
    assert float(m1["skipped_nonfinite"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(np.asarray, s1.actor_params))):
        np.testing.assert_array_equal(a, b)

    s2, m2, _td = agent.learn_per(s1, bad, jnp.ones((B,)))
    assert float(m2["skipped_nonfinite"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(np.asarray, s2.actor_params))):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_nan_guard_per_td_errors_stay_finite():
    """The PER TD errors feed the sum-tree: a rolled-back step must report
    finite neutral priorities, not the inf that poisoned tree totals."""
    agent = SACAgent(tiny_cfg(nan_guard=True, prioritized_replay=True))
    state = agent.init_state(13)
    bad = make_batch(jax.random.PRNGKey(30))
    bad["rew"] = jnp.full((B, 1), jnp.inf)
    _s, m, td = agent.learn_per(state, bad, jnp.ones((B,)))
    assert float(m["skipped_nonfinite"]) == 1.0
    assert np.isfinite(np.asarray(td)).all()


@pytest.mark.slow
def test_nan_guard_neutral_priority_is_scale_aware():
    """ADVICE r2: rolled-back PER steps must report a neutral priority at
    the batch's own |td| scale — a fixed 1.0 (or a signed mean, which the
    host-side abs() would collapse toward 0) sharply demotes the affected
    rows when typical |td| >> 1. Poison HALF the batch so finite rows exist;
    the neutral must equal the mean of the finite |td|."""
    raw = SACAgent(tiny_cfg(prioritized_replay=True))
    state0 = raw.init_state(14)
    half_bad = make_batch(jax.random.PRNGKey(31))
    # rewards at the reference's +-200 scale so |td| >> 1
    rew = np.full((B, 1), 200.0, np.float32)
    rew[: B // 2] = np.inf
    half_bad["rew"] = jnp.asarray(rew)
    _, _, td_raw = raw.learn_per(state0, half_bad, jnp.ones((B,)))
    td_raw = np.asarray(td_raw)
    finite = np.isfinite(td_raw)
    assert finite.any() and not finite.all()
    expected = np.abs(td_raw[finite]).mean()
    assert expected > 1.0  # the scale premise: a fixed 1.0 WOULD demote

    guarded = SACAgent(tiny_cfg(nan_guard=True, prioritized_replay=True))
    state1 = guarded.init_state(14)  # identical params to state0
    _, m, td = guarded.learn_per(state1, half_bad, jnp.ones((B,)))
    assert float(m["skipped_nonfinite"]) == 1.0
    np.testing.assert_allclose(np.asarray(td),
                               np.full(B, expected, np.float32), rtol=1e-5)


# ---------------------------------------------------------------------------
# critic_latent_reuse (perf opt-in, round 3): actor loss on the PRE-update
# critic via the stashed trunk latent
# ---------------------------------------------------------------------------

def _reuse_cfg(reuse: bool, lr_critic: float = 1e-3) -> Config:
    return Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "emb_dropout": 0.0},
        "sac": {"batch_size": B, "lr_critic": lr_critic,
                "critic_latent_reuse": reuse},
    })


def test_critic_latent_reuse_equivalent_when_critic_frozen():
    """The ONLY semantic deviation of the reuse mode is pre- vs post-update
    critic params in the actor loss (plus the dropout realization). With
    lr_critic=0 (update is a no-op) and emb_dropout=0 the two modes must
    produce the same step."""
    batch = make_batch(jax.random.PRNGKey(11))
    outs = {}
    for reuse in (False, True):
        agent = SACAgent(_reuse_cfg(reuse, lr_critic=0.0))
        state = agent.init_state(seed=3407)
        new_state, metrics = agent.learn(state, batch)
        outs[reuse] = (jax.tree_util.tree_map(np.asarray,
                                              new_state.actor_params), metrics)
    pa, ma = outs[False]
    pb, mb = outs[True]
    for a, b in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    for k in ma:
        np.testing.assert_allclose(float(ma[k]), float(mb[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_critic_latent_reuse_trains():
    agent = SACAgent(_reuse_cfg(True))
    state = agent.init_state(seed=7)
    before_actor = jax.tree_util.tree_map(np.asarray, state.actor_params)
    before_critic = jax.tree_util.tree_map(np.asarray, state.critic_params)
    batch = make_batch(jax.random.PRNGKey(1))
    new_state, metrics = agent.learn(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    changed = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(before_actor),
                        jax.tree_util.tree_leaves(new_state.actor_params)))
    assert changed, "actor params did not change"
    changed_c = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(before_critic),
                        jax.tree_util.tree_leaves(new_state.critic_params)))
    assert changed_c, "critic params did not change"


def test_critic_latent_reuse_rejects_cnn_critic():
    cfg = Config.from_dict({
        "model": {"critic_type": "CNN"},
        "sac": {"critic_latent_reuse": True},
    })
    with pytest.raises(ValueError, match="critic_latent_reuse"):
        SACAgent(cfg)


@pytest.mark.slow  # 4 extra agent compiles; plain-flavor gate stays fast
def test_critic_latent_reuse_equivalent_per_and_guided():
    """Same frozen-critic equivalence for the PER and guided update flavors."""
    batch = make_batch(jax.random.PRNGKey(17))
    expert = {k: v for k, v in make_batch(jax.random.PRNGKey(18)).items()
              if k != "engage"}
    outs = {}
    for reuse in (False, True):
        agent = SACAgent(_reuse_cfg(reuse, lr_critic=0.0))
        state = agent.init_state(seed=11)
        s1, m1, td1 = agent.learn_per(state, batch, jnp.ones((B,)))
        s2, m2 = agent.learn_guidence(s1, batch, expert, 2)
        outs[reuse] = (
            jax.tree_util.tree_map(np.asarray, s2.actor_params),
            {**{f"per_{k}": v for k, v in m1.items()},
             **{f"g_{k}": v for k, v in m2.items()}},
            np.asarray(td1))
    pa, ma, ta = outs[False]
    pb, mb, tb = outs[True]
    np.testing.assert_allclose(ta, tb, rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    for k in ma:
        np.testing.assert_allclose(float(ma[k]), float(mb[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_alpha_max_ceiling_clamps_all_flavors():
    """Opt-in entropy-temperature ceiling (cfg.sac.alpha_max): log_alpha
    never exceeds log(alpha_max) after any update flavor. Motivated by the
    measured 2400-episode hospital divergence (alpha -> 10.3, deterministic
    eval 0/100; BENCH.md round-3 session 6). Default (None) keeps the
    reference's unclamped auto-tune — covered by every other test here."""
    cap = 0.5
    # alpha starts ABOVE the cap: the very first update must pull it under
    ag = SACAgent(tiny_cfg(alpha=2.0, alpha_max=cap))
    state = ag.init_state(0)
    batch = make_batch(jax.random.PRNGKey(1))
    state, _ = ag.learn(state, batch)
    assert float(jnp.exp(state.log_alpha)) <= cap + 1e-6

    agp = SACAgent(tiny_cfg(alpha=2.0, alpha_max=cap,
                            prioritized_replay=True))
    sp = agp.init_state(0)
    sp, _m, _td = agp.learn_per(sp, make_batch(jax.random.PRNGKey(2)),
                                jnp.ones((B,)))
    assert float(jnp.exp(sp.log_alpha)) <= cap + 1e-6

    agg = SACAgent(tiny_cfg(alpha=2.0, alpha_max=cap))
    sg = agg.init_state(0)
    expert = make_batch(jax.random.PRNGKey(3))
    sg, _ = agg.learn_guidence(sg, make_batch(jax.random.PRNGKey(4)),
                               expert, n_expert=B)
    assert float(jnp.exp(sg.log_alpha)) <= cap + 1e-6


def test_alpha_max_inactive_below_ceiling():
    """With alpha far below the cap, the clamp is a no-op: one step with
    and without alpha_max produces the SAME log_alpha."""
    base = SACAgent(tiny_cfg())
    capped = SACAgent(tiny_cfg(alpha_max=100.0))
    b1 = make_batch(jax.random.PRNGKey(5))
    b2 = make_batch(jax.random.PRNGKey(5))
    s1, _ = base.learn(base.init_state(0), b1)
    s2, _ = capped.learn(capped.init_state(0), b2)
    assert float(s1.log_alpha) == float(s2.log_alpha)


def test_alpha_min_floor_clamps_all_flavors():
    """Opt-in entropy-temperature FLOOR (cfg.sac.alpha_min): log_alpha
    never drops below log(alpha_min) after any update flavor. Motivated by
    the measured per-reset-DR collapse (alpha -> 0.003, critics -> inf,
    training stalled at 50/800 goals; BENCH.md round 4). Default (None)
    keeps the reference's unclamped auto-tune."""
    floor = 0.5
    # alpha starts BELOW the floor: the first update must lift it up
    ag = SACAgent(tiny_cfg(alpha=0.01, alpha_min=floor))
    state = ag.init_state(0)
    state, _ = ag.learn(state, make_batch(jax.random.PRNGKey(21)))
    assert float(jnp.exp(state.log_alpha)) >= floor - 1e-6

    agp = SACAgent(tiny_cfg(alpha=0.01, alpha_min=floor,
                            prioritized_replay=True))
    sp = agp.init_state(0)
    sp, _m, _td = agp.learn_per(sp, make_batch(jax.random.PRNGKey(22)),
                                jnp.ones((B,)))
    assert float(jnp.exp(sp.log_alpha)) >= floor - 1e-6

    agg = SACAgent(tiny_cfg(alpha=0.01, alpha_min=floor))
    sg = agg.init_state(0)
    sg, _ = agg.learn_guidence(sg, make_batch(jax.random.PRNGKey(23)),
                               make_batch(jax.random.PRNGKey(24)),
                               n_expert=B)
    assert float(jnp.exp(sg.log_alpha)) >= floor - 1e-6


def test_alpha_min_inactive_above_floor():
    """With alpha far above the floor, the clamp is a no-op: one step with
    and without alpha_min produces the SAME log_alpha; floor + ceiling
    compose (band clamp)."""
    base = SACAgent(tiny_cfg())
    floored = SACAgent(tiny_cfg(alpha_min=1e-6))
    b1 = make_batch(jax.random.PRNGKey(25))
    b2 = make_batch(jax.random.PRNGKey(25))
    s1, _ = base.learn(base.init_state(0), b1)
    s2, _ = floored.learn(floored.init_state(0), b2)
    assert float(s1.log_alpha) == float(s2.log_alpha)

    banded = SACAgent(tiny_cfg(alpha_min=0.3, alpha_max=0.6))
    sb = banded.init_state(0)
    sb, _ = banded.learn(sb, make_batch(jax.random.PRNGKey(26)))
    a = float(jnp.exp(sb.log_alpha))
    assert 0.3 - 1e-6 <= a <= 0.6 + 1e-6

    import pytest as _pytest
    with _pytest.raises(AssertionError):
        tiny_cfg(alpha_min=0.7, alpha_max=0.5)
