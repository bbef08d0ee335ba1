"""BC trainer + checkpoint tests (SURVEY.md §7 steps 5 and checkpointing)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dgvit_tpu.agents.bc import BCTrainer, il_policy, split_80_20
from dgvit_tpu.agents import SACAgent
from dgvit_tpu.config import Config
from dgvit_tpu.core import checkpoint as ckpt


def tiny_bc():
    return BCTrainer(model=il_policy(block=1, head=2, l_f_size=32, mlp_dim=64),
                     batch_size=8, seed=1)


def synthetic_demos(n=64, seed=0):
    """Synthetic demos with a learnable obs->action mapping."""
    rng = np.random.default_rng(seed)
    obs = rng.random((n, 128, 160, 4), np.float32)
    goal = rng.random((n, 4), np.float32)
    # action depends on goal (learnable signal)
    act = np.tanh(np.stack([goal[:, 0] - 0.5, goal[:, 1] - 0.5], 1)).astype(np.float32)
    return obs, goal, act


def test_split_80_20():
    tr, va = split_80_20(100, seed=0)
    assert len(tr) == 80 and len(va) == 20
    assert len(np.intersect1d(tr, va)) == 0
    assert sorted(np.concatenate([tr, va])) == list(range(100))


def test_bc_loss_decreases():
    obs, goal, act = synthetic_demos()
    tr = tiny_bc()
    best, hist = tr.fit(obs, goal, act, epochs=8)
    assert hist["train"][-1] < hist["train"][0]
    assert min(hist["val"]) == pytest.approx(
        min(hist["val"]), rel=0), "history recorded"
    # best params achieve the min validation loss seen
    assert np.isfinite(min(hist["val"]))


def test_bc_best_params_track_lowest_val():
    obs, goal, act = synthetic_demos(48, seed=3)
    tr = tiny_bc()
    best, hist = tr.fit(obs, goal, act, epochs=5)
    vo = np.transpose(obs, (0, 3, 1, 2))
    _, va = split_80_20(len(obs), 1)
    n = (len(va) // 8) * 8
    stacked = (jnp.asarray(vo[va[:n]].reshape(-1, 8, 4, 128, 160)),
               jnp.asarray(goal[va[:n], :2].reshape(-1, 8, 2)),
               jnp.asarray(act[va[:n]].reshape(-1, 8, 2)))
    loss_best = float(tr._eval_fn(best, *stacked))
    assert loss_best == pytest.approx(min(hist["val"]), abs=1e-5)


def test_sac_checkpoint_roundtrip(tmp_path):
    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64}})
    agent = SACAgent(cfg)
    state = agent.init_state(5)
    # advance one step so opt states are non-trivial
    batch = {
        "obs": jnp.ones((2, 128, 160)), "act": jnp.zeros((2, 2)),
        "pobs": jnp.zeros((2, 2)), "next_pobs": jnp.zeros((2, 2)),
        "rew": jnp.ones((2, 1)), "next_obs": jnp.ones((2, 128, 160)),
        "engage": jnp.zeros((2, 1)), "done": jnp.zeros((2, 1)),
    }
    state, _ = agent.learn(state, batch)
    snap = jax.tree_util.tree_map(np.asarray, state)

    path = ckpt.save_train_state(str(tmp_path), 1, state)
    assert ckpt.latest_checkpoint(str(tmp_path)) == path

    template = agent.init_state(99)  # different seed: values must be replaced
    restored = ckpt.restore_train_state(path, template)
    rflat = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, restored))
    sflat = jax.tree_util.tree_leaves(snap)
    assert len(rflat) == len(sflat)
    for a, b in zip(rflat, sflat):
        np.testing.assert_array_equal(a, b)


def test_reference_name_contract():
    n = ckpt.reference_name("gtrl", 268, 3407, 0)
    assert n == "gtrl_reward_268_nbCol_0_seed_3407"


def test_params_npz_roundtrip(tmp_path):
    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64}})
    agent = SACAgent(cfg)
    state = agent.init_state(7)
    out = ckpt.save_params_npz(str(tmp_path), "gtrl_test", state.actor_params)
    template = agent.init_state(8).actor_params
    loaded = ckpt.load_params_npz(out, template)
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(state.actor_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bc_fit_small_val_split_stays_finite():
    """Regression: a val split smaller than batch_size used to stack to zero
    batches (nan val loss), and the never-improved `best_params` alias
    pointed at donated (deleted) buffers."""
    import jax
    import numpy as np

    from dgvit_tpu.agents.bc import BCTrainer
    from dgvit_tpu.models.policies import GoTPolicy

    policy = GoTPolicy(block=1, head=2, l_f_size=32, mlp_dim=64,
                       image_size=(32, 40), patch_size=(16, 20),
                       emb_dropout=0.0)
    tr = BCTrainer(model=policy, batch_size=64, seed=0)
    n = 40  # val split = 8 < batch_size
    obs = np.random.default_rng(0).random((n, 32, 40), np.float32)
    goal = np.random.default_rng(1).random((n, 2), np.float32)
    act = np.random.default_rng(2).random((n, 2), np.float32)
    best, hist = tr.fit(obs, goal, act, epochs=2, to_chw=False)
    assert np.isfinite(hist["val"]).all()
    # best params must be materialized host arrays, not donated aliases
    for leaf in jax.tree_util.tree_leaves(best):
        np.asarray(leaf)
