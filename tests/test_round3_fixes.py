"""Round-3 fixes: ADVICE items (alpha validation, checkpoint retention, BC
val-split guard, PER neutral priorities), the guided+PER composition
(round-2 VERDICT Weak #6), and evaluation-driver parity fixes (FrameStacker
support, collision reset, sim-time durations, --device-rollout)."""

import os

import numpy as np
import pytest

from dgvit_tpu.config import Config
from dgvit_tpu.envs import KinematicNavEnv


def tiny_cfg(**over):
    d = {
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 256},
        "env": {"max_steps": 10, "max_episodes": 2},
        "train": {"pre_buffer": False, "plot_interval": 1000,
                  "eval_threshold": 0, "reward_threshold": 1e9},
    }
    for k, v in over.items():
        d.setdefault(k, {}).update(v)
    return Config.from_dict(d)


# ---------------------------------------------------------------------------
# ADVICE fixes
# ---------------------------------------------------------------------------

def test_alpha_nonpositive_rejected():
    """log_alpha = log(cfg.sac.alpha) would be -inf/NaN for alpha <= 0."""
    with pytest.raises(AssertionError):
        Config.from_dict({"sac": {"alpha": 0.0}})
    with pytest.raises(AssertionError):
        Config.from_dict({"sac": {"alpha": -1.0}})
    Config.from_dict({"sac": {"alpha": 0.05}})  # small positive is fine


def test_prune_checkpoints(tmp_path):
    from dgvit_tpu.core import checkpoint as ckpt

    for step in (10, 20, 30, 40, 50):
        (tmp_path / f"step_{step}").mkdir()
        (tmp_path / f"step_{step}" / "blob").write_text("x")
    (tmp_path / "unrelated").mkdir()
    pruned = ckpt.prune_checkpoints(str(tmp_path), keep=3)
    assert pruned == 2
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["step_30", "step_40", "step_50", "unrelated"]
    assert ckpt.latest_checkpoint(str(tmp_path)).endswith("step_50")
    # pruning a missing directory is a no-op
    assert ckpt.prune_checkpoints(str(tmp_path / "nope")) == 0


def test_bc_tiny_dataset_val_guard():
    """Degenerate tiny datasets (n=1: int(0.8*1)==0 -> empty TRAIN split,
    zero batches, NaN losses) now fall back to reusing the available rows."""
    from dgvit_tpu.agents.bc import BCTrainer
    from dgvit_tpu.models.policies import GoTPolicy

    rng = np.random.default_rng(0)
    n = 1
    obs = rng.random((n, 32, 40), np.float32)
    goal = rng.random((n, 2), np.float32)
    act = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    tr = BCTrainer(model=GoTPolicy(block=1, head=2, l_f_size=32, mlp_dim=64,
                                   image_size=(32, 40), patch_size=(16, 20),
                                   emb_dropout=0.0),
                   batch_size=2, seed=0)
    _, hist = tr.fit(obs, goal, act, epochs=2, to_chw=False)
    assert np.isfinite(hist["val"]).all()
    assert np.isfinite(hist["train"]).all()


# ---------------------------------------------------------------------------
# guided + PER composition
# ---------------------------------------------------------------------------

def _batchez(rng, b, hw=(32, 40)):
    ks = rng.random
    return {
        "obs": ks((b,) + hw).astype(np.float32),
        "act": (ks((b, 2)) * 2 - 1).astype(np.float32),
        "pobs": ks((b, 2)).astype(np.float32),
        "next_pobs": ks((b, 2)).astype(np.float32),
        "rew": ks((b, 1)).astype(np.float32),
        "next_obs": ks((b,) + hw).astype(np.float32),
        "engage": np.zeros((b, 1), np.float32),
        "done": np.zeros((b, 1), np.float32),
    }


def test_guided_per_matches_plain_guided_at_unit_weights():
    """learn_guidence_per with all-ones IS weights must reproduce the plain
    guided update bit-for-bit (same normalization, same RNG stream)."""
    import jax

    from dgvit_tpu.agents import SACAgent

    cfg = tiny_cfg()
    agent = SACAgent(cfg)
    rng = np.random.default_rng(3)
    b = 4
    batch = _batchez(rng, b)
    expert = {k: v for k, v in _batchez(rng, b).items() if k != "engage"}

    s0 = agent.init_state(0)
    s_plain, m_plain = agent.learn_guidence(s0, batch, expert, 3)

    s1 = agent.init_state(0)
    s_per, m_per, td = agent.learn_guidence_per(
        s1, batch, expert, 3, np.ones((b,), np.float32))

    assert td.shape == (b,)
    assert np.isfinite(np.asarray(td)).all()
    assert (np.asarray(td) >= 0).all()
    for k in ("qf1_loss", "policy_loss", "alpha_loss"):
        assert float(m_plain[k]) == pytest.approx(float(m_per[k]), abs=1e-6)
    a0 = jax.tree_util.tree_leaves(s_plain.actor_params)
    a1 = jax.tree_util.tree_leaves(s_per.actor_params)
    for x, y in zip(a0, a1):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


@pytest.mark.slow
def test_train_rl_guided_per_updates_priorities(tmp_path, monkeypatch):
    """pre_buffer + prioritized_replay now routes through the PER-aware
    guided step and actually updates sum-tree priorities (previously the IS
    weights were popped and discarded — round-2 VERDICT Weak #6)."""
    from dgvit_tpu.replay import PrioritizedReplayBuffer
    from dgvit_tpu.train.demo_record import record_episodes, scripted_pilot
    from dgvit_tpu.train.train_rl import train

    env = KinematicNavEnv(seed=1, image_hw=(32, 40))
    record_episodes(env, scripted_pilot, str(tmp_path / "Data"),
                    episodes=2, max_steps=12)

    calls = []
    orig = PrioritizedReplayBuffer.update_priorities

    def spy(self, idx, prio):
        calls.append(np.asarray(prio))
        return orig(self, idx, prio)

    monkeypatch.setattr(PrioritizedReplayBuffer, "update_priorities", spy)

    cfg = tiny_cfg(sac={"batch_size": 4, "buffer_size": 256,
                        "prioritized_replay": True},
                   train={"pre_buffer": True, "plot_interval": 1000,
                          "eval_threshold": 0, "reward_threshold": 1e9})
    env2 = KinematicNavEnv(seed=2, image_hw=(32, 40))
    out = train(cfg, env2, out_dir=str(tmp_path / "out"),
                expert_glob=str(tmp_path / "Data" / "RRC" / "jax" / "*.npz"),
                max_episodes=2)
    assert out["episodes"] >= 1
    assert calls, "guided+PER training never updated priorities"
    for prio in calls:
        assert np.isfinite(prio).all() and (prio > 0).all()


def test_guidence_weight_decay_curriculum():
    """Geometric gw decay (anchor-early / specialize-late), computed from the
    traced step counter — no retrace across steps."""
    from dgvit_tpu.agents import SACAgent

    cfg = tiny_cfg(sac={"batch_size": 4, "guidence_weight": 10.0,
                        "guidence_weight_final": 1.0,
                        "guidence_decay_steps": 4})
    agent = SACAgent(cfg)
    rng = np.random.default_rng(0)
    batch = _batchez(rng, 4)
    expert = {k: v for k, v in _batchez(rng, 4).items() if k != "engage"}
    state = agent.init_state(0)
    seen = []
    for _ in range(6):
        state, m = agent.learn_guidence(state, batch, expert, 4)
        seen.append(float(m["guidence_weight"]))
    # itera at loss time: 0,1,2,3,4,5 -> frac 0,.25,.5,.75,1,1
    expect = [10.0 * (0.1 ** min(t / 4.0, 1.0)) for t in range(6)]
    np.testing.assert_allclose(seen, expect, rtol=1e-5)


# ---------------------------------------------------------------------------
# evaluation driver fixes
# ---------------------------------------------------------------------------

def test_run_eval_collision_reset_and_sim_durations(tmp_path):
    import jax

    from dgvit_tpu.models import build_actor
    from dgvit_tpu.train.evaluate import run_eval

    cfg = tiny_cfg()
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(0), np.zeros((1, 32, 40)),
                        np.zeros((1, 2)))["params"]
    env = KinematicNavEnv(seed=5, image_hw=(32, 40))
    env.collision = 99  # stale count from a previous (imaginary) run
    out = run_eval(cfg, env, params, max_episodes=2, out_dir=str(tmp_path))
    assert out["collisions"] <= 2  # reset at entry: counts THIS eval only
    # durations are simulated seconds (steps * DT), machine-independent
    for d in out["durations"]:
        assert d > 0
        assert abs(d / env.DT - round(d / env.DT)) < 1e-9


@pytest.mark.slow
def test_evaluate_cli_frame_stacked_actor(tmp_path):
    """End-to-end dgvit-test on a channels-mode (frame-stacked) actor —
    previously crashed with mis-shaped (1, H, W) inputs."""
    import jax
    import yaml

    from dgvit_tpu.core import checkpoint as ckpt
    from dgvit_tpu.models import build_actor
    from dgvit_tpu.train import evaluate as ev

    cfg = tiny_cfg(model={"block": 1, "head": 2, "latent_size": 32,
                          "mlp_dim": 64, "image_size": (32, 40),
                          "patch_size": (16, 20), "patch_mode": "channels"},
                   env={"max_steps": 8, "max_episodes": 2, "frame_stack": 4})
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(0), np.zeros((1, 4, 32, 40)),
                        np.zeros((1, 2)))["params"]
    path = ckpt.save_params_npz(str(tmp_path), "fs_model", params)
    base = path[: -len("_actor.npz")]

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg.to_dict()))
    ev.main(["--actor", str(base) + "_actor.npz", "--config", str(cfg_path),
             "--episodes", "2", "--out", str(tmp_path / "res")])
    assert (tmp_path / "res" / "testing_data.txt").exists()


@pytest.mark.slow
def test_run_eval_device_rollout(tmp_path):
    import jax

    from dgvit_tpu.models import build_actor
    from dgvit_tpu.train.evaluate import run_eval

    cfg = tiny_cfg()
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(0), np.zeros((1, 32, 40)),
                        np.zeros((1, 2)))["params"]
    env = KinematicNavEnv(seed=5, image_hw=(32, 40))
    out = run_eval(cfg, env, params, max_episodes=2, out_dir=str(tmp_path),
                   device_rollout_loop=True)
    assert "success_rate" in out
    assert 0.0 <= out["success_rate"] <= 1.0
    for d in out["durations"]:
        assert d > 0
