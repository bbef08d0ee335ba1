"""Driver integration tests: the full RL loop (env -> replay -> fused SAC
update -> eval -> checkpoint) and the demo->BC pipeline, Gazebo-free
(SURVEY.md §4 'Env without Gazebo ... so the full RL loop runs in CI')."""

import glob
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dgvit_tpu.config import Config
from dgvit_tpu.envs import KinematicNavEnv
from dgvit_tpu.train.demo_record import record_episodes, scripted_pilot
from dgvit_tpu.train.train_rl import train
from dgvit_tpu.train.train_bc import load_bc_dataset


def tiny_cfg(tmp, episodes=3):
    return Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 256},
        "env": {"max_steps": 12, "max_episodes": episodes},
        "train": {"pre_buffer": False, "plot_interval": 1000,
                  "eval_threshold": 0, "reward_threshold": 1e9},
    })


def test_rl_training_loop_runs_end_to_end(tmp_path):
    cfg = tiny_cfg(tmp_path)
    env = KinematicNavEnv(seed=0, image_hw=(32, 40))
    out = train(cfg, env, out_dir=str(tmp_path), max_episodes=3)
    assert out["episodes"] >= 1
    assert np.isfinite(out["max_mean_reward"])
    # metrics JSONL written
    assert list(tmp_path.glob("train_*.jsonl"))
    # final full-state checkpoint + actor export exist (t.save default True)
    assert list((tmp_path / "checkpoints").glob("step_*"))
    assert list((tmp_path / "models").glob("*_actor.npz"))
    assert (tmp_path / "training_data.txt").exists()


def test_rl_training_with_expert_buffer(tmp_path):
    # record scripted demos first, then train with guidance
    env = KinematicNavEnv(seed=1, image_hw=(32, 40))
    paths = record_episodes(env, scripted_pilot, str(tmp_path / "Data"),
                            episodes=2, max_steps=15)
    assert paths
    cfg = tiny_cfg(tmp_path)
    cfg.train.pre_buffer = True
    env2 = KinematicNavEnv(seed=2, image_hw=(32, 40))
    out = train(cfg, env2, out_dir=str(tmp_path / "r2"),
                expert_glob=str(tmp_path / "Data" / "RRC" / "jax" / "*.npz"),
                max_episodes=2)
    assert out["episodes"] >= 1


def test_demo_recorder_reference_layout(tmp_path):
    env = KinematicNavEnv(seed=3, image_hw=(32, 40))
    paths = record_episodes(env, scripted_pilot, str(tmp_path),
                            episodes=1, max_steps=20)
    d = np.load(paths[0])
    assert set(d.files) == {"obs", "act", "goal", "reward", "next_obs",
                            "next_goal", "done"}
    n = d["obs"].shape[0]
    assert d["obs"].shape == (n, 32, 40)       # squeezed (H,W,1)->(H,W)
    assert d["act"].shape == (n, 2)
    assert d["goal"].shape == (n, 4)
    assert d["done"].dtype == bool
    # no zero actions recorded (demonstration.py:269-270)
    assert (np.abs(d["act"]).sum(1) > 0).all()


def test_bc_dataset_loader_and_fit(tmp_path):
    env = KinematicNavEnv(seed=4, image_hw=(32, 40))
    record_episodes(env, scripted_pilot, str(tmp_path), episodes=2,
                    max_steps=20)
    obs, act, goal = load_bc_dataset(str(tmp_path / "RRC" / "jax" / "*.npz"))
    assert obs.shape[0] == act.shape[0] == goal.shape[0]

    from dgvit_tpu.agents.bc import BCTrainer
    from dgvit_tpu.models.policies import GoTPolicy

    model = GoTPolicy(block=1, head=2, l_f_size=32, mlp_dim=64,
                      image_size=(32, 40), patch_size=(16, 20),
                      final_norm="layer", emb_dropout=0.0)
    tr = BCTrainer(model=model, batch_size=4, seed=1)
    # single-frame (H, W) obs: feed as-is (no channel transpose)
    best, hist = tr.fit(obs, goal, act, epochs=2, to_chw=False)
    assert np.isfinite(hist["train"][-1])


def test_evaluate_driver(tmp_path):
    import jax

    from dgvit_tpu.core import checkpoint as ckpt
    from dgvit_tpu.models import build_actor
    from dgvit_tpu.train.evaluate import run_eval

    cfg = tiny_cfg(tmp_path)
    cfg.env.max_steps = 10
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(0), np.zeros((1, 32, 40)),
                        np.zeros((1, 2)))["params"]
    env = KinematicNavEnv(seed=5, image_hw=(32, 40))
    out = run_eval(cfg, env, params, max_episodes=2, out_dir=str(tmp_path))
    assert "success_rate" in out
    assert (tmp_path / "testing_data.txt").exists()


def test_device_rollout_eval_falls_back_on_unavailable(tmp_path, monkeypatch):
    """io_callback programs cannot run over the tunneled PJRT backend
    (reproducible UNAVAILABLE at setup); --device-rollout must fall back to
    the host loop instead of dying."""
    import jax

    from dgvit_tpu.models import build_actor
    from dgvit_tpu.train import evaluate as ev_mod
    from dgvit_tpu.train import device_rollout as dr_mod

    def boom(*a, **k):
        raise jax.errors.JaxRuntimeError(
            "UNAVAILABLE: TPU backend setup/compile error (Unavailable).")

    monkeypatch.setattr(dr_mod, "device_rollout", boom)
    cfg = tiny_cfg(tmp_path)
    cfg.env.max_steps = 10
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(0), np.zeros((1, 32, 40)),
                        np.zeros((1, 2)))["params"]
    env = KinematicNavEnv(seed=5, image_hw=(32, 40))
    out = ev_mod.run_eval(cfg, env, params, max_episodes=2,
                          out_dir=str(tmp_path), device_rollout_loop=True)
    assert "success_rate" in out    # host-loop fallback produced the report


def test_offline_training_from_demos(tmp_path):
    """BASELINE config #5: replay sample -> augment -> update, Gazebo-free."""
    from dgvit_tpu.train.train_offline import (
        fill_buffer_from_demos, train_offline)

    n = 16
    rng = np.random.default_rng(0)
    data = {
        "obs": rng.random((n, 32, 40), np.float32),
        "act": rng.uniform(-1, 1, (n, 2)).astype(np.float32),
        "goal": rng.random((n, 4), np.float32),
        "reward": rng.random(n).astype(np.float32),
        "next_obs": rng.random((n, 32, 40), np.float32),
        "next_goal": rng.random((n, 4), np.float32),
        "done": np.zeros(n, bool),
    }
    cfg = tiny_cfg(tmp_path)
    buf = fill_buffer_from_demos(data, cfg)
    assert buf.get_stored_size() == n
    state, stats = train_offline(cfg, buf, steps=5, out_dir=str(tmp_path),
                                 augment_sigma=50.0, log_every=2)
    assert stats["steps_per_sec"] > 0
    assert np.isfinite(stats["final"]["policy_loss"])
    assert int(state.itera) == 5


def test_pre_train_warm_start_loads_il_actor(tmp_path):
    """PRE_TRAIN: actor warm-started from an IL checkpoint (main.py:272-274)."""
    import jax
    from dgvit_tpu.agents import SACAgent
    from dgvit_tpu.core import checkpoint as ckpt

    cfg = tiny_cfg(tmp_path)
    donor = SACAgent(cfg)
    donor_state = donor.init_state(123)
    ckpt.save_params_npz(str(tmp_path / "il"), "warm",
                         jax.tree_util.tree_map(np.asarray,
                                                donor_state.actor_params))
    donor_actor = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
                   jax.tree_util.tree_flatten_with_path(
                       donor_state.actor_params)[0]}

    cfg2 = tiny_cfg(tmp_path)
    cfg2.train.pre_train = True
    cfg2.train.pre_train_model = str(tmp_path / "il" / "warm")
    env = KinematicNavEnv(seed=7, image_hw=(32, 40))
    out = train(cfg2, env, out_dir=str(tmp_path / "out"), max_episodes=0)
    got = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
           jax.tree_util.tree_flatten_with_path(
               out["state"].actor_params)[0]}
    for k in donor_actor:
        np.testing.assert_array_equal(donor_actor[k], got[k])


def test_if_test_loads_actor_and_critic_and_skips_learning(tmp_path):
    """IF_TEST: actor+critic loaded, target refreshed, no buffer writes
    (main.py:275-278; the t.if_test gate in the step loop)."""
    import jax
    from dgvit_tpu.agents import SACAgent

    cfg = tiny_cfg(tmp_path)
    donor = SACAgent(cfg)
    donor_state = donor.init_state(99)
    donor.save(donor_state, "m", str(tmp_path / "ckpt"), reward=1.0, seed=99)
    import glob as _g
    actor_file = _g.glob(str(tmp_path / "ckpt" / "*_actor.npz"))[0]
    base = actor_file[: -len("_actor.npz")]

    cfg2 = tiny_cfg(tmp_path, episodes=1)
    cfg2.train.if_test = True
    cfg2.train.test_model = base
    env = KinematicNavEnv(seed=8, image_hw=(32, 40))
    out = train(cfg2, env, out_dir=str(tmp_path / "out"), max_episodes=1)
    got_c = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
             jax.tree_util.tree_flatten_with_path(
                 out["state"].critic_params)[0]}
    want_c = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
              jax.tree_util.tree_flatten_with_path(
                  donor_state.critic_params)[0]}
    for k in want_c:  # critic untouched: loaded AND no learning happened
        np.testing.assert_array_equal(want_c[k], got_c[k])
    # target refreshed to the loaded critic (load_target)
    got_t = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
             jax.tree_util.tree_flatten_with_path(
                 out["state"].critic_target_params)[0]}
    for k in want_c:
        np.testing.assert_array_equal(want_c[k], got_t[k])


def test_per_training_loop_updates_priorities(tmp_path):
    """prioritized_replay=True drives learn_per + update_priorities
    end-to-end in train_rl (VERDICT Next #3)."""
    cfg = tiny_cfg(tmp_path)
    cfg.sac.prioritized_replay = True
    cfg.env.max_steps = 10
    env = KinematicNavEnv(seed=9, image_hw=(32, 40))
    out = train(cfg, env, out_dir=str(tmp_path), max_episodes=2)
    assert out["episodes"] >= 1
    assert np.isfinite(out["max_mean_reward"])


class _FakeTeleop:
    """Duck-typed intervention source (train_rl `intervention` contract)."""

    def __init__(self):
        self.engaged = True
        self.reads = 0

    def read_action(self):
        self.reads += 1
        return [0.3, 0.2]


def test_human_intervention_engage_rows_reach_guided_step(tmp_path):
    """Engage plumbing: with human_intervention + an engaged teleop and NO
    expert buffer, the loop must route through learn_guidence with engage=1
    rows (DRL.py:267-276) and execute the human command."""
    cfg = tiny_cfg(tmp_path)
    cfg.train.human_intervention = True
    cfg.env.max_steps = 10
    tele = _FakeTeleop()
    env = KinematicNavEnv(seed=10, image_hw=(32, 40))
    out = train(cfg, env, out_dir=str(tmp_path), max_episodes=2,
                intervention=tele)
    assert tele.reads > 0, "teleop commands were never read"
    assert out["episodes"] >= 1


def test_frame_stacked_live_loop(tmp_path):
    """env.use_frame_stack=True + model.patch_mode='channels': the online
    4-frame stack the reference records but never enables live
    (main.py:66-69,323 commented out; VERDICT r1 Missing #8)."""
    cfg = tiny_cfg(tmp_path)
    cfg.model.patch_mode = "channels"
    cfg.env.use_frame_stack = True
    cfg.env.frame_stack = 4
    cfg.env.max_steps = 10
    env = KinematicNavEnv(seed=11, image_hw=(32, 40))
    out = train(cfg, env, out_dir=str(tmp_path), max_episodes=2)
    assert out["episodes"] >= 1
    assert np.isfinite(out["max_mean_reward"])


def test_frame_stack_requires_channels_patch_mode(tmp_path):
    import pytest as _pytest

    cfg = tiny_cfg(tmp_path)
    cfg.env.use_frame_stack = True  # patch_mode left at '2d'
    env = KinematicNavEnv(seed=12, image_hw=(32, 40))
    with _pytest.raises(ValueError, match="channels"):
        train(cfg, env, out_dir=str(tmp_path), max_episodes=1)


def test_resume_continues_from_checkpoint(tmp_path):
    """Checkpoint/resume (SURVEY §5): a crashed run restarted with
    resume=True must pick up the saved train state (params + step counter),
    not restart from init — the elastic-recovery piece the reference lacks."""
    import jax
    from dgvit_tpu.agents import SACAgent
    from dgvit_tpu.core import checkpoint as ckpt

    cfg = tiny_cfg(tmp_path, episodes=2)
    cfg.env.max_steps = 10
    env = KinematicNavEnv(seed=13, image_hw=(32, 40))
    out1 = train(cfg, env, out_dir=str(tmp_path), max_episodes=2)
    saved = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
             jax.tree_util.tree_flatten_with_path(
                 out1["state"].actor_params)[0]}
    itera1 = int(out1["state"].itera)
    assert itera1 > 0
    assert list((tmp_path / "checkpoints").glob("step_*"))

    # "restart the process": fresh train() with resume=True, 0 new episodes
    env2 = KinematicNavEnv(seed=13, image_hw=(32, 40))
    out2 = train(cfg, env2, out_dir=str(tmp_path), max_episodes=0,
                 resume=True)
    got = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
           jax.tree_util.tree_flatten_with_path(
               out2["state"].actor_params)[0]}
    assert int(out2["state"].itera) == itera1
    for k in saved:
        np.testing.assert_array_equal(saved[k], got[k])


def test_prefetched_training_loop(tmp_path):
    """sac.prefetch_batches=True: background sampling thread + device_put
    overlap (replay/staging.py wired into the live loop, flag-gated because
    batches are up to depth steps stale vs the reference ordering)."""
    cfg = tiny_cfg(tmp_path)
    cfg.sac.prefetch_batches = True
    cfg.env.max_steps = 10
    env = KinematicNavEnv(seed=14, image_hw=(32, 40))
    out = train(cfg, env, out_dir=str(tmp_path), max_episodes=2)
    assert out["episodes"] >= 1
    assert np.isfinite(out["max_mean_reward"])


def test_evaluate_cli_from_train_state_checkpoint(tmp_path):
    """dgvit-test --checkpoint: evaluate the actor inside a train_rl
    periodic/elastic checkpoint directly (no npz export step) — the
    testing.py workflow applied to mid-run checkpoints."""
    import yaml

    from dgvit_tpu.train import evaluate

    cfg = tiny_cfg(tmp_path, episodes=1)
    cfg.env.max_steps = 10
    env = KinematicNavEnv(seed=21, image_hw=(32, 40))
    train(cfg, env, out_dir=str(tmp_path), max_episodes=1)
    ckpt_dir = tmp_path / "checkpoints"
    assert list(ckpt_dir.glob("step_*"))

    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(yaml.safe_dump(cfg.to_dict()))
    out = tmp_path / "eval_out"
    evaluate.main(["--checkpoint", str(ckpt_dir), "--config", str(cfg_yaml),
                   "--episodes", "1", "--out", str(out)])
    assert (out / "testing_data.txt").exists()

    # a specific step_N path is accepted too
    step = sorted(ckpt_dir.glob("step_*"))[0]
    evaluate.main(["--checkpoint", str(step), "--config", str(cfg_yaml),
                   "--episodes", "1", "--out", str(out)])

    # --actor and --checkpoint are mutually exclusive
    with pytest.raises(SystemExit):
        evaluate.main(["--checkpoint", str(ckpt_dir), "--actor", "x.npz",
                       "--config", str(cfg_yaml)])

    # --vec-eval: the whole protocol in one vectorized-env dispatch
    out_v = tmp_path / "eval_vec"
    evaluate.main(["--checkpoint", str(ckpt_dir), "--config", str(cfg_yaml),
                   "--episodes", "2", "--out", str(out_v), "--vec-eval"])
    assert (out_v / "testing_data.txt").exists()

    # held-out procedural-ensemble specs (rand<K>/randh<K>/randm<K>) exist
    # only on the vectorized path; main must not build the host env for
    # them (get_world knows presets, not specs — regression: the eager
    # host-env construction rejected every --vec-eval rand spec)
    out_h = tmp_path / "eval_heldout"
    evaluate.main(["--checkpoint", str(ckpt_dir), "--config", str(cfg_yaml),
                   "--episodes", "2", "--out", str(out_h), "--vec-eval",
                   "--world", "randm2"])
    assert (out_h / "testing_data.txt").exists()


def test_save_replay_warm_buffer_resume(tmp_path):
    """cfg.train.save_replay: periodic checkpoints snapshot the replay
    buffer (cpprb save/load_transitions semantics, DRL.py:505-510) and a
    resumed run starts with a WARM buffer instead of an empty one."""
    from dgvit_tpu.train import train_rl as trl

    cfg = tiny_cfg(tmp_path, episodes=2)
    cfg.env.max_steps = 10
    cfg.train.save_replay = True
    cfg.train.save_interval = 1
    env = KinematicNavEnv(seed=17, image_hw=(32, 40))
    train(cfg, env, out_dir=str(tmp_path), max_episodes=2)
    snaps = list((tmp_path / "checkpoints").glob("replay_step_*.npz"))
    assert snaps, "replay snapshot not written"
    # retention: snapshots pruned alongside step_* dirs
    assert len(snaps) <= 3

    seen = {}
    orig = trl.ReplayBuffer.load_transitions

    def spy(self, file):
        orig(self, file)
        seen["stored"] = self.get_stored_size()

    trl.ReplayBuffer.load_transitions = spy
    try:
        env2 = KinematicNavEnv(seed=17, image_hw=(32, 40))
        train(cfg, env2, out_dir=str(tmp_path), max_episodes=0, resume=True)
    finally:
        trl.ReplayBuffer.load_transitions = orig
    assert seen.get("stored", 0) > 0, "resume did not reload transitions"


def test_attention_maps_example(tmp_path):
    """examples/attention_maps.py end-to-end on a synthetic actor: captures
    per-block goal-token attention over a live episode and writes the PNG
    grid (the reference's get_local visualization workflow, Gazebo-free)."""
    import jax
    import numpy as np

    from dgvit_tpu.config import Config
    from dgvit_tpu.core import checkpoint as ckpt
    from dgvit_tpu.models import build_actor
    from examples.attention_maps import main as attn_main

    cfg = Config()
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(0), np.zeros((1, 128, 160)),
                        np.zeros((1, 2)))["params"]
    ckpt.save_params_npz(str(tmp_path), "viz", params)
    attn_main(["--actor", str(tmp_path / "viz_actor.npz"),
               "--steps", "3", "--every", "1",
               "--out", str(tmp_path / "attn")])
    assert (tmp_path / "attn" / "goal_attention.png").stat().st_size > 10_000
