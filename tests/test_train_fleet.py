"""Fleet-collection training (train/train_fleet.py): N robots stream
transitions through on_transition into the shared replay buffer while one
SAC learner updates concurrently — the reference's train-while-collect loop
(main.py:369-394) scaled to a fleet sharing one batching actor server.

Covers:
  * transitions collected by robot threads land in the buffer and the
    learner consumes them (stores/learns correctly, VERDICT r3 next #2)
  * the update:step cadence target is tracked (reference 1:1, main.py:394)
  * params actually move and the learner's updates are published to the
    serving mailbox
  * PER and expert-guided (PRE_BUFFER) update variants dispatch
  * checkpoint written; CLI smoke
"""

import glob

import numpy as np
import pytest

import jax

from dgvit_tpu.config import Config
from dgvit_tpu.envs import KinematicNavEnv
from dgvit_tpu.train.train_fleet import train_fleet


def fleet_cfg(**sac):
    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 16, "mlp_dim": 32,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "env": {"max_steps": 12},
        "sac": {"batch_size": 16, "buffer_size": 4096, **sac},
    })
    cfg.train.save = False
    return cfg


def _envs(n, seed0=100):
    return [KinematicNavEnv(seed=seed0 + i, image_hw=(32, 40))
            for i in range(n)]


def test_fleet_collects_and_learns(tmp_path):
    cfg = fleet_cfg()
    cfg.train.save = True
    out = train_fleet(cfg, _envs(4), out_dir=str(tmp_path),
                      max_episodes=8, max_wait_ms=10.0)

    assert out["errors"] == {}
    assert out["episodes"] == 8
    assert out["env_steps"] > 0
    # every robot action went through the shared server (t==0 warm-up steps
    # request actions too but don't store, so rows >= stored steps)
    assert out["serving"]["requests"] == out["serving"]["rows"]
    assert out["serving"]["rows"] >= out["env_steps"]
    # the learner consumed the stream: cadence target is 1 update per step
    # once the buffer has a batch (warm-up steps can't update yet)
    assert 0 < out["updates"] <= out["env_steps"]
    assert int(out["state"].itera) == out["updates"]
    # params actually moved (the learner learned) ...
    from dgvit_tpu.agents import SACAgent

    agent_init = jax.tree_util.tree_leaves(
        SACAgent(cfg).init_state(cfg.train.seed).actor_params)
    final = jax.tree_util.tree_leaves(out["state"].actor_params)
    assert any(not np.allclose(a, b) for a, b in zip(agent_init, final))
    # ... and a resumable full train state was checkpointed
    assert glob.glob(str(tmp_path / cfg.train.checkpoint_dir / "step_*"))


def test_fleet_learner_drains_to_cadence_after_collection(tmp_path):
    """After collection ends the learner keeps updating until it reaches
    the updates_per_step target (unless it was already ahead)."""
    cfg = fleet_cfg()
    out = train_fleet(cfg, _envs(2), out_dir=str(tmp_path), max_episodes=4,
                      updates_per_step=0.5, max_wait_ms=10.0)
    want = int(out["env_steps"] * 0.5)
    # the learner drains the backlog fully once robots stop
    assert abs(out["updates"] - want) <= 1


def test_fleet_per_variant(tmp_path):
    cfg = fleet_cfg(prioritized_replay=True)
    out = train_fleet(cfg, _envs(2), out_dir=str(tmp_path), max_episodes=2,
                      max_wait_ms=10.0)
    assert out["updates"] > 0 and out["errors"] == {}


def test_fleet_dispatch_donation_interleave_stress(tmp_path):
    """Round-5 lock-scope regression (dev_lock covers ENQUEUE + publish
    only): 8 robots with zero coalescing wait and an update-heavy cadence
    maximize server-dispatch / donating-update interleave. A publication
    ordering bug resurfaces here as PJRT 'deleted/donated buffer' errors —
    robots report them through out['errors'] — or as a learner crash. PER
    exercises the outside-the-lock TD readback path specifically."""
    cfg = fleet_cfg(prioritized_replay=True)
    out = train_fleet(cfg, _envs(8), out_dir=str(tmp_path), max_episodes=8,
                      updates_per_step=2.0, max_wait_ms=0.0)
    assert out["errors"] == {}
    assert out["updates"] > 0
    assert int(out["state"].itera) == out["updates"]


def test_fleet_guided_variant(tmp_path):
    """PRE_BUFFER: expert demos feed learn_guidence alongside the fleet
    stream (main.py:223-268 + DRL.py guided update)."""
    from dgvit_tpu.train.demo_record import record_episodes, scripted_pilot

    cfg = fleet_cfg()
    cfg.train.pre_buffer = True
    env = KinematicNavEnv(seed=0, image_hw=(32, 40))
    record_episodes(env, scripted_pilot, str(tmp_path / "demos"),
                    episodes=2, max_steps=20)
    out = train_fleet(cfg, _envs(2), out_dir=str(tmp_path / "out"),
                      max_episodes=2,
                      expert_glob=str(tmp_path / "demos" / "RRC" / "jax"
                                      / "*.npz"),
                      max_wait_ms=10.0)
    assert out["updates"] > 0 and out["errors"] == {}


@pytest.mark.slow
def test_fleet_mesh_sharded_learner(tmp_path):
    """--mesh-data N: the fleet's learner runs as the equality-gated
    shard_map DP step over an 8-device mesh while robots collect through
    the (single-device) serving path — fleet collection composed with the
    multi-chip learner."""
    cfg = fleet_cfg()
    out = train_fleet(cfg, _envs(2), out_dir=str(tmp_path), max_episodes=2,
                      max_wait_ms=10.0, mesh_data=8)
    assert out["errors"] == {}
    assert out["updates"] > 0
    assert int(out["state"].itera) == out["updates"]


@pytest.mark.slow
def test_fleet_mesh_sharded_learner_guided_per(tmp_path):
    """guided+PER through the new shardmap_learn guided_per flavor, fed by
    live fleet collection."""
    from dgvit_tpu.train.demo_record import record_episodes, scripted_pilot

    cfg = fleet_cfg(prioritized_replay=True)
    cfg.train.pre_buffer = True
    env = KinematicNavEnv(seed=0, image_hw=(32, 40))
    record_episodes(env, scripted_pilot, str(tmp_path / "demos"),
                    episodes=2, max_steps=20)
    out = train_fleet(cfg, _envs(2), out_dir=str(tmp_path / "out"),
                      max_episodes=2, mesh_data=8,
                      expert_glob=str(tmp_path / "demos" / "RRC" / "jax"
                                      / "*.npz"),
                      max_wait_ms=10.0)
    assert out["updates"] > 0 and out["errors"] == {}


def test_fleet_resume(tmp_path):
    """--resume restores the checkpointed train state (warm weights; the
    buffer refills from fresh collection) and the learn-step counter
    continues instead of resetting."""
    cfg = fleet_cfg()
    cfg.train.save = True
    out1 = train_fleet(cfg, _envs(2), out_dir=str(tmp_path),
                       max_episodes=2, max_wait_ms=10.0)
    out2 = train_fleet(cfg, _envs(2), out_dir=str(tmp_path),
                       max_episodes=2, max_wait_ms=10.0, resume=True)
    assert int(out2["state"].itera) == \
        int(out1["state"].itera) + out2["updates"]


def test_fleet_episode_budget_must_divide():
    with pytest.raises(ValueError, match="divide evenly"):
        train_fleet(fleet_cfg(), _envs(3), max_episodes=4)


def test_cli_smoke(tmp_path, capsys):
    from dgvit_tpu.train import train_fleet as mod

    mod.main(["--fleet", "2", "--episodes", "2", "--out", str(tmp_path),
              "--config", _write_cfg(tmp_path)])
    assert "fleet train done" in capsys.readouterr().out


def _write_cfg(tmp_path):
    import yaml

    cfg = fleet_cfg()
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg.to_dict()))
    return str(p)
