"""Elastic training (core/elastic.py): checkpoint-coordinated restart after
a fault resumes BIT-EXACTLY, restart budget is enforced, and a checkpoint
written under one mesh topology resumes on a different one."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvit_tpu.agents import SACAgent
from dgvit_tpu.config import Config
from dgvit_tpu.core.elastic import (ElasticCheckpointer, SimulatedFault,
                                    default_failure_types, run_elastic)

IH, IW = (32, 40)
B = 4


def tiny_cfg():
    return Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (IH, IW), "patch_size": (16, 20)},
        "sac": {"batch_size": B},
    })


def step_batch(step: int, b: int = B):
    """Deterministic step-keyed batch — the elastic-resume contract."""
    ks = jax.random.split(jax.random.PRNGKey(1000 + step), 6)
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


N_STEPS = 8


def _train(agent, state, start, ckpt, fail_at=None):
    for step in range(start, N_STEPS):
        if fail_at is not None and step == fail_at:
            raise SimulatedFault(f"injected at step {step}")
        state, _ = agent.learn(state, step_batch(step))
        ckpt.maybe_save(step + 1, state)
    return state


@pytest.fixture(scope="module")
def agent():
    return SACAgent(tiny_cfg())


def _leaves(state):
    return jax.tree_util.tree_leaves(
        (state.actor_params, state.critic_params, state.log_alpha))


def test_fault_resume_bit_exact(agent, tmp_path):
    # uninterrupted run
    ref = _train(agent, agent.init_state(0),
                 0, ElasticCheckpointer(tmp_path / "ref", interval=100))

    # faulting run: dies at step 5 on the first attempt, resumes from the
    # step-3 checkpoint, finishes — must match bit-for-bit
    ckpt = ElasticCheckpointer(tmp_path / "elastic", interval=3)
    attempts = []

    def train_fn(state, start, c):
        attempts.append(start)
        return _train(agent, state, start, c,
                      fail_at=5 if len(attempts) == 1 else None)

    final = run_elastic(train_fn, lambda: agent.init_state(0), ckpt,
                        max_restarts=2)
    assert attempts == [0, 3], f"resume points: {attempts}"
    for a, b in zip(_leaves(final), _leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restart_budget_enforced(agent, tmp_path):
    ckpt = ElasticCheckpointer(tmp_path / "budget", interval=2)
    calls = []

    def always_fails(state, start, c):
        calls.append(start)
        raise SimulatedFault("persistent")

    with pytest.raises(SimulatedFault):
        run_elastic(always_fails, lambda: agent.init_state(0), ckpt,
                    max_restarts=2)
    assert len(calls) == 3  # initial + 2 restarts


def test_non_designated_errors_propagate(agent, tmp_path):
    ckpt = ElasticCheckpointer(tmp_path / "bug", interval=2)

    def buggy(state, start, c):
        raise ValueError("ordinary bug — must NOT be retried")

    with pytest.raises(ValueError):
        run_elastic(buggy, lambda: agent.init_state(0), ckpt, max_restarts=5)


def test_retention_pruning(agent, tmp_path):
    ckpt = ElasticCheckpointer(tmp_path / "keep", interval=1, keep=2)
    state = agent.init_state(0)
    for step in (1, 2, 3, 4):
        ckpt.save(step, state)
    kept = sorted(p.name for p in (tmp_path / "keep").iterdir())
    assert kept == ["step_3", "step_4"]


def test_failure_types_include_xla():
    names = [t.__name__ for t in default_failure_types()]
    assert "SimulatedFault" in names
    assert "JaxRuntimeError" in names  # device loss / XLA runtime failures


def test_offline_trainer_resumes_from_checkpointer(agent, tmp_path):
    """train_offline with a checkpointer: a second invocation picks up from
    the saved step instead of step 0."""
    from dgvit_tpu.replay.buffer import ReplayBuffer, reference_schema
    from dgvit_tpu.train.train_offline import train_offline

    cfg = tiny_cfg()
    buf = ReplayBuffer(64, reference_schema((IH, IW), 2, 2), seed=0)
    b0 = step_batch(0, b=16)
    buf.add(obs=np.asarray(b0["obs"]), act=np.asarray(b0["act"]),
            pobs=np.asarray(b0["pobs"]),
            next_pobs=np.asarray(b0["next_pobs"]),
            rew=np.asarray(b0["rew"]).ravel(),
            next_obs=np.asarray(b0["next_obs"]),
            done=np.zeros(16, np.float32), engage=np.zeros(16, np.float32))
    ckpt = ElasticCheckpointer(tmp_path / "off", interval=2)
    state, _ = train_offline(cfg, buf, steps=4, out_dir=str(tmp_path),
                             checkpointer=ckpt)
    itera_after_4 = int(state.itera)
    # resume: should start at step 4 and run only 2 more
    state2, _ = train_offline(cfg, buf, steps=6, out_dir=str(tmp_path),
                              checkpointer=ckpt)
    assert int(state2.itera) == itera_after_4 + 2


@pytest.mark.slow
def test_train_elastic_driver_survives_env_fault(tmp_path):
    """Full RL driver under the elastic supervisor: the env dies mid-episode
    on the first attempt; training restarts from the periodic checkpoint and
    completes."""
    from dgvit_tpu.envs.kinematic import KinematicNavEnv
    from dgvit_tpu.train.train_rl import train_elastic

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (IH, IW), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 256},
        "env": {"max_steps": 10, "max_episodes": 3},
        "train": {"pre_buffer": False, "plot_interval": 1000,
                  "eval_threshold": 0, "reward_threshold": 1e9,
                  "save_interval": 1},
    })
    built = []

    class FaultyEnv:
        def __init__(self, inner, fail):
            self._inner, self._fail, self._n = inner, fail, 0

        def __getattr__(self, k):
            return getattr(self._inner, k)

        def step(self, *a, **kw):
            self._n += 1
            if self._fail and self._n == 15:
                raise SimulatedFault("env died mid-episode")
            return self._inner.step(*a, **kw)

    def factory():
        env = FaultyEnv(KinematicNavEnv(seed=0, image_hw=(IH, IW)),
                        fail=not built)
        built.append(env)
        return env

    out = train_elastic(cfg, factory, out_dir=str(tmp_path), max_restarts=2,
                        max_episodes=3)
    assert len(built) == 2, "expected exactly one restart"
    assert out["episodes"] >= 1
    assert list((tmp_path / "checkpoints").glob("step_*"))


@pytest.mark.slow
@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_topology_elastic_resume(tmp_path):
    """Checkpoint written under a data=8 mesh resumes on a data=2,model=2
    mesh built from HALF the devices (simulating the loss of a host) and a
    sharded step still runs, matching the single-device trajectory."""
    from dgvit_tpu.core.elastic import reshard_state
    from dgvit_tpu.core.mesh import MeshRuntime
    from dgvit_tpu.parallel.shard import shard_batch, sharded_learn

    agent = SACAgent(tiny_cfg())
    rt8 = MeshRuntime.create(data=8, model=1)
    state = reshard_state(agent.init_state(0), rt8)
    ckpt = ElasticCheckpointer(tmp_path / "topo", interval=1)
    state, _ = sharded_learn(agent, rt8)(state, shard_batch(rt8, step_batch(0, b=8)))
    ckpt.save(1, state)

    # "lose a host": rebuild on 4 devices with a different axis split
    rt4 = MeshRuntime.create(data=2, model=2, devices=jax.devices()[:4])
    restored, start = ckpt.resume(agent.init_state(0))
    assert start == 1
    state4 = reshard_state(restored, rt4)
    state4, metrics = sharded_learn(agent, rt4)(
        state4, shard_batch(rt4, step_batch(1, b=8)))

    # single-device reference trajectory for the same two batches
    ref = agent.init_state(0)
    ref, _ = agent.learn(ref, step_batch(0, b=8))
    ref, ref_metrics = agent.learn(ref, step_batch(1, b=8))
    np.testing.assert_allclose(float(metrics["qf1_loss"]),
                               float(ref_metrics["qf1_loss"]),
                               rtol=2e-4, atol=2e-5)
