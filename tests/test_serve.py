"""Serving layer: AOT export roundtrip + batching server semantics.

The exported artifact must reproduce the evaluation drivers' deterministic
action map exactly (train/evaluate.py:66-92 — tanh(mean), and env-units
command scaling main.py:320,370), survive serialize/deserialize, accept any
batch size through the symbolic batch dim, and carry a TPU lowering in the
same artifact. The server must batch concurrent clients into fewer
dispatches without changing any client's answer.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvit_tpu.config import Config
from dgvit_tpu.models import build_actor
from dgvit_tpu.serve import (BatchingActorServer, export_actor, load_actor,
                             make_action_fn)


@pytest.fixture(scope="module")
def small_cfg():
    cfg = Config()
    cfg.model.latent_size = 16
    cfg.model.dim_head = 16
    cfg.model.mlp_dim = 32
    cfg.model.block = 2
    cfg.model.head = 2
    cfg.model.image_size = [32, 40]
    return cfg


@pytest.fixture(scope="module")
def actor_params(small_cfg):
    actor = build_actor(small_cfg)
    v = actor.init(jax.random.PRNGKey(0), np.zeros((1, 32, 40)),
                   np.zeros((1, 2)))
    return v["params"]


def _ref_actions(cfg, params, obs, goal):
    actor = build_actor(cfg)
    mean, _ = actor.apply({"params": params}, obs, goal)
    return np.tanh(np.asarray(mean, np.float32))


def test_export_roundtrip_symbolic_batch(small_cfg, actor_params, tmp_path):
    data = export_actor(small_cfg, actor_params, platforms=["cpu"])
    p = tmp_path / "actor.stablehlo"
    p.write_bytes(data)
    act = load_actor(p.read_bytes())
    for b in (1, 3, 8):  # symbolic batch: any size through one artifact
        obs = np.random.default_rng(b).uniform(0, 1, (b, 32, 40)).astype(np.float32)
        goal = np.random.default_rng(b + 50).normal(0, 0.3, (b, 2)).astype(np.float32)
        got = np.asarray(act(obs, goal))
        ref = _ref_actions(small_cfg, actor_params, obs, goal)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_export_env_units(small_cfg, actor_params):
    """env_units bakes clip + command scaling: artifact emits robot
    commands a_in=[(a0+1)*L_SCALE, a1*A_SCALE] (main.py:320,370)."""
    act = load_actor(export_actor(small_cfg, actor_params, env_units=True,
                                  platforms=["cpu"]))
    obs = np.random.default_rng(0).uniform(0, 1, (4, 32, 40)).astype(np.float32)
    goal = np.zeros((4, 2), np.float32)
    got = np.asarray(act(obs, goal))
    e = small_cfg.env
    a = _ref_actions(small_cfg, actor_params, obs, goal)
    a = a.clip(-e.max_action, e.max_action)
    ref = np.stack([(a[:, 0] + 1) * e.linear_cmd_scale,
                    a[:, 1] * e.angular_cmd_scale], axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-6)
    assert got[:, 0].min() >= 0.0  # linear command is non-negative


def test_export_multi_platform_and_fixed_batch(small_cfg, actor_params):
    data = export_actor(small_cfg, actor_params, platforms=["cpu", "tpu"],
                        batch=4)
    exp = jax.export.deserialize(data)
    assert set(exp.platforms) == {"cpu", "tpu"}
    obs = np.zeros((4, 32, 40), np.float32)
    out = np.asarray(exp.call(obs, np.zeros((4, 2), np.float32)))
    assert out.shape == (4, 2)
    with pytest.raises(Exception):  # fixed batch rejects other sizes
        exp.call(np.zeros((2, 32, 40), np.float32), np.zeros((2, 2), np.float32))


def test_export_cli(small_cfg, actor_params, tmp_path):
    from dgvit_tpu.core import checkpoint as ckpt
    from dgvit_tpu.serve.export import main as export_cli

    # the CLI rebuilds the default-config actor; save matching-shape params
    cfg = Config()
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(1), np.zeros((1, 128, 160)),
                        np.zeros((1, 2)))["params"]
    ckpt.save_params_npz(str(tmp_path), "served", params)
    out = tmp_path / "actor.stablehlo"
    export_cli(["--actor", str(tmp_path / "served_actor.npz"),
                "--out", str(out), "--platforms", "cpu", "--batch", "2"])
    act = load_actor(out.read_bytes())
    obs = np.random.default_rng(2).uniform(0, 1, (2, 128, 160)).astype(np.float32)
    goal = np.zeros((2, 2), np.float32)
    ref = _ref_actions(cfg, params, obs, goal)
    np.testing.assert_allclose(np.asarray(act(obs, goal)), ref, atol=1e-6)


def test_batching_server_correctness_and_coalescing(small_cfg, actor_params):
    calls = []
    base = jax.jit(make_action_fn(small_cfg, actor_params))

    def counting_act(obs, goal):
        calls.append(obs.shape[0])
        return base(obs, goal)

    rng = np.random.default_rng(7)
    reqs = [(rng.uniform(0, 1, (32, 40)).astype(np.float32),
             rng.normal(0, 0.3, 2).astype(np.float32)) for _ in range(16)]
    with BatchingActorServer(counting_act, max_wait_ms=50.0,
                             buckets=(1, 2, 4, 8, 16)) as srv:
        # warm the jit outside the timed window so coalescing is reliable
        srv.act(reqs[0][0], reqs[0][1])
        barrier = threading.Barrier(16)
        futs = [None] * 16

        def client(i):
            barrier.wait()
            futs[i] = srv.submit(*reqs[i])

        ts = [threading.Thread(target=client, args=(i,)) for i in range(16)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        outs = [f.result(timeout=30) for f in futs]
        st = srv.stats()

    for (obs, goal), out in zip(reqs, outs):
        ref = _ref_actions(small_cfg, actor_params, obs[None], goal[None])[0]
        np.testing.assert_allclose(out, ref, atol=1e-6)
        assert out.shape == (2,)  # single request -> unbatched result
    # 16 concurrent single-frame requests must coalesce into FEWER
    # dispatches than requests (the first warmup call stands alone)
    assert st["requests"] == 17
    assert st["dispatches"] < 17, f"no batching happened: {calls}"


def test_batching_server_padding_and_oversize(small_cfg, actor_params):
    shapes = []
    base = jax.jit(make_action_fn(small_cfg, actor_params))

    def record_act(obs, goal):
        shapes.append(obs.shape[0])
        return base(obs, goal)

    rng = np.random.default_rng(3)
    obs = rng.uniform(0, 1, (11, 32, 40)).astype(np.float32)
    goal = rng.normal(0, 0.3, (11, 2)).astype(np.float32)
    with BatchingActorServer(record_act, max_wait_ms=1.0,
                             buckets=(1, 2, 4)) as srv:
        out = srv.act(obs, goal)       # 11 rows > max bucket 4
    ref = _ref_actions(small_cfg, actor_params, obs, goal)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # chunks 4+4+3 -> padded shapes 4, 4, 4 (static bucket grid only)
    assert shapes == [4, 4, 4]


def test_server_surfaces_worker_errors(small_cfg, actor_params):
    def broken(obs, goal):
        raise RuntimeError("device fell over")

    with BatchingActorServer(broken, max_wait_ms=1.0) as srv:
        fut = srv.submit(np.zeros((32, 40), np.float32),
                         np.zeros(2, np.float32))
        with pytest.raises(RuntimeError, match="device fell over"):
            fut.result(timeout=10)


def test_server_survives_cancelled_future(small_cfg, actor_params):
    """A client cancelling its pending future must not kill the worker
    thread (set_result on a cancelled future raises InvalidStateError) —
    later requests still get answers."""
    import time

    base = jax.jit(make_action_fn(small_cfg, actor_params))
    gate = threading.Event()

    def slow_act(obs, goal):
        gate.wait(10)
        return base(obs, goal)

    obs = np.zeros((32, 40), np.float32)
    goal = np.zeros(2, np.float32)
    with BatchingActorServer(slow_act, max_wait_ms=1.0) as srv:
        fut = srv.submit(obs, goal)
        time.sleep(0.05)   # worker collects the batch, blocks in slow_act
        fut.cancel()       # a PENDING future cancels; the worker later
        gate.set()         # tries set_result on it mid-dispatch
        out = srv.act(obs, goal, timeout=30)   # server must still answer
    assert out.shape == (2,)


def test_close_fails_stragglers_instead_of_hanging(small_cfg, actor_params):
    """A request that races close() past the sentinel is failed with
    RuntimeError rather than left to block forever."""
    base = jax.jit(make_action_fn(small_cfg, actor_params))
    srv = BatchingActorServer(base, max_wait_ms=1.0)
    srv.close()
    # enqueue directly past the closed gate (simulates the submit/close
    # interleaving where the closed check passed before close() ran)
    from concurrent.futures import Future
    fut = Future()
    srv._q.put((np.zeros((1, 32, 40), np.float32),
                np.zeros((1, 2), np.float32), True, fut))
    srv.close()
    with pytest.raises(RuntimeError, match="server closed"):
        fut.result(timeout=5)


def test_export_deterministic_actor(small_cfg):
    """Deterministic* actors return the squashed action directly — export
    must not double-tanh (got_sac_network.py:385,447)."""
    import copy

    cfg = copy.deepcopy(small_cfg)
    cfg.model.actor_type = "DeterministicTransformer"
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(2), np.zeros((1, 32, 40)),
                        np.zeros((1, 2)))["params"]
    act = load_actor(export_actor(cfg, params, platforms=["cpu"]))
    obs = np.random.default_rng(4).uniform(0, 1, (3, 32, 40)).astype(np.float32)
    goal = np.zeros((3, 2), np.float32)
    ref = np.asarray(actor.apply({"params": params}, obs, goal), np.float32)
    np.testing.assert_allclose(np.asarray(act(obs, goal)), ref, atol=1e-6)
