"""Replay buffer tests: FIFO/ring semantics, priority sampling, persistence
(SURVEY.md §4 'replay buffer FIFO/priority semantics')."""

import numpy as np
import pytest

from dgvit_tpu.replay import PrioritizedReplayBuffer, ReplayBuffer
from dgvit_tpu.replay.buffer import reference_schema


def small_schema():
    return {
        "obs": {"shape": (4, 5)},
        "act": {"shape": (2,)},
        "rew": {"shape": ()},
        "done": {"shape": ()},
    }


def fill(buf, n, offset=0):
    for i in range(n):
        buf.add(obs=np.full((4, 5), i + offset, np.float32),
                act=np.array([i + offset, -(i + offset)], np.float32),
                rew=float(i + offset), done=0.0)


def test_add_and_stored_size():
    buf = ReplayBuffer(10, small_schema())
    assert buf.get_stored_size() == 0
    fill(buf, 3)
    assert buf.get_stored_size() == 3


def test_scalar_fields_return_column_vectors():
    """cpprb returns (n, 1) for scalar fields — the SAC step relies on the
    (B,1) reward broadcast (DRL.py:394)."""
    buf = ReplayBuffer(10, small_schema())
    fill(buf, 5)
    s = buf.sample(4)
    assert s["rew"].shape == (4, 1)
    assert s["obs"].shape == (4, 4, 5)


def test_ring_overwrite_fifo():
    buf = ReplayBuffer(4, small_schema())
    fill(buf, 6)  # values 0..5; ring keeps 2,3,4,5
    assert buf.get_stored_size() == 4
    s = buf.sample(256)
    vals = np.unique(s["rew"])
    assert vals.min() >= 2.0 and vals.max() <= 5.0
    assert set(vals.astype(int)) == {2, 3, 4, 5}


def test_sample_consistency_across_fields():
    buf = ReplayBuffer(16, small_schema())
    fill(buf, 16)
    s = buf.sample(64)
    # each sampled row must be internally consistent (same transition)
    np.testing.assert_allclose(s["obs"][:, 0, 0], s["rew"][:, 0])
    np.testing.assert_allclose(s["act"][:, 0], s["rew"][:, 0])


def test_batch_add():
    buf = ReplayBuffer(100, small_schema())
    n = buf.add(obs=np.zeros((7, 4, 5), np.float32),
                act=np.zeros((7, 2), np.float32),
                rew=np.arange(7, dtype=np.float32),
                done=np.zeros(7, np.float32))
    assert n == 7 and buf.get_stored_size() == 7


def test_prioritized_defaults_to_uniform_when_priorities_untouched():
    """The reference never calls update_priorities, so PER must behave
    uniformly (all priorities = max = 1.0)."""
    buf = PrioritizedReplayBuffer(8, small_schema(), seed=1)
    fill(buf, 8)
    s = buf.sample(4000)
    counts = np.bincount(s["rew"][:, 0].astype(int), minlength=8)
    # uniform: each of 8 values ~500; chi-square-ish loose band
    assert counts.min() > 350 and counts.max() < 650
    np.testing.assert_allclose(s["weights"], 1.0, atol=1e-9)


def test_prioritized_sampling_follows_priorities():
    buf = PrioritizedReplayBuffer(8, small_schema(), seed=2)
    fill(buf, 8)
    # make item 0 dominate
    buf.update_priorities(np.arange(8), np.array([100.0] + [1e-3] * 7))
    s = buf.sample(1000, beta=0.4)
    frac0 = (s["rew"][:, 0].astype(int) == 0).mean()
    assert frac0 > 0.9
    # importance weights: dominated items get weight 1 (max), item 0 less
    w0 = s["weights"][s["rew"][:, 0].astype(int) == 0]
    assert (w0 < 1.0).all()


def test_save_load_roundtrip(tmp_path):
    buf = ReplayBuffer(10, small_schema())
    fill(buf, 6)
    buf.save_transitions(str(tmp_path / "trans"))
    buf2 = ReplayBuffer(10, small_schema())
    buf2.load_transitions(str(tmp_path / "trans.npz"))
    assert buf2.get_stored_size() == 6
    s = buf2.sample(32)
    assert set(np.unique(s["rew"]).astype(int)) <= set(range(6))


def test_save_preserves_fifo_order_after_wrap(tmp_path):
    buf = ReplayBuffer(4, small_schema())
    fill(buf, 6)  # keeps 2,3,4,5 with oldest first
    buf.save_transitions(str(tmp_path / "wrap"))
    d = np.load(tmp_path / "wrap.npz")
    np.testing.assert_allclose(d["rew"], [2, 3, 4, 5])


def test_reference_schema_layout():
    sch = reference_schema()
    buf = ReplayBuffer(50, sch)
    buf.add(obs=np.zeros((128, 160), np.float32),
            act=np.zeros(2, np.float32), pobs=np.zeros(2, np.float32),
            next_pobs=np.zeros(2, np.float32), rew=1.0,
            next_obs=np.zeros((128, 160), np.float32), done=0.0, engage=0.0)
    s = buf.sample(2)
    assert s["obs"].shape == (2, 128, 160)
    assert s["rew"].shape == (2, 1)


def test_missing_field_raises():
    buf = ReplayBuffer(4, small_schema())
    with pytest.raises(KeyError):
        buf.add(obs=np.zeros((4, 5), np.float32))


def test_prefetcher_streams_batches():
    from dgvit_tpu.replay import BatchPrefetcher

    buf = ReplayBuffer(16, small_schema())
    fill(buf, 16)
    pf = BatchPrefetcher(lambda: buf.sample(4), depth=2)
    got = [next(pf) for _ in range(3)]
    assert all(g["obs"].shape == (4, 4, 5) for g in got)
    pf.close()


def test_prioritized_buffer_at_1M_scale():
    """VERDICT r1 Weak #4 regression: min-priority tracking must stay
    O(log n) — exercised here at the 1M-transition scale a TPU pipeline
    invites (correctness; BENCH.md records the timing: 272us sample(256),
    43us update_priorities on this host)."""
    import numpy as np

    from dgvit_tpu.replay.buffer import (PrioritizedReplayBuffer,
                                         reference_schema)

    n = 1_000_000
    buf = PrioritizedReplayBuffer(n, reference_schema((2, 2), 2, 2), seed=0)
    chunk = 100_000
    f = dict(obs=np.zeros((chunk, 2, 2), np.float32),
             act=np.zeros((chunk, 2), np.float32),
             pobs=np.zeros((chunk, 2), np.float32),
             next_pobs=np.zeros((chunk, 2), np.float32),
             rew=np.zeros(chunk, np.float32),
             next_obs=np.zeros((chunk, 2, 2), np.float32),
             done=np.zeros(chunk, np.float32),
             engage=np.zeros(chunk, np.float32))
    for _ in range(n // chunk):
        buf.add(**f)
    assert buf.get_stored_size() == n
    b = buf.sample(256)
    assert b["indexes"].max() < n
    assert np.isfinite(b["weights"]).all() and b["weights"].max() <= 1.0 + 1e-6
    # skew priorities hard and verify IS weights react (min-tree live)
    buf.update_priorities(np.arange(256, dtype=np.uint64),
                          np.full(256, 1000.0))
    b2 = buf.sample(256)
    assert np.isfinite(b2["weights"]).all()
