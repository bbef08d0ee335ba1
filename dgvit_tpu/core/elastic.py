"""Elastic training: checkpoint-coordinated restart + topology-elastic resume.

The reference has no failure handling for compute (SURVEY.md §5 — its only
recovery paths are episode-level "Bad Initialization" skips). A TPU-pod
training job needs more: preemptions, device loss, and slice resizes are
routine. This module provides the three pieces:

  * `ElasticCheckpointer` — periodic full-train-state checkpoints
    (core/checkpoint.py orbax trees) with retention pruning, multi-host
    write coordination (process 0 writes after a cross-host barrier), and
    latest-checkpoint resume.
  * `run_elastic` — a supervision loop: runs the training function, and on a
    designated failure (XLA device errors, or `SimulatedFault` in tests)
    restores from the newest checkpoint and restarts, up to `max_restarts`.
    Because the full SACTrainState (params, targets, both optimizers, alpha,
    step, RNG key) is checkpointed, the resumed trajectory is bit-identical
    to an uninterrupted run when the data stream is step-keyed.
  * `reshard_state` — topology elasticity: a checkpoint written under one
    mesh layout restores as host arrays and is re-placed onto ANY new mesh
    (e.g. resume an 8-chip run on 4 chips after losing a host) via the same
    shape-based sharding rules used at cold start (parallel/shard.py).
"""

from __future__ import annotations

import logging
import shutil
import time
from pathlib import Path
from typing import Any, Callable, Optional, Sequence, Tuple

from dgvit_tpu.core.checkpoint import (latest_checkpoint, restore_train_state,
                                       save_train_state)

log = logging.getLogger("dgvit.elastic")


class SimulatedFault(RuntimeError):
    """Raised by fault-injection hooks in tests / chaos drills."""


def default_failure_types() -> Tuple[type, ...]:
    """Failure classes that warrant a checkpoint-resume restart (device loss
    / XLA runtime errors), never ordinary Python bugs."""
    types = [SimulatedFault]
    try:
        from jax.errors import JaxRuntimeError
        types.append(JaxRuntimeError)
    except Exception:  # pragma: no cover - jax layout changes
        pass
    return tuple(types)


class ElasticCheckpointer:
    """Periodic coordinated checkpoints with retention + resume.

    Multi-host protocol: every process reaches a barrier (so all shards of
    the state are final), every process gathers the full host tree and
    enters the collective orbax save (array data is written by the primary
    host only; orbax coordinates its own internal barriers), process 0
    prunes, everyone leaves through a second barrier. Single-process (and
    the CPU test mesh) skips the barriers. Exercised by a REAL two-process
    Gloo job in tests/test_multiprocess.py."""

    def __init__(self, directory: str, interval: int = 50, keep: int = 3):
        assert interval >= 1
        self.directory = str(directory)
        self.interval = interval
        self.keep = keep

    # -- coordination ------------------------------------------------------
    def _barrier(self, tag: str):
        import jax

        if jax.process_count() > 1:  # pragma: no cover - subprocess-only
            # exercised for real by tests/test_multiprocess.py (2-process
            # Gloo job); pytest-cov cannot see into those subprocesses
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"dgvit-ckpt-{tag}")

    def _gather_host(self, state: Any) -> Any:
        """Bring every leaf to host memory as a full array.

        Cross-process leaves (global jax.Arrays that are not fully
        addressable — sharded OR replicated over a multi-process mesh) go
        through `process_allgather(tiled=True)`, which returns the full
        global value on every process. `tiled=False` (the old default here)
        RAISES on such arrays — caught by the real two-process test
        (tests/test_multiprocess.py), not reproducible single-process.
        Host/numpy leaves are identical on every process by the replicated
        train-state contract, so the local copy is the global value."""
        import jax
        import numpy as np

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            def leaf(x):
                if isinstance(x, jax.Array) and not x.is_fully_addressable:
                    return multihost_utils.process_allgather(x, tiled=True)
                return np.asarray(x)

            return jax.tree_util.tree_map(leaf, state)
        return jax.tree_util.tree_map(np.asarray, state)

    # -- save/prune/resume ---------------------------------------------------
    def save(self, step: int, state: Any) -> Optional[str]:
        """EVERY process must call this (collective). orbax's Checkpointer
        runs its own cross-process barriers inside save() — a proc-0-only
        call desynchronizes those barriers and crashes the job (observed:
        'sync_global_devices name mismatch (Checkpointer:save_start)').
        All processes therefore enter save_train_state with the same gathered
        host tree; orbax writes array data from the primary host only."""
        import jax

        self._barrier(f"pre-{step}")
        host_state = self._gather_host(state)
        path = save_train_state(self.directory, step, host_state)
        if jax.process_index() == 0:
            self._prune()
        self._barrier(f"post-{step}")
        return path

    def maybe_save(self, step: int, state: Any) -> Optional[str]:
        if step > 0 and step % self.interval == 0:
            return self.save(step, state)
        return None

    def _prune(self):
        d = Path(self.directory)
        ckpts = sorted((int(p.name.split("_")[1]), p)
                       for p in d.iterdir()
                       if p.name.startswith("step_") and
                       p.name.split("_")[1].isdigit())
        for _, p in ckpts[:-self.keep] if self.keep else []:
            shutil.rmtree(p, ignore_errors=True)

    def resume(self, template: Any) -> Tuple[Any, int]:
        """(state, start_step): the newest checkpoint restored into
        `template`'s structure, or (template, 0) on a cold start."""
        path = latest_checkpoint(self.directory)
        if path is None:
            return template, 0
        step = int(Path(path).name.split("_")[1])
        return restore_train_state(path, template), step


def reshard_state(state: Any, runtime) -> Any:
    """Re-place a (host or differently-sharded) SACTrainState onto a new
    mesh — the topology-elastic half of resume. Uses the cold-start
    placement rules, so a job checkpointed at 8 chips resumes at 4 (or 32)
    with no layout metadata in the checkpoint itself."""
    from dgvit_tpu.parallel.shard import shard_sac_state
    return shard_sac_state(runtime, state)


def run_elastic(train_fn: Callable[[Any, int, "ElasticCheckpointer"], Any],
                template_fn: Callable[[], Any],
                checkpointer: ElasticCheckpointer,
                max_restarts: int = 3,
                failure_types: Optional[Sequence[type]] = None,
                backoff_s: float = 0.0) -> Any:
    """Supervised training with checkpoint-coordinated restarts.

    train_fn(state, start_step, checkpointer) runs the loop (calling
    checkpointer.maybe_save) and returns the final state. On a failure of a
    designated type the loop restores the newest checkpoint and restarts;
    anything else propagates immediately."""
    failure_types = tuple(failure_types or default_failure_types())
    restarts = 0
    while True:
        state, start = checkpointer.resume(template_fn())
        if start:
            log.warning("elastic resume from step %d (restart %d)",
                        start, restarts)
        try:
            return train_fn(state, start, checkpointer)
        except failure_types as e:
            restarts += 1
            if restarts > max_restarts:
                log.error("elastic: giving up after %d restarts", max_restarts)
                raise
            log.warning("elastic: %s: %s — restarting (%d/%d)",
                        type(e).__name__, e, restarts, max_restarts)
            if backoff_s:
                time.sleep(backoff_s)
