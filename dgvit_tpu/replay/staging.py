"""Host -> HBM staging: overlap replay sampling/transfer with the train step.

The reference's learn() blocks on cpprb sampling + H2D copies every step
(DRL.py:375-386). Here a background thread keeps `depth` batches in flight:
while the device crunches step N, the host samples and `jax.device_put`s
step N+1 (device_put is async, so the DMA overlaps compute).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Optional

import jax
import numpy as np


class BatchPrefetcher:
    """Iterator over device-resident batches produced by `sample_fn`."""

    def __init__(self, sample_fn: Callable[[], Dict[str, np.ndarray]],
                 depth: int = 2, sharding=None):
        self._sample_fn = sample_fn
        self._sharding = sharding
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put(self, batch):
        if self._sharding is not None:
            batch = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._sharding), batch)
        else:
            batch = jax.tree_util.tree_map(jax.device_put, batch)
        self._q.put(batch)

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = self._sample_fn()
            except Exception as e:
                # surface the sampler failure to the consumer instead of
                # silently ending iteration with no diagnostic
                self._error = e
                self._q.put(None)
                return
            self._put(batch)

    def __iter__(self):
        return self

    def __next__(self):
        batch = self._q.get()
        if batch is None:
            if self._error is not None and not self._stop.is_set():
                raise RuntimeError(
                    "BatchPrefetcher sample_fn failed") from self._error
            raise StopIteration
        return batch

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
