"""Multi-host / multi-slice initialization.

Single-host multi-chip needs nothing: `jax.devices()` sees the slice and
core/mesh.py lays axes over it. For multi-host pods (or multi-slice over
DCN), call `initialize()` once per process before any jax compute; the mesh
construction is unchanged — XLA routes collectives over ICI within a slice
and DCN across slices based on device topology.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op when
    single-process."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes or os.environ["NUM_PROCESSES"]),
        process_id=int(process_id or os.environ["PROCESS_ID"]),
    )


def local_batch_slice(global_batch: int) -> slice:
    """The shard of a global batch this process should feed (data axis laid
    out process-major by make_mesh)."""
    import jax

    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
