"""Persistent XLA compilation cache enablement.

The flagship train path compiles whole-trunk Pallas kernels
(ops/trunk_train.py): Mosaic lowering of the fully-unrolled
fwd-recompute + reverse body costs ~60 s per distinct instantiation on the
tunneled backend. The compiled executable (Mosaic custom-call included) is
deterministic in the jaxpr + backend version, so a disk cache makes every
run after the first pay ~0 compile. Used by bench.py, __graft_entry__.py
and tests/conftest.py so driver re-runs stay inside their time budgets.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    """Point jax at a persistent compilation cache directory (idempotent,
    safe on jax versions without the flags)."""
    import jax

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax
        pass
