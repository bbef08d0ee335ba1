"""Persistent XLA compilation cache enablement.

The flagship train path compiles whole-trunk Pallas kernels
(ops/trunk_train.py): Mosaic lowering of the fully-unrolled
fwd-recompute + reverse body costs ~60 s per distinct instantiation on the
tunneled backend. The compiled executable (Mosaic custom-call included) is
deterministic in the jaxpr + backend version, so a disk cache makes every
run after the first pay ~0 compile. Used by bench.py, __graft_entry__.py
and tests/conftest.py so driver re-runs stay inside their time budgets.

Cache directories are segregated by platform tag AND a local-CPU feature
fingerprint: the tunneled (axon) backend's executables embed host AOT code
compiled on the REMOTE machine (different CPU features — AMX etc.), and
loading such an entry from a CPU-backend process risks SIGILL ("Machine
type used for XLA:CPU compilation doesn't match", observed crashing the
8-device CPU dryrun). One shared flat dir mixed both; now axon entries
live under .jax_cache/axon-*, CPU entries under .jax_cache/cpu-*."""

from __future__ import annotations

import hashlib
import os


def _cpu_fingerprint() -> str:
    """Stable per-machine-type tag so cache dirs never cross CPU types."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:  # pragma: no cover - non-linux
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def cache_dir(platform_tag: str = "axon") -> str:
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    return os.path.join(root, f"{platform_tag}-{_cpu_fingerprint()}")


def enable_persistent_cache(path: str | None = None,
                            platform_tag: str = "axon") -> None:
    """Point jax at a persistent compilation cache directory (idempotent,
    safe on jax versions without the flags). Callers that force the CPU
    backend (tests, dryrun) pass platform_tag='cpu' AFTER switching so CPU
    and tunnel executables never share a directory."""
    import jax

    if path is None:
        path = cache_dir(platform_tag)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # 0.1 s: the single-core CI host pays for every sub-second compile
        # too — at 0.5 s dozens of small jits re-lowered on each tier run
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax
        pass
