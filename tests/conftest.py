"""Test harness: run everything on a virtual 8-device CPU mesh so the
`data`/`model` sharding paths are exercised without TPU hardware
(SURVEY.md §4 'Distributed')."""

import os

# Must run before any jax compute. Hard assignment: the machine's
# sitecustomize exports JAX_PLATFORMS=axon (a tunneled TPU) and eagerly
# registers that backend, so the env var alone is not enough — the config
# flag below is what actually forces the CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"

# Persistent compilation cache: the tier is compile-bound (VERDICT r2 Weak
# #7); repeated runs re-lower identical jaxprs. Cache compiled executables
# under .jax_cache so the second-and-later full runs skip XLA compilation.
# platform_tag='cpu': tunnel-backend executables embed REMOTE-host AOT
# code (AMX machine) — loading them in a CPU process risks SIGILL, so the
# dirs are segregated (utils/compcache.py)
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dgvit_tpu.utils.compcache import enable_persistent_cache

enable_persistent_cache(platform_tag="cpu")

from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = Path("/root/reference/src/vis_nav/vis_nav")

import pytest


@pytest.fixture(scope="session")
def reference_modules():
    """Import the PyTorch reference (read-only) for parity oracles.
    Skips cleanly when the reference tree or torch deps are unavailable."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference tree not mounted")
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        import GoalFormer  # noqa: F401
        import got_sac_network  # noqa: F401
    except ImportError as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    return GoalFormer, got_sac_network
