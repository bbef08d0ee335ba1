"""Full train-state checkpointing.

The reference saves only actor/critic state_dicts with metrics-encoded
filenames (DRL.py:489-503) and loses optimizer/alpha/RNG state; replay
persistence is separate (DRL.py:505-510). Here the WHOLE SACTrainState
(params, target params, both optimizer states, log_alpha, step counter, RNG
key) checkpoints atomically via orbax, enabling true resume — plus
reference-style actor/critic exports with the same filename metadata so the
testing driver and external tools interoperate.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_train_state(directory: str, step: int, state: Any) -> str:
    """Atomic full-state checkpoint at directory/step_<N>."""
    ocp = _ocp()
    path = Path(directory).absolute() / f"step_{step}"
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, state), force=True)
    return str(path)


def restore_train_state(path: str, template: Any) -> Any:
    """Restore into the structure of `template` (an abstract or concrete
    SACTrainState built by SACAgent.init_state)."""
    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(Path(path).absolute(),
                             item=jax.tree_util.tree_map(np.asarray, template))
    return jax.tree_util.tree_map(lambda t, r: jax.numpy.asarray(r),
                                  template, restored)


def prune_checkpoints(directory: str, keep: int = 3) -> int:
    """Delete all but the newest `keep` step_<N> checkpoints (highest step
    wins). Long runs with periodic saves would otherwise accumulate unbounded
    checkpoint directories. Returns the number pruned."""
    import shutil

    d = Path(directory)
    if not d.exists():
        return 0
    steps = []
    for p in d.iterdir():
        m = re.fullmatch(r"step_(\d+)", p.name)
        if m:
            steps.append((int(m.group(1)), p))
    steps.sort()
    pruned = 0
    for _, p in steps[:-keep] if keep > 0 else steps:
        shutil.rmtree(p, ignore_errors=True)
        pruned += 1
    return pruned


def prune_step_files(directory: str, prefix: str, keep: int = 3) -> int:
    """Delete all but the newest `keep` `{prefix}_<N>.npz` sidecar files
    (e.g. replay snapshots riding alongside step_<N> checkpoints)."""
    d = Path(directory)
    if not d.exists():
        return 0
    found = []
    for p in d.iterdir():
        m = re.fullmatch(rf"{re.escape(prefix)}_(\d+)\.npz", p.name)
        if m:
            found.append((int(m.group(1)), p))
    found.sort()
    pruned = 0
    for _, p in found[:-keep] if keep > 0 else found:
        p.unlink(missing_ok=True)
        pruned += 1
    return pruned


def latest_checkpoint(directory: str) -> Optional[str]:
    d = Path(directory)
    if not d.exists():
        return None
    steps = []
    for p in d.iterdir():
        m = re.fullmatch(r"step_(\d+)", p.name)
        if m:
            steps.append((int(m.group(1)), p))
    if not steps:
        return None
    return str(max(steps)[1])


# -- reference-style named exports (DRL.py:489-497 filename contract) --------

def reference_name(filename: str, reward: float, seed: int,
                   nb_col: int = 100) -> str:
    """'%s_reward_%s_nbCol_%s_seed_%s' (DRL.py:490)."""
    return f"{filename}_reward_{reward}_nbCol_{nb_col}_seed_{seed}"


def save_params_npz(directory: str, name: str, params: Any, kind: str = "actor"):
    """Save a param tree as a flat npz ('<name>_actor.npz'), the analogue of
    torch.save(state_dict) (DRL.py:490-491)."""
    flat = {}

    def visit(path, leaf):
        key = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        flat[key] = np.asarray(leaf)

    jax.tree_util.tree_map_with_path(visit, params)
    os.makedirs(directory, exist_ok=True)
    out = Path(directory) / f"{name}_{kind}.npz"
    np.savez_compressed(out, **flat)
    return str(out)


def load_params_npz(path: str, template: Any) -> Any:
    """Inverse of save_params_npz; restores into template's tree structure."""
    data = np.load(path)

    def fetch(p, leaf):
        key = "/".join(str(x.key) for x in p if hasattr(x, "key"))
        arr = data[key]
        assert arr.shape == leaf.shape, f"{key}: {arr.shape} != {leaf.shape}"
        return jax.numpy.asarray(arr)

    return jax.tree_util.tree_map_with_path(fetch, template)
