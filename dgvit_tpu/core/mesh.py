"""Mesh / runtime layer: one API from a single chip to a pod slice.

Replaces the reference's single `torch.device('cuda' if available else 'cpu')`
(reference: DRL.py:41, main.py:132) with named-axis sharding over a
`jax.sharding.Mesh`. Axes:

  data  — batch sharding for the SAC/BC train step (gradient psum over ICI)
  model — tensor parallelism over the ViT MLP / QKV contractions
  seq   — reserved for token-stream sharding (65 tokens today; ring/blockwise
          attention activates it for longer streams, SURVEY.md §2.3)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_MODEL = "model"
AXIS_SEQ = "seq"

# ---------------------------------------------------------------------------
# Active-mesh registry: models that optionally shard over a mesh axis (ring
# attention over `seq`) look the mesh up here instead of threading a Mesh
# through every flax module. Set by parallel.sharded_learn / use_mesh().
# ---------------------------------------------------------------------------
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


class use_mesh:
    """Context manager: enter the jax Mesh context AND publish it to the
    registry so seq-sharded attention layers can find it."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        self._prev = active_mesh()
        set_active_mesh(self.mesh)
        self._ctx = self.mesh
        self._ctx.__enter__()
        return self.mesh

    def __exit__(self, *exc):
        self._ctx.__exit__(*exc)
        set_active_mesh(self._prev)
        return False


def make_mesh(
    data: int = -1,
    model: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model, seq) mesh. data=-1 absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (model * seq) == 0, f"{n} devices not divisible by model*seq"
        data = n // (model * seq)
    assert data * model * seq == n, (
        f"mesh {data}x{model}x{seq} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, model, seq)
    return Mesh(arr, (AXIS_DATA, AXIS_MODEL, AXIS_SEQ))


@dataclasses.dataclass
class MeshRuntime:
    """Holds the mesh plus canonical shardings for the train step."""

    mesh: Mesh

    @classmethod
    def create(cls, data: int = -1, model: int = 1, seq: int = 1,
               devices: Optional[Sequence[jax.Device]] = None) -> "MeshRuntime":
        return cls(mesh=make_mesh(data, model, seq, devices))

    # ---- canonical shardings ------------------------------------------------
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def batch_sharding(self, ndim: int = 1) -> NamedSharding:
        """Shard leading (batch) dim over `data`, replicate the rest."""
        return NamedSharding(self.mesh, P(AXIS_DATA, *([None] * (ndim - 1))))

    def shard_batch(self, tree):
        """Place a pytree of batch arrays with the batch dim over `data`."""
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.batch_sharding(np.ndim(x))), tree
        )

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated())

    def param_sharding(self, params):
        """Model-parallel parameter layout: shard the two big MLP matmuls of
        each transformer block over `model`; everything else replicated.

        The active GoT config (dim 64, mlp_dim 2048; reference
        got_sac_network.py:176-185) only has meaningful TP on the MLP. The rule
        is shape-based so it applies to any backbone: last dim sharded for
        up-projections (in < out), first dim for down-projections (in > out),
        matching Megatron column/row parallel layout so the pair needs a single
        psum which XLA inserts automatically.
        """
        msize = self.mesh.shape[AXIS_MODEL]

        def spec(path, x):
            if msize == 1 or x.ndim != 2:
                return NamedSharding(self.mesh, P())
            name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
            din, dout = x.shape
            if "ff" in name or "mlp" in name:
                if dout > din and dout % msize == 0:
                    return NamedSharding(self.mesh, P(None, AXIS_MODEL))
                if din > dout and din % msize == 0:
                    return NamedSharding(self.mesh, P(AXIS_MODEL, None))
            if "qkv" in name and dout % msize == 0:
                return NamedSharding(self.mesh, P(None, AXIS_MODEL))
            if ("attn/out" in name or "to_out" in name) and din % msize == 0:
                return NamedSharding(self.mesh, P(AXIS_MODEL, None))
            return NamedSharding(self.mesh, P())

        return jax.tree_util.tree_map_with_path(spec, params)

    def shard_params(self, params):
        shardings = self.param_sharding(params)
        return jax.tree_util.tree_map(jax.device_put, params, shardings)
