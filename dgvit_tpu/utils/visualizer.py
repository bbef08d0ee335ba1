"""Attention visualizer — the functional replacement for the reference's
bytecode-rewriting `get_local` decorator (visualizer.py:3-42, hooked at
simple_vit.py:61).

The reference mutated compiled bytecode to siphon a local variable into a
class-level cache. In functional JAX the same capability is a flag: modules
built with `capture=True` sow their softmax maps into the 'intermediates'
collection, and this wrapper exposes them with the reference's cache API
(activate / clear / cache dict keyed by module path). Zero cost when
inactive — the fused attention kernel path never materializes the maps.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np


class AttentionVisualizer:
    """Usage:
        viz = AttentionVisualizer(model_capture, params)   # capture=True twin
        out = viz(imgs, goals)                             # when activated
        viz.cache -> {'<module path>': np.ndarray (B, H, N, N), ...}
    """

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self.is_activate = False
        self.cache: Dict[str, np.ndarray] = {}

    def activate(self):
        self.is_activate = True

    def deactivate(self):
        self.is_activate = False

    def clear(self):
        self.cache = {}

    def __call__(self, *args, **kwargs):
        if not self.is_activate:
            return self.model.apply(self.params, *args, **kwargs)
        out, state = self.model.apply(self.params, *args,
                                      mutable=["intermediates"], **kwargs)
        self._ingest(state["intermediates"])
        return out

    def _ingest(self, intermediates):
        flat = jax.tree_util.tree_flatten_with_path(intermediates)[0]
        for path, leaf in flat:
            key = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            self.cache[key] = np.asarray(leaf)

    # convenience: per-layer goal-token attention (x[:, 0] row)
    def goal_token_attention(self) -> Dict[str, np.ndarray]:
        return {k: v[..., 0, :] for k, v in self.cache.items()
                if v.ndim == 4}
