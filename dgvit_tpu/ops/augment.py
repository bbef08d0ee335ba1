"""Update-time image augmentation for RL from pixels.

`random_shift` is the DrQ-v2 augmentation (pad-by-replication + random
crop, Yarats et al. 2021; see also "Evaluating Vision Transformer Methods
for Deep RL from Pixels", PAPERS.md — augmentation is the make-or-break
regularizer for ViT encoders in pixel RL). The reference trains on raw
replayed frames, so this is an opt-in extension (`sac.aug_shift`), not a
parity path.

TPU notes: the whole transform is jit-friendly — one `jnp.pad` (edge mode)
plus a vmapped `dynamic_slice` at per-sample integer offsets; no gathers
over the batch dim, no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_shift(imgs: jax.Array, key: jax.Array, pad: int) -> jax.Array:
    """Random-shift a batch of frames by up to ±`pad` pixels per axis.

    `imgs`: (B, H, W) or (B, C, H, W) — frame stacks shift as one unit per
    sample (every channel sees the same offset, like a camera jitter).
    Replicate-pads H/W by `pad`, then crops H×W back at a per-sample
    uniform integer offset in [0, 2·pad]. `pad=0` returns the input.
    """
    if pad == 0:
        return imgs
    assert pad > 0 and imgs.ndim in (3, 4), (pad, imgs.shape)
    squeeze = imgs.ndim == 3
    x = imgs[:, None] if squeeze else imgs
    b, _, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    off = jax.random.randint(key, (b, 2), 0, 2 * pad + 1)

    def crop(img, o):
        return jax.lax.dynamic_slice(
            img, (jnp.int32(0), o[0], o[1]), (img.shape[0], h, w))

    out = jax.vmap(crop)(xp, off)
    return out[:, 0] if squeeze else out
