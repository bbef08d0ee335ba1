"""Fused Pallas depth-preprocessing kernel.

One kernel program per frame performs the ENTIRE ingest chain of
env_lab.py:420-434 + :295-299 — minmax normalize, Gaussian noise (in-kernel
Box-Muller over the TPU PRNG), 5x5 blur, center-band 11x11 blur, 4x bilinear
resize, /255 — with a single HBM read of the raw frame and a single small
write of the (128, 160) state. The pure-XLA pipeline (ops/preprocess.py)
materializes several (512, 640) intermediates in HBM; here everything stays
in VMEM (~4 MB working set per frame).

Specialized to the live depth-camera geometry (512x640 -> 128x160,
robot_w.urdf:751-752, env_lab.py:295): the 4x integer scale makes each
output pixel the average of a 2x2 block at offset (4i+1, 4j+1) under cv2's
(dst+0.5)*4-0.5 sampling. Other geometries use the XLA path.

Noise parity: the kernel draws its own Box-Muller normals from the TPU PRNG;
the distribution matches N(0, sigma) but the stream differs from
jax.random.normal (documented; tested distributionally + exactly at sigma=0).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgvit_tpu.ops.preprocess import gaussian_kernel_1d

H_IN, W_IN = 512, 640
H_OUT, W_OUT = 128, 160
BAND = H_IN // 5                      # 102 (env_lab.py:33-39)
Y1 = H_IN // 2 - BAND // 2            # 205
Y2 = Y1 + BAND                        # 307

_K5 = gaussian_kernel_1d(5).astype(np.float32)
_K11 = gaussian_kernel_1d(11).astype(np.float32)


def _down_matrices():
    """cv2 4x-downscale sampling = 0.5/0.5 average of src rows 4i+1, 4i+2."""
    a = np.zeros((H_OUT, H_IN), np.float32)
    a[np.arange(H_OUT), 4 * np.arange(H_OUT) + 1] = 0.5
    a[np.arange(H_OUT), 4 * np.arange(H_OUT) + 2] = 0.5
    b = np.zeros((W_IN, W_OUT), np.float32)
    b[4 * np.arange(W_OUT) + 1, np.arange(W_OUT)] = 0.5
    b[4 * np.arange(W_OUT) + 2, np.arange(W_OUT)] = 0.5
    return a, b


_DOWN_ROWS, _DOWN_COLS = _down_matrices()


def _row(x, i):
    return jax.lax.slice_in_dim(x, i, i + 1, axis=0)


def _col(x, i):
    return jax.lax.slice_in_dim(x, i, i + 1, axis=1)


def _reflect_rows(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """REFLECT_101 pad along rows by r — static slices only (Mosaic has no
    dynamic_slice/gather on the TC path)."""
    h = x.shape[0]
    top = [_row(x, r - i) for i in range(r)]            # rows r, r-1, ..., 1
    bot = [_row(x, h - 2 - i) for i in range(r)]        # rows h-2, h-3, ...
    return jnp.concatenate(top + [x] + bot, axis=0)


def _reflect_cols(x: jnp.ndarray, r: int) -> jnp.ndarray:
    w = x.shape[1]
    left = [_col(x, r - i) for i in range(r)]
    right = [_col(x, w - 2 - i) for i in range(r)]
    return jnp.concatenate(left + [x] + right, axis=1)


def _sep_blur_inkernel(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    r = len(k) // 2
    h, w = x.shape
    xp = _reflect_rows(x, r)
    acc = jnp.zeros_like(x)
    for i in range(len(k)):
        acc = acc + float(k[i]) * jax.lax.slice_in_dim(xp, i, i + h, axis=0)
    xp = _reflect_cols(acc, r)
    out = jnp.zeros_like(x)
    for i in range(len(k)):
        out = out + float(k[i]) * jax.lax.slice_in_dim(xp, i, i + w, axis=1)
    return out


def _kernel(seed_ref, raw_ref, down_r_ref, down_c_ref, out_ref, *,
            noise_level: float):
    x = raw_ref[0].astype(jnp.float32)                      # (512, 640)

    # 1. minmax normalize + the reference's u8-cast truncation
    lo = jnp.min(x)
    hi = jnp.max(x)
    x = jnp.clip(jnp.floor((x - lo) * (255.0 / jnp.maximum(hi - lo, 1e-20))),
                 0.0, 255.0)

    # 2. Gaussian noise via Box-Muller over the per-core PRNG
    if noise_level > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        # Mosaic can't cast uint32->f32; mask to 31 bits and go via int32
        b1 = pltpu.bitcast(pltpu.prng_random_bits((H_IN, W_IN)), jnp.int32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits((H_IN, W_IN)), jnp.int32)
        b1 = jnp.bitwise_and(b1, jnp.int32(0x7FFFFFFF))
        b2 = jnp.bitwise_and(b2, jnp.int32(0x7FFFFFFF))
        # uniforms: u1 in (0, 1] (avoids log(0)), u2 in [0, 1)
        u1 = (b1.astype(jnp.float32) + 1.0) * (1.0 / 2147483648.0)
        u2 = b2.astype(jnp.float32) * (1.0 / 2147483648.0)
        z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * math.pi * u2)
        x = jnp.clip(x + noise_level * z, 0.0, 255.0)

    # 3. 5x5 blur (add_nose tail, env_lab.py:89)
    x = _sep_blur_inkernel(x, _K5)

    # 4. center-band 11x11 blur on the EXTRACTED band (env_lab.py:69-76)
    band = jax.lax.slice_in_dim(x, Y1, Y2, axis=0)
    band = _sep_blur_inkernel(band, _K11)
    x = jax.lax.concatenate(
        [jax.lax.slice_in_dim(x, 0, Y1, axis=0), band,
         jax.lax.slice_in_dim(x, Y2, H_IN, axis=0)], dimension=0)

    # 5. 4x bilinear resize == mean of the 2x2 block at (4i+1, 4j+1), fused
    #    with /255 (env_lab.py:295-299). Expressed as two constant matmuls
    #    (A @ x @ B) so it rides the MXU — Mosaic has no strided reshape.
    a = down_r_ref[:]                      # (128, 512), rows sum to 1
    bm = down_c_ref[:]                     # (640, 160)
    s = jnp.dot(jnp.dot(a, x, preferred_element_type=jnp.float32), bm,
                preferred_element_type=jnp.float32)
    out_ref[0] = (s * (1.0 / 255.0)).astype(out_ref.dtype)


def supported_shape(shape) -> bool:
    return tuple(shape[-2:]) == (H_IN, W_IN)


def preprocess_depth_auto(raw, seed: int, noise_level: float = 50.0):
    """Dispatch: fused Pallas kernel on TPU for the live 512x640 geometry
    (2.5x the XLA pipeline on v5e), XLA pipeline elsewhere. `seed` is an int;
    the XLA path folds it into a PRNGKey."""
    if jax.default_backend() == "tpu" and supported_shape(raw.shape):
        return preprocess_depth_pallas(raw, jnp.int32(seed),
                                       noise_level=noise_level)
    from dgvit_tpu.ops.preprocess import preprocess_depth

    return preprocess_depth(raw, jax.random.PRNGKey(seed),
                            noise_level=noise_level)


@functools.partial(jax.jit, static_argnames=("noise_level", "interpret"))
def preprocess_depth_pallas(raw: jnp.ndarray, seed: jnp.ndarray,
                            noise_level: float = 50.0,
                            interpret: bool = False) -> jnp.ndarray:
    """(B, 512, 640) raw float depth -> (B, 128, 160) state in [0, 1].
    `seed` is an int32 scalar; frame i uses seed + i."""
    b = raw.shape[0]
    assert supported_shape(raw.shape), "pallas path is specialized to 512x640"
    kern = functools.partial(_kernel, noise_level=noise_level)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, H_IN, W_IN), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H_OUT, H_IN), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W_IN, W_OUT), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H_OUT, W_OUT), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, H_OUT, W_OUT), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * H_IN * W_IN * 40,
            bytes_accessed=b * (H_IN * W_IN + H_OUT * W_OUT) * 4,
            transcendentals=b * H_IN * W_IN * 3,
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32).reshape(1), raw.astype(jnp.float32),
      jnp.asarray(_DOWN_ROWS), jnp.asarray(_DOWN_COLS))
