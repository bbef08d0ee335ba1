"""Fused Pallas depth-preprocessing kernel.

One kernel program per frame performs the ENTIRE ingest chain of
env_lab.py:420-434 + :295-299 — minmax normalize, Gaussian noise (in-kernel
Irwin-Hall(12) over the TPU PRNG), then the whole LINEAR tail (5x5 blur,
center-band 11x11 blur, 4x bilinear resize, /255) as two constant matmul
pairs on the MXU — with a single HBM read of the raw frame and a single
small write of the (128, 160) state. The pure-XLA pipeline
(ops/preprocess.py) materializes several (512, 640) intermediates in HBM;
here everything stays in VMEM.

Specialized to the live depth-camera geometry (512x640 -> 128x160,
robot_w.urdf:751-752, env_lab.py:295): the 4x integer scale makes each
output pixel the average of a 2x2 block at offset (4i+1, 4j+1) under cv2's
(dst+0.5)*4-0.5 sampling. Other geometries use the XLA path.

Noise parity: the kernel draws Irwin-Hall(12) normals from the TPU PRNG —
exact mean/variance, near-Gaussian shape, support +-6 sigma (the chain clips
at [0, 255] anyway); the stream differs from jax.random.normal (documented;
tested distributionally + exactly at sigma=0).
"""

from __future__ import annotations

import functools

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
    a = np.zeros((H_OUT, H_IN), np.float64)
    a[np.arange(H_OUT), 4 * np.arange(H_OUT) + 1] = 0.5
    a[np.arange(H_OUT), 4 * np.arange(H_OUT) + 2] = 0.5
    b = np.zeros((W_IN, W_OUT), np.float64)
    b[4 * np.arange(W_OUT) + 1, np.arange(W_OUT)] = 0.5
    b[4 * np.arange(W_OUT) + 2, np.arange(W_OUT)] = 0.5
    return a, b


def _blur_mat(n: int, k: np.ndarray) -> np.ndarray:
    """(n, n) REFLECT_101 Gaussian-blur operator acting on the leading axis
    (dst row i = sum_t k[t] * src[reflect(i + t - r)])."""
    m = np.zeros((n, n), np.float64)
    r = len(k) // 2
    for i in range(n):
        for t, kv in enumerate(k):
            j = i + t - r
            j = -j if j < 0 else (2 * (n - 1) - j if j >= n else j)
            m[i, j] += float(kv)
    return m


def _fold_matrices():
    """The ENTIRE linear tail of the chain — 5x5 blur, center-band 11x11
    blur, 4x bilinear downscale — folded into two constant matmul pairs:

        y = A1 @ x @ B1 + A2 @ x @ B2

    (the band blur applies only to rows [Y1, Y2), which makes the operator
    non-separable as a single A @ x @ B; splitting by out-of-band/band rows
    restores separability). This moves ~32 VPU passes per frame onto the
    otherwise-idle MXU. All operators carry cv2's REFLECT_101 borders."""
    r5 = _blur_mat(H_IN, _K5)
    c5r = _blur_mat(W_IN, _K5).T
    r11b = _blur_mat(BAND, _K11)
    c11r = _blur_mat(W_IN, _K11).T
    d_r, d_c = _down_matrices()
    p = np.zeros((BAND, H_IN), np.float64)
    p[np.arange(BAND), Y1 + np.arange(BAND)] = 1.0
    a1 = d_r @ (np.eye(H_IN) - p.T @ p) @ r5
    a2 = d_r @ p.T @ r11b @ p @ r5
    b1 = c5r @ d_c
    b2 = c5r @ c11r @ d_c
    f32 = lambda m: np.ascontiguousarray(m, np.float32)
    return f32(a1), f32(b1), f32(a2), f32(b2)


_A1, _B1, _A2_FULL, _B2 = _fold_matrices()


# The band-blur correction A2 only has nonzero rows where the 4x downscale
# samples (4i+1, 4i+2) land inside [Y1, Y2): output rows 51..76. Restrict the
# second matmul pair to an 8-aligned 32-row band (48..80) — 4x fewer flops on
# that pair, identical result.
_BAND_ROW0 = 48
_BAND_ROWS = 32
assert np.abs(_A2_FULL[:_BAND_ROW0]).max() == 0.0
assert np.abs(_A2_FULL[_BAND_ROW0 + _BAND_ROWS:]).max() == 0.0
_A2 = np.ascontiguousarray(_A2_FULL[_BAND_ROW0:_BAND_ROW0 + _BAND_ROWS])


def _add_noise(x, noise_level: float):
    """Gaussian noise: Irwin-Hall(12) over the per-core PRNG — sum of 12
    uniforms minus mean is N(0,1) to high accuracy (exact mean/variance,
    support +-6 sigma) with ZERO transcendentals. The 12 uniforms are 4
    independent BYTES from each of THREE 32-bit draws (sum of 12 discrete
    U{0..255}: mean 1530, std 255.998) — 3 PRNG passes instead of 12; the
    1/256-sigma granularity disappears under the 5x5/11x11 blur taps
    downstream. Measured NEGATIVE results (tools/ablate_noise.py, do not
    repeat): Irwin-Hall(3) from three full int32 draws fma'd into x in
    place — fewer VPU passes on paper — is SLOWER (60.1k frames/s full-res
    which also OOMs scoped VMEM past fb=2; 66.3k with (H/2, W) halved
    draws) than this byte scheme's 67.7k at fb=4; the int32 mask/shift/add
    unpack is cheaper on the VPU than f32 fma passes, and the live int32
    accumulator is not what binds VMEM at fb=4."""
    acc = jnp.zeros(x.shape, jnp.int32)
    for _ in range(3):
        bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.int32)
        # arithmetic shift on negatives fills ones; & 255 strips them
        acc = acc + jnp.bitwise_and(bits, 255) \
            + jnp.bitwise_and(jax.lax.shift_right_arithmetic(bits, 8), 255) \
            + jnp.bitwise_and(jax.lax.shift_right_arithmetic(bits, 16), 255) \
            + jnp.bitwise_and(jax.lax.shift_right_arithmetic(bits, 24), 255)
    z = (acc.astype(jnp.float32) - 1530.0) * (1.0 / 255.9980469)
    return jnp.clip(x + noise_level * z, 0.0, 255.0)


def _kernel(seed_ref, raw_ref, a1_ref, b1_ref, a2_ref, b2_ref, out_ref, *,
            noise_level: float, fb: int):
    for f in range(fb):
        x = raw_ref[f].astype(jnp.float32)                  # (512, 640)

        # 1. minmax normalize + the reference's u8-cast truncation
        lo = jnp.min(x)
        hi = jnp.max(x)
        x = jnp.clip(jnp.floor((x - lo) * (255.0 / jnp.maximum(hi - lo, 1e-20))),
                     0.0, 255.0)

        # 2. Gaussian noise (see _add_noise); seeded per frame
        if noise_level > 0.0:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * fb + f)
            x = _add_noise(x, noise_level)

        # 3.-5. blur5 -> band blur11 -> 4x downscale: the whole linear tail
        #    as two constant matmul pairs on the MXU (see _fold_matrices),
        #    fused with /255 (env_lab.py:295-299). Pair 2 covers only the 32
        #    band rows. Measured NEGATIVE result (do not repeat): splitting
        #    the fp32 matmuls into compensated bf16 triples (xh@wh + xl@wh +
        #    xh@wl) is ~10% SLOWER end-to-end on v5e — the extra elementwise
        #    split passes cost more than the fp32-emulation passes they save
        #    (59.3k -> 53.0k frames/s under the seed-serialized harness).
        y = jnp.dot(jnp.dot(a1_ref[:], x, preferred_element_type=jnp.float32),
                    b1_ref[:], preferred_element_type=jnp.float32)
        y2 = jnp.dot(jnp.dot(a2_ref[:], x, preferred_element_type=jnp.float32),
                     b2_ref[:], preferred_element_type=jnp.float32)
        y = jnp.concatenate([
            jax.lax.slice(y, (0, 0), (_BAND_ROW0, W_OUT)),
            jax.lax.slice(y, (_BAND_ROW0, 0),
                          (_BAND_ROW0 + _BAND_ROWS, W_OUT)) + y2,
            jax.lax.slice(y, (_BAND_ROW0 + _BAND_ROWS, 0), (H_OUT, W_OUT)),
        ], axis=0)
        out_ref[f] = (y * (1.0 / 255.0)).astype(out_ref.dtype)


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


def _frame_tile(b: int) -> int:
    """Frames per kernel program. Larger tiles amortize per-program overhead
    (PRNG seeds, grid bookkeeping); override with DGVIT_PP_FB for
    experiments. Measured on v5e (seed-serialized harness, batch 256,
    session 6 re-run on a quiet chip): fb=1 62.9k, fb=2 64.3k, fb=4 67.7k
    frames/s, fb=8 fails to compile (remote Mosaic compiler dies on the
    8x-unrolled body; the double-buffered 8-frame input block would also
    exceed scoped VMEM)."""
    import os

    fb = int(os.environ.get("DGVIT_PP_FB", "4"))
    while b % fb != 0:
        fb //= 2
    return max(fb, 1)


@functools.partial(jax.jit, static_argnames=("noise_level", "interpret"))
def preprocess_depth_pallas(raw: jnp.ndarray, seed: jnp.ndarray,
                            noise_level: float = 50.0,
                            interpret: bool = False) -> jnp.ndarray:
    """(B, 512, 640) raw float depth -> (B, 128, 160) state in [0, 1].
    `seed` is an int32 scalar; frame i uses seed + i."""
    b = raw.shape[0]
    assert supported_shape(raw.shape), "pallas path is specialized to 512x640"
    fb = _frame_tile(b)
    kern = functools.partial(_kernel, noise_level=noise_level, fb=fb)
    const = lambda shape: pl.BlockSpec(shape, lambda i, s: (0, 0),
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // fb,),
        in_specs=[
            pl.BlockSpec((fb, H_IN, W_IN), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((H_OUT, H_IN)),
            const((W_IN, W_OUT)),
            const((_BAND_ROWS, H_IN)),
            const((W_IN, W_OUT)),
        ],
        out_specs=pl.BlockSpec((fb, H_OUT, W_OUT), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, H_OUT, W_OUT), jnp.float32),
        cost_estimate=pl.CostEstimate(
            # two A@x@B matmul pairs dominate (pair 2 band-restricted);
            # Irwin-Hall noise has NO transcendentals (3 PRNG draws + byte
            # unpack ride bytes/flops noise)
            flops=b * 2 * ((H_OUT + _BAND_ROWS) * H_IN * W_IN
                           + (H_OUT + _BAND_ROWS) * W_IN * W_OUT),
            bytes_accessed=b * (H_IN * W_IN + H_OUT * W_OUT) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32).reshape(1), raw.astype(jnp.float32),
      jnp.asarray(_A1), jnp.asarray(_B1), jnp.asarray(_A2), jnp.asarray(_B2))
