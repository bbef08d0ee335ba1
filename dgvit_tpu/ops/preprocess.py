"""Depth/fisheye preprocessing chain with cv2-exact numerics.

Replaces the reference's per-frame OpenCV pipeline (SURVEY.md §3.5):

  DepthImage_subscriber (env_lab.py:420-434):
    float depth -> cv2.normalize(MINMAX 0..255) -> uint8     (:423-425)
    uint16      -> /max*255 -> uint8                         (:426-427)
    add_nose(sigma=50): +N(0,sigma), clip[0,255], GaussianBlur 5x5 (:78-90)
    blurring(): center h/5 band GaussianBlur 11x11           (:69-76)
  env.step (env_lab.py:295-299):
    cv2.resize(obs, (160,128)) bilinear -> /255

  Image_fish_subscriber (env_lab.py:450-458):
    mono8 crop [80:400, 118:523] -> band blur

cv2 semantics replicated exactly (verified against the installed OpenCV in
tests/test_preprocess.py):
  * GaussianBlur(k, sigma=0): k<=7 uses cv2's fixed binomial tables
    (k=5 -> [1,4,6,4,1]/16); k>7 uses sigma = 0.3*((k-1)*0.5 - 1) + 0.8
  * border BORDER_REFLECT_101 (numpy/jnp pad mode 'reflect')
  * band blur extracts the band FIRST, so reflection happens at band edges
  * resize: fp32 bilinear with src = (dst+0.5)*scale - 0.5 sampling and edge
    clamping (cv2 float path)

Everything is jittable and batched; the fused single-dispatch TPU pipeline is
`preprocess_depth` / `preprocess_fisheye` over (B, H, W) stacks.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Gaussian kernels (cv2.getGaussianKernel semantics)
# ---------------------------------------------------------------------------

_SMALL_GAUSSIAN_TAB = {
    1: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


def gaussian_kernel_1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel: fixed binomial tables for ksize<=7 with
    sigma<=0, else exp(-x^2/(2 sigma^2)) normalized, with the sigma<=0
    default sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    if sigma <= 0 and ksize <= 7 and ksize % 2 == 1:
        return np.asarray(_SMALL_GAUSSIAN_TAB[ksize], np.float64)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    center = (ksize - 1) * 0.5
    x = np.arange(ksize, dtype=np.float64) - center
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _sep_blur(img: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """Separable blur with BORDER_REFLECT_101 on the last two dims of a
    (..., H, W) array. Written as shifted adds so XLA fuses it into one
    elementwise program (no conv dispatch for these tiny kernels)."""
    r = len(k) // 2
    kf = jnp.asarray(k, img.dtype)
    pad = [(0, 0)] * (img.ndim - 2) + [(r, r), (r, r)]
    x = jnp.pad(img, pad, mode="reflect")
    h, w = img.shape[-2], img.shape[-1]
    # rows
    acc = jnp.zeros_like(img)
    for i in range(len(k)):
        acc = acc + kf[i] * jax.lax.slice_in_dim(x, i, i + h, axis=img.ndim - 2)[
            ..., r:r + w]
    # cols
    x2 = jnp.pad(acc, pad, mode="reflect")[..., r:r + h, :]
    out = jnp.zeros_like(img)
    for i in range(len(k)):
        out = out + kf[i] * jax.lax.slice_in_dim(x2, i, i + w, axis=img.ndim - 1)
    return out


def gaussian_blur(img: jnp.ndarray, ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    """cv2.GaussianBlur(img, (k, k), sigma) on (..., H, W)."""
    return _sep_blur(img, gaussian_kernel_1d(ksize, sigma))


# ---------------------------------------------------------------------------
# Reference perturbation library (env_lab.py:33-90) — jittable fault injection
# ---------------------------------------------------------------------------

def center_band(h: int) -> Tuple[int, int]:
    """Horizontal center band of height h//5 (env_lab.py:33-39)."""
    band = h // 5
    y1 = h // 2 - band // 2
    return y1, y1 + band


def band_blur(img: jnp.ndarray, ksize: int = 11) -> jnp.ndarray:
    """blurring() (env_lab.py:69-76): the band is EXTRACTED then blurred, so
    REFLECT_101 happens at the band's own edges, then pasted back."""
    h = img.shape[-2]
    y1, y2 = center_band(h)
    region = img[..., y1:y2, :]
    blurred = gaussian_blur(region, ksize)
    return img.at[..., y1:y2, :].set(blurred)


def pixel_occlusion(img: jnp.ndarray) -> jnp.ndarray:
    """env_lab.py:41-47 — zero out the center band (f32 like the reference)."""
    img = img.astype(jnp.float32)
    y1, y2 = center_band(img.shape[-2])
    return img.at[..., y1:y2, :].set(0.0)


def greying_out(img: jnp.ndarray) -> jnp.ndarray:
    """env_lab.py:61-67 — paint the center band grey (128)."""
    y1, y2 = center_band(img.shape[-2])
    return img.at[..., y1:y2, :].set(jnp.asarray(128, img.dtype))


def add_noise(img: jnp.ndarray, key: jax.Array, noise_level: float = 50.0
              ) -> jnp.ndarray:
    """add_nose() (env_lab.py:78-90): f32 + N(0, sigma), clip [0,255],
    GaussianBlur 5x5."""
    img = img.astype(jnp.float32)
    noisy = img + noise_level * jax.random.normal(key, img.shape, jnp.float32)
    noisy = jnp.clip(noisy, 0.0, 255.0)
    return gaussian_blur(noisy, 5)


# ---------------------------------------------------------------------------
# Depth normalization (env_lab.py:423-429)
# ---------------------------------------------------------------------------

def normalize_depth_f32(img: jnp.ndarray) -> jnp.ndarray:
    """cv2.normalize(img, None, 0, 255, NORM_MINMAX) per image (float->float,
    no rounding), then the reference's .astype(np.uint8) — a C cast that
    TRUNCATES toward zero (env_lab.py:424-425) — kept in f32 with floor()
    so the whole pipeline stays on-device."""
    lo = jnp.min(img, axis=(-2, -1), keepdims=True)
    hi = jnp.max(img, axis=(-2, -1), keepdims=True)
    scaled = (img - lo) * (255.0 / jnp.maximum(hi - lo, 1e-20))
    return jnp.clip(jnp.floor(scaled), 0.0, 255.0)


def normalize_depth_u16_f32(img: jnp.ndarray) -> jnp.ndarray:
    """(img / img.max() * 255).astype(np.uint8) (env_lab.py:426-427):
    numpy float->u8 cast truncates toward zero."""
    hi = jnp.max(img, axis=(-2, -1), keepdims=True).astype(jnp.float32)
    return jnp.floor(img.astype(jnp.float32) / jnp.maximum(hi, 1e-20) * 255.0)


# ---------------------------------------------------------------------------
# cv2-exact bilinear resize (fp32 path)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2.resize(img, (w_out, h_out), INTER_LINEAR) on fp32 (..., H, W).
    Sampling: src = (dst + 0.5) * (in/out) - 0.5, clamped to the edge."""
    oh, ow = out_hw
    ih, iw = img.shape[-2], img.shape[-1]

    def axis_weights(n_in, n_out):
        scale = n_in / n_out
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        # cv2 clamps the sample window to the image
        i0c = np.clip(i0, 0, n_in - 1)
        i1c = np.clip(i0 + 1, 0, n_in - 1)
        return (jnp.asarray(i0c), jnp.asarray(i1c),
                jnp.asarray(frac.astype(np.float32)))

    y0, y1, fy = axis_weights(ih, oh)
    x0, x1, fx = axis_weights(iw, ow)

    top = jnp.take(img, y0, axis=-2)
    bot = jnp.take(img, y1, axis=-2)
    rows = top + (bot - top) * fy[:, None]
    left = jnp.take(rows, x0, axis=-1)
    right = jnp.take(rows, x1, axis=-1)
    return left + (right - left) * fx


# ---------------------------------------------------------------------------
# Fused pipelines (single jitted dispatch per batch)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_hw", "noise_level", "dtype_in"))
def preprocess_depth(raw: jnp.ndarray, key: jax.Array,
                     out_hw: Tuple[int, int] = (128, 160),
                     noise_level: float = 50.0,
                     dtype_in: str = "float") -> jnp.ndarray:
    """Full depth ingest chain for a (B, H, W) stack of raw camera frames:
    normalize -> noise -> blur5 -> band blur11 -> resize -> /255.
    Returns (B, out_h, out_w) in [0, 1] — the `state` fed to the policy
    (env_lab.py:295-299)."""
    if dtype_in == "float":
        x = normalize_depth_f32(raw.astype(jnp.float32))
    elif dtype_in == "uint16":
        x = normalize_depth_u16_f32(raw)
    else:  # already uint8-scale
        x = raw.astype(jnp.float32)
    x = add_noise(x, key, noise_level)
    x = band_blur(x, 11)
    x = resize_bilinear(x, out_hw)
    return x / 255.0


@functools.partial(jax.jit, static_argnames=("out_hw",))
def preprocess_fisheye(raw: jnp.ndarray,
                       out_hw: Tuple[int, int] = (128, 160)) -> jnp.ndarray:
    """Fisheye ingest (env_lab.py:450-458 + step resize): mono8 (B, H, W)
    -> crop [80:400, 118:523] -> band blur -> resize -> /255."""
    x = raw.astype(jnp.float32)[..., 80:400, 118:523]
    x = band_blur(x, 11)
    x = resize_bilinear(x, out_hw)
    return x / 255.0
