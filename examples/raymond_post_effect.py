#!/usr/bin/env python
"""Swirl post-effect over an image — vectorized equivalent of the
reference's per-pixel example (examples/raymond_post_effect.rs): pixels
within `radius` of the center sample from a rotated source position, with
rotation angle falling off with distance.

Usage: raymond_post_effect.py in.png out.png
"""
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax.numpy as jnp


def post_effect(img: np.ndarray, radius=200.0, c=300.0) -> np.ndarray:
    h, w = img.shape[:2]
    cy, cx = h / 2.0, w / 2.0
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    dx, dy = xs - cx, ys - cy
    dist = np.sqrt(dx * dx + dy * dy)
    angle = np.arctan2(dy, dx)
    off = np.deg2rad(c * (1.0 - dist / radius))
    na = angle + off
    sx = np.clip((cx + np.cos(na) * dist).astype(np.int32), 0, w - 1)
    sy = np.clip((cy + np.sin(na) * dist).astype(np.int32), 0, h - 1)
    out = img.copy()
    mask = dist <= radius
    out[mask] = img[sy[mask], sx[mask]]
    return out


if __name__ == "__main__":
    from curry_pbrt_tpu.utils.imageio import read_image, write_png
    from curry_pbrt_tpu.ops.film import to_srgb_u8

    img = read_image(sys.argv[1])
    out = post_effect(img)
    write_png(sys.argv[2], np.asarray(to_srgb_u8(jnp.asarray(out))))
