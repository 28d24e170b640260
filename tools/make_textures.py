#!/usr/bin/env python
"""Generate scenes/box-texture.png — the deterministic checker/gradient
texture used by the textured headline bench config (BASELINE.md config 3
names a box-texture.png textured material; we generate our own rather than
copying the reference's asset)."""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from curry_pbrt_tpu.utils.imageio import write_png  # noqa: E402


def main():
    h = w = 128
    y, x = np.mgrid[0:h, 0:w]
    checker = ((x // 16 + y // 16) % 2).astype(np.float32)
    gx = x / (w - 1.0)
    gy = y / (h - 1.0)
    r = 0.25 + 0.55 * checker + 0.15 * gx
    g = 0.30 + 0.45 * (1.0 - checker) + 0.20 * gy
    b = 0.35 + 0.30 * checker * gx
    img = np.clip(np.stack([r, g, b], axis=-1), 0.0, 1.0)
    u8 = (img * 255 + 0.5).astype(np.uint8)
    out = REPO / "scenes" / "box-texture.png"
    write_png(out, u8)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
