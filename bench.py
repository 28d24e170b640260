#!/usr/bin/env python
"""Headline benchmark: rays/sec/chip, depth-5 path trace, Cornell box 512².

Prints ONE JSON line:
  {"metric": "rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": R}

Protocol (BASELINE.md): rays/sec/chip = total traced path segments (camera +
bounce closest-hits + NEE shadow + NEE MIS rays over active lanes) ÷ wall
time ÷ chips, fixed seeds, cornel box at 512×512, 64 spp, max depth 5.

vs_baseline compares against the same workload run on this host's CPU
backend (the reference is a CPU renderer with no published numbers —
/root/reference/readme.md — so the CPU timing of the same renderer stands in
for it; cached in baseline_cpu.json with its provenance).
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
SCENE = REPO / "scenes" / "cornell.pbrt"
BASELINE_CACHE = REPO / "baseline_cpu.json"

RES = 512
SPP = 64
DEPTH = 5


def run_once(quiet=True):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial
    from curry_pbrt_tpu.sceneio.compiler import compile_scene_file
    from curry_pbrt_tpu.render import plan_render, _render_chunk_stats

    scene = compile_scene_file(
        SCENE, overrides={"resolution": (RES, RES), "spp": SPP, "max_depth": DEPTH}
    )
    plan = plan_render(scene)
    params = scene.init_params
    xres, yres = scene.settings.resolution
    n_pixels = xres * yres
    C = plan.chunk_pixels

    ys, xs = np.mgrid[0:yres, 0:xres]
    pix_xy_all = np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float32)
    offs_all = plan.pixel_offsets.reshape(-1)

    chunk_fn = jax.jit(partial(_render_chunk_stats, plan))

    def make_chunk(ci):
        lo = ci * C
        hi = min(lo + C, n_pixels)
        pad = C - (hi - lo)
        po = np.pad(offs_all[lo:hi], (0, pad))
        px = np.pad(pix_xy_all[lo:hi], ((0, pad), (0, 0)))
        return jnp.asarray(po), jnp.asarray(px)

    # warmup/compile on chunk 0
    po, px = make_chunk(0)
    img, seg = chunk_fn(params, po, px)
    img.block_until_ready()

    n_chunks = (n_pixels + C - 1) // C
    total_segments = 0.0
    t0 = time.time()
    out = None
    for ci in range(n_chunks):
        po, px = make_chunk(ci)
        img, seg = chunk_fn(params, po, px)
        total_segments += float(seg)
        out = img
    out.block_until_ready()
    wall = time.time() - t0
    # camera rays are counted inside path_trace's bounce-0 closest-hit
    return total_segments, wall, scene


def measure_rays_per_sec():
    segments, wall, _ = run_once()
    return segments / wall


def cpu_baseline():
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())["rays_per_sec"]
    return None


def main():
    rps = measure_rays_per_sec()
    base = cpu_baseline()
    result = {
        "metric": "rays_per_sec_per_chip",
        "value": round(rps, 1),
        "unit": "rays/s",
        "vs_baseline": round(rps / base, 3) if base else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
