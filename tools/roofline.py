#!/usr/bin/env python
"""Speed-of-light / roofline analysis for the Pallas intersector
(VERDICT r3 item 5: "is 85.8M segments/s fast?" needs an answer in
hardware terms, not a CPU ratio).

Method
------
The traversal kernel is VPU-compute-bound: its only HBM traffic is the
slab-streamed tri table (block_t·64 B per tile, amortized over block_r
rays → arithmetic intensity ≈ TILE_FLOPS·block_r/64 ≈ 2000+ flop/B, far
right of the 819 GB/s HBM ridge). So the roofline bound is the VPU peak,
and the interesting numbers are:

  achieved  = executed tile-test flops / kernel wall
  vpu_pct   = achieved / VPU_PEAK
  useful    = fraction of entered tiles that improved some ray's best t
              (the culling-quality metric — entered-but-useless tiles are
              the cost of block-lockstep traversal vs the reference's
              per-ray BVH)

Executed-tile counts come from the kernel's own stats outputs (closest-hit
kernel with stats=True). The bounce workload reproduces the renderer's:
real camera rays for one chunk, then cosine-sampled continuations from the
real hit normals (a documented stand-in for the BSDF mix), with dead-lane
t_max masking like the integrators.

VPU peak estimate for v5e: 8×128 lanes × 4 ALUs × 1.5 GHz (clock derived
from the published 197 bf16 MXU TFLOP/s: 197e12/(4 MXUs·128²·2·…)) ≈
6.1 Tf32op/s. The derivation is printed so the number can be re-scaled.

Writes roofline.json (consumed by bench.py for the sol_pct fields) when
run with --write.
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

# flop count per (tri, ray) pair in _tile_test, hand-counted from
# ops/pallas/intersect_kernel.py: translate+permute 3 verts (3 sub +
# 6 mul/add each → 27), shear to 2-D (12), edge functions (9), same-side
# (7), det/t_scaled (8), in-range (10), div+t (4), fp-error bounds (27),
# ok/select/min/argmin amortized (~16) ≈ 120; plus the per-cluster box
# test ~30 flops/ray amortized over block_t tris (≲1) — call it 120.
TILE_FLOPS_PER_PAIR = 120.0
VPU_PEAK = 8 * 128 * 4 * 1.5e9  # ≈ 6.1e12 f32 op/s (see module docstring)


def _timed_call(fn, reps_lo=2, reps_hi=10):
    """Median-of-3 Δreps cost of fn() (axon tunnel: fetch-synced)."""

    def run(reps):
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        np.asarray(out[0] if isinstance(out, tuple) else out)[:1]
        return time.time() - t0

    run(1)  # warm
    lo = min(run(reps_lo) for _ in range(3))
    hi = min(run(reps_hi) for _ in range(3))
    return max((hi - lo) / (reps_hi - reps_lo), 1e-9)


def analyze(scene_name, depth, chunk_rays, seed=0):
    from curry_pbrt_tpu.ops import intersect as isect
    from curry_pbrt_tpu.ops.pallas.aggregate import plan_tri_kernel
    from curry_pbrt_tpu.ops.pallas.intersect_kernel import (
        tri_closest_hit_tables,
    )
    from curry_pbrt_tpu.models.camera import generate_rays
    from curry_pbrt_tpu.ops import math as m
    from curry_pbrt_tpu.render import plan_render
    from curry_pbrt_tpu.sceneio.compiler import compile_scene_file

    scene = compile_scene_file(REPO / "scenes" / scene_name)
    tables, block_t, block_r, small = plan_tri_kernel(
        scene.tris, np.asarray(scene.camera.camera_to_world)[:3, 3]
    )
    ktris = isect.TriangleArrays(
        jnp.asarray(tables.p0), jnp.asarray(tables.p1),
        jnp.asarray(tables.p2), jnp.asarray(tables.prim),
    )
    subgroups = 1 if small else max(block_r // 256, 1)  # production default
    kern = partial(
        tri_closest_hit_tables,
        tris16=jnp.asarray(tables.tris16),
        caabb=jnp.asarray(tables.cluster_aabbs),
        saabb=jnp.asarray(tables.super_aabbs),
        slab_aabb=jnp.asarray(tables.slab_aabbs),
        block_t=block_t, clusters_per_slab=tables.clusters_per_slab,
        use_supers=tables.use_supers, subgroups=subgroups,
        interpret=jax.default_backend() != "tpu", block_r=block_r,
    )

    # one real chunk of camera rays
    plan = plan_render(scene)
    xres, yres = scene.settings.resolution
    n_pix = min(chunk_rays, xres * yres)
    ys, xs = np.mgrid[0:yres, 0:xres]
    px_all = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    # strided sample across the WHOLE image (the first chunk_rays pixels
    # would all be top-of-frame background in the mesh scenes)
    px = px_all[:: max(len(px_all) // n_pix, 1)][:n_pix]
    rng = np.random.default_rng(seed)
    jitter = rng.random((n_pix, 2), np.float32) - 0.5
    o, d = generate_rays(scene.camera, jnp.asarray(px + jitter), None)

    total_flops, total_wall = 0.0, 0.0
    n_clusters_real = int((~np.isnan(tables.cluster_aabbs[:, 0])).sum())
    rows = []
    active = jnp.ones((n_pix,), bool)
    key = jax.random.PRNGKey(seed)
    for bounce in range(depth):
        t_max = jnp.where(active, 1e30, 0.0)
        t, idx, entered, improved = kern(o, d, t_max, stats=True)
        # per-lane tile-test counts: sum(entered)·block_t = exact pair tests
        entered_t = int(np.sum(entered))  # lane-tests
        improved_t = int(np.sum(improved))
        possible = n_pix * n_clusters_real

        wall = _timed_call(lambda o=o, d=d, t_max=t_max: kern(o, d, t_max))
        flops = entered_t * block_t * TILE_FLOPS_PER_PAIR
        resolvable = wall >= 50e-6  # Δreps resolution under tunnel noise
        if resolvable:
            total_flops += flops
            total_wall += wall
        rows.append(
            dict(
                bounce=bounce,
                active=int(np.sum(np.asarray(active))),
                entered_tiles=entered_t,
                skip_pct=round(100 * (1 - entered_t / max(possible, 1)), 1),
                useful_pct=round(100 * improved_t / max(entered_t, 1), 1),
                wall_ms=round(wall * 1e3, 3) if resolvable else None,
                tflops=round(flops / wall / 1e12, 3) if resolvable else None,
                vpu_pct=round(100 * flops / wall / VPU_PEAK, 1) if resolvable else None,
            )
        )

        # continuation: cosine hemisphere around the real hit normal
        hit = idx >= 0
        safe_idx = jnp.clip(idx, 0, ktris.count - 1)
        hp, hn, _uv, herr = isect.triangle_winner_attributes(o, d, t_max, safe_idx, ktris)
        key, sub = jax.random.split(key)
        u2 = jax.random.uniform(sub, (n_pix, 2))
        local, _pdf = m.cosine_sample_hemisphere(u2)
        fx, fy, fz = (lambda n: m.coordinate_system(n) + (n,))(hn)
        nd = m.to_world(local, fx, fy, fz)
        o = jnp.where(hit[:, None], isect.offset_point_by_error(hp, hn, herr, nd), o)
        d = jnp.where(hit[:, None], nd, d)
        active = active & hit

    summary = dict(
        scene=scene_name,
        depth=depth,
        rays=n_pix,
        block_t=block_t,
        block_r=block_r,
        clusters=n_clusters_real,
        supers=bool(tables.use_supers),
        slabs=tables.n_slabs,
        tile_flops_per_pair=TILE_FLOPS_PER_PAIR,
        vpu_peak_assumed_tflops=VPU_PEAK / 1e12,
        traversal_achieved_tflops=round(total_flops / total_wall / 1e12, 3),
        sol_pct=round(100 * total_flops / total_wall / VPU_PEAK, 1),
        bounces=rows,
    )
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="*", default=["cornell_tex.pbrt", "mesh10k.pbrt"])
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--write", action="store_true", help="write roofline.json")
    args = ap.parse_args()

    out = {"vpu_peak_derivation": "8x128 lanes x 4 ALUs x 1.5 GHz = 6.1e12 f32 op/s",
           "method": "see tools/roofline.py docstring", "scenes": {}}
    for scene in args.scenes or ["cornell_tex.pbrt", "mesh10k.pbrt"]:
        s = analyze(scene, args.depth, args.chunk)
        out["scenes"][scene] = s
        print(f"\n== {scene}: clusters={s['clusters']} supers={s['supers']} "
              f"slabs={s['slabs']} block_t={s['block_t']} block_r={s['block_r']}")
        for r in s["bounces"]:
            if r["wall_ms"] is None:
                print(f"  bounce {r['bounce']}: active={r['active']:>6} "
                      f"skip={r['skip_pct']:5.1f}% useful={r['useful_pct']:5.1f}% "
                      "wall below 50 µs timing resolution")
                continue
            print(f"  bounce {r['bounce']}: active={r['active']:>6} "
                  f"skip={r['skip_pct']:5.1f}% useful={r['useful_pct']:5.1f}% "
                  f"wall={r['wall_ms']:8.3f} ms  {r['tflops']:6.3f} Tf/s "
                  f"({r['vpu_pct']:4.1f}% VPU)")
        print(f"  overall traversal: {s['traversal_achieved_tflops']} Tf/s = "
              f"{s['sol_pct']}% of assumed VPU peak")
    if args.write:
        (REPO / "roofline.json").write_text(json.dumps(out, indent=1))
        print("\nwrote roofline.json")


if __name__ == "__main__":
    main()
