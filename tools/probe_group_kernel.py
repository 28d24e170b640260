#!/usr/bin/env python
"""A/B probe: lane-major production kernel vs the group-granularity kernel
(ops/pallas/intersect_group.py) on the real per-bounce workload
(tools/roofline.py's: camera rays + cosine continuations, dead-lane t_max
masking).

Correctness: per bounce asserts bitwise-equal t (the accepted-pair min is
visit-order independent — both kernels execute identical per-pair fp ops)
and compares winning prim ids (may differ only on exact-t ties across the
two tables' different row orders; counted and reported).

Timing: Δreps cost of each kernel per bounce (closest) + the any-hit twin.
"""

import argparse
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


def _timed_call(fn, reps_lo=2, reps_hi=10):
    def run(reps):
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        np.asarray(out[0] if isinstance(out, tuple) else out)[:1]
        return time.time() - t0

    run(1)
    lo = min(run(reps_lo) for _ in range(3))
    hi = min(run(reps_hi) for _ in range(3))
    return max((hi - lo) / (reps_hi - reps_lo), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="mesh10k.pbrt")
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--group-block-t", type=int, default=128)
    ap.add_argument("--group-cps", type=int, default=128)
    ap.add_argument("--group-block-r", type=int, default=1024)
    ap.add_argument("--no-time", action="store_true", help="correctness only")
    args = ap.parse_args()

    from curry_pbrt_tpu.ops import intersect as isect
    from curry_pbrt_tpu.ops.pallas.aggregate import plan_tri_kernel
    from curry_pbrt_tpu.ops.pallas.intersect_kernel import (
        build_tri_tables,
        tri_any_hit_tables,
        tri_closest_hit_tables,
    )
    from curry_pbrt_tpu.ops.pallas.intersect_group import (
        tri_any_hit_groups,
        tri_closest_hit_groups,
        tris_lane_major,
    )
    from curry_pbrt_tpu.models.camera import generate_rays
    from curry_pbrt_tpu.ops import math as m
    from curry_pbrt_tpu.sceneio.compiler import compile_scene_file

    interp = jax.default_backend() != "tpu"
    scene = compile_scene_file(REPO / "scenes" / args.scene)
    view = np.asarray(scene.camera.camera_to_world)[:3, 3]

    # production lane-major setup (the single source of truth)
    tabA, btA, brA, small = plan_tri_kernel(scene.tris, view)
    subgroups = 1 if small else max(brA // 256, 1)
    kernA = partial(
        tri_closest_hit_tables,
        tris16=jnp.asarray(tabA.tris16),
        caabb=jnp.asarray(tabA.cluster_aabbs),
        saabb=jnp.asarray(tabA.super_aabbs),
        slab_aabb=jnp.asarray(tabA.slab_aabbs),
        block_t=btA, clusters_per_slab=tabA.clusters_per_slab,
        use_supers=tabA.use_supers, subgroups=subgroups,
        interpret=interp, block_r=brA,
    )
    anyA = partial(
        tri_any_hit_tables,
        tris16=jnp.asarray(tabA.tris16),
        caabb=jnp.asarray(tabA.cluster_aabbs),
        saabb=jnp.asarray(tabA.super_aabbs),
        slab_aabb=jnp.asarray(tabA.slab_aabbs),
        block_t=btA, clusters_per_slab=tabA.clusters_per_slab,
        use_supers=tabA.use_supers, subgroups=subgroups,
        interpret=interp, block_r=brA,
    )

    # group-kernel setup
    tabB = build_tri_tables(
        scene.tris.p0, scene.tris.p1, scene.tris.p2, scene.tris.prim,
        block_t=args.group_block_t, view_origin=view,
        clusters_per_slab=args.group_cps, use_supers=True,
    )
    kernB = partial(
        tri_closest_hit_groups,
        tris_lm=jnp.asarray(tris_lane_major(tabB)),
        caabb=jnp.asarray(tabB.cluster_aabbs),
        saabb=jnp.asarray(tabB.super_aabbs),
        slab_aabb=jnp.asarray(tabB.slab_aabbs),
        block_t=args.group_block_t, clusters_per_slab=tabB.clusters_per_slab,
        interpret=interp, block_r=args.group_block_r,
    )
    anyB = partial(
        tri_any_hit_groups,
        tris_lm=jnp.asarray(tris_lane_major(tabB)),
        caabb=jnp.asarray(tabB.cluster_aabbs),
        saabb=jnp.asarray(tabB.super_aabbs),
        slab_aabb=jnp.asarray(tabB.slab_aabbs),
        block_t=args.group_block_t, clusters_per_slab=tabB.clusters_per_slab,
        interpret=interp, block_r=args.group_block_r,
    )
    primA = np.asarray(tabA.prim)
    primB = np.asarray(tabB.prim)

    ktris = isect.TriangleArrays(
        jnp.asarray(tabA.p0), jnp.asarray(tabA.p1),
        jnp.asarray(tabA.p2), jnp.asarray(tabA.prim),
    )

    xres, yres = scene.settings.resolution
    n_pix = min(args.chunk, xres * yres)
    ys, xs = np.mgrid[0:yres, 0:xres]
    px_all = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    px = px_all[:: max(len(px_all) // n_pix, 1)][:n_pix]
    rng = np.random.default_rng(0)
    o, d = generate_rays(
        scene.camera, jnp.asarray(px + rng.random((n_pix, 2), np.float32) - 0.5), None)

    print(f"== {args.scene}: A(lane-major) clusters={tabA.cluster_aabbs.shape[0]} "
          f"bt={btA} cps={tabA.clusters_per_slab} slabs={tabA.n_slabs} | "
          f"B(group) clusters={tabB.cluster_aabbs.shape[0]} "
          f"bt={args.group_block_t} cps={tabB.clusters_per_slab} "
          f"slabs={tabB.n_slabs}")

    active = jnp.ones((n_pix,), bool)
    key = jax.random.PRNGKey(0)
    totA = totB = totAa = totBa = 0.0
    for bounce in range(args.depth):
        t_max = jnp.where(active, 1e30, 0.0)
        tA, iA = kernA(o, d, t_max)
        tB, iB = kernB(o, d, t_max)
        tA_n, tB_n = np.asarray(tA), np.asarray(tB)
        bit_eq = np.array_equal(tA_n, tB_n)
        pA = np.where(np.asarray(iA) >= 0, primA[np.clip(np.asarray(iA), 0, len(primA) - 1)], -1)
        pB = np.where(np.asarray(iB) >= 0, primB[np.clip(np.asarray(iB), 0, len(primB) - 1)], -1)
        prim_mism = int((pA != pB).sum())
        # any-hit on bounced shadow-like rays: test with slightly shrunk t
        tmax_s = jnp.where(jnp.asarray(tA_n) < 1e29, jnp.asarray(tA_n) * 0.999, t_max)
        hA = np.asarray(anyA(o, d, tmax_s))
        hB = np.asarray(anyB(o, d, tmax_s))
        any_mism = int((hA != hB).sum())

        line = (f"bounce {bounce}: t bitwise_eq={bit_eq} prim_mismatch={prim_mism}"
                f" anyhit_mismatch={any_mism}")
        if not args.no_time:
            wA = _timed_call(lambda: kernA(o, d, t_max))
            wB = _timed_call(lambda: kernB(o, d, t_max))
            wAa = _timed_call(lambda: anyA(o, d, tmax_s))
            wBa = _timed_call(lambda: anyB(o, d, tmax_s))
            totA += wA; totB += wB; totAa += wAa; totBa += wBa
            line += (f"  closest A={wA * 1e3:7.3f}ms B={wB * 1e3:7.3f}ms "
                     f"({wA / wB:4.2f}x)  any A={wAa * 1e3:7.3f}ms "
                     f"B={wBa * 1e3:7.3f}ms ({wAa / wBa:4.2f}x)")
        print(line, flush=True)
        if not bit_eq:
            bad = np.nonzero(tA_n != tB_n)[0][:10]
            print("   first mismatches:", bad, tA_n[bad], tB_n[bad])

        hit = iA >= 0
        safe_idx = jnp.clip(iA, 0, ktris.count - 1)
        hp, hn, _uv, herr = isect.triangle_winner_attributes(o, d, t_max, safe_idx, ktris)
        key, sub = jax.random.split(key)
        u2 = jax.random.uniform(sub, (n_pix, 2))
        local, _pdf = m.cosine_sample_hemisphere(u2)
        fx, fy, fz = (lambda n: m.coordinate_system(n) + (n,))(hn)
        nd = m.to_world(local, fx, fy, fz)
        o = jnp.where(hit[:, None], isect.offset_point_by_error(hp, hn, herr, nd), o)
        d = jnp.where(hit[:, None], nd, d)
        active = active & hit

    if not args.no_time:
        print(f"\ntotals: closest A={totA * 1e3:.2f}ms B={totB * 1e3:.2f}ms "
              f"({totA / max(totB, 1e-12):.2f}x) | any A={totAa * 1e3:.2f}ms "
              f"B={totBa * 1e3:.2f}ms ({totAa / max(totBa, 1e-12):.2f}x)")


if __name__ == "__main__":
    main()
