#!/usr/bin/env python
"""Predication-granularity payoff analysis for the Pallas traversal
(VERDICT r4 item 1: lane-level lockstep waste).

For the renderer's real per-bounce workload (camera rays + cosine-bounced
continuations, as tools/roofline.py), computes the tile-test flops a
cluster sweep would execute if tile tests were predicated at ray-group
granularity G, for G in {1024, 256, 128, 64, 32, 16, 8, 1}:

    flops(G) = sum over (group, cluster) pairs with any ray entering
               of G * block_t * 120

using each ray's CONVERGED best t as the slab bound (the limit an ideal
front-to-back sweep approaches; the current kernel's evolving t_best sits
between this and the t_max upper bound). G=256 is the production subgroup
width, so flops(256)/flops(G) is the ideal speedup of re-predicating at G.
G=1 is the per-ray lower bound (the reference BVH's regime,
aggregate/bvh.rs:151-190).

Also evaluates ray orderings (consecutive grouping happens AFTER the sort):
  pixel    — renderer order (production for <=512 clusters)
  oct_cell — direction-octant-major Morton sort (production beyond 512)
  first_c  — sort by each ray's first entered cluster id (candidate key)

Pure-CPU: workload via interpret-mode kernel, analysis in numpy.
"""

import argparse
import sys
import warnings
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

GROUPS = [1024, 256, 128, 64, 32, 16, 8, 1]
TILE_FLOPS = 120.0


def slab_enter(o, inv_d, t_bound, caabb, chunk=4096):
    """(N,3),(N,3),(N,),(C,8) -> (N,C) bool enter mask (kernel's _box_enter
    semantics incl. (1+2γ₃) widening, dead-lane gate, NaN padding boxes)."""
    from curry_pbrt_tpu.dtypes import gamma

    scale = np.float32(1.0 + 2.0 * gamma(3))
    bmin = caabb[None, :, 0:3]  # (1,C,3)
    bmax = caabb[None, :, 3:6]
    outs = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        for i in range(0, o.shape[0], chunk):
            oo = o[i:i + chunk, None, :]
            ii = inv_d[i:i + chunk, None, :]
            t0 = (bmin - oo) * ii
            t1 = (bmax - oo) * ii
            tn = np.minimum(t0, t1).max(axis=-1)
            tf = (np.maximum(t0, t1) * scale).min(axis=-1)
            tb = t_bound[i:i + chunk, None]
            outs.append((tn <= tf) & (tn < tb) & (tf > 0) & (tb > 0))
    return np.concatenate(outs, axis=0)


def flops_at(enter, g, block_t):
    n = enter.shape[0] - enter.shape[0] % g
    e = enter[:n].reshape(n // g, g, -1).any(axis=1)
    return float(e.sum()) * g * block_t * TILE_FLOPS


def analyze(scene_name, depth, chunk_rays, seed=0):
    from curry_pbrt_tpu.ops import intersect as isect
    from curry_pbrt_tpu.ops.pallas.aggregate import plan_tri_kernel
    from curry_pbrt_tpu.ops.pallas.intersect_kernel import tri_closest_hit_tables
    from curry_pbrt_tpu.models.camera import generate_rays
    from curry_pbrt_tpu.ops import math as m
    from curry_pbrt_tpu.sceneio.compiler import compile_scene_file

    scene = compile_scene_file(REPO / "scenes" / scene_name)
    tables, block_t, block_r, small = plan_tri_kernel(
        scene.tris, np.asarray(scene.camera.camera_to_world)[:3, 3]
    )
    ktris = isect.TriangleArrays(
        jnp.asarray(tables.p0), jnp.asarray(tables.p1),
        jnp.asarray(tables.p2), jnp.asarray(tables.prim),
    )
    kern = partial(
        tri_closest_hit_tables,
        tris16=jnp.asarray(tables.tris16),
        caabb=jnp.asarray(tables.cluster_aabbs),
        saabb=jnp.asarray(tables.super_aabbs),
        slab_aabb=jnp.asarray(tables.slab_aabbs),
        block_t=block_t, clusters_per_slab=tables.clusters_per_slab,
        use_supers=tables.use_supers, interpret=True, block_r=block_r,
    )
    caabb = tables.cluster_aabbs

    xres, yres = scene.settings.resolution
    n_pix = min(chunk_rays, xres * yres)
    ys, xs = np.mgrid[0:yres, 0:xres]
    px_all = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    px = px_all[:: max(len(px_all) // n_pix, 1)][:n_pix]
    rng = np.random.default_rng(seed)
    o, d = generate_rays(scene.camera, jnp.asarray(px + rng.random((n_pix, 2), np.float32) - 0.5), None)

    print(f"== {scene_name}: clusters={caabb.shape[0]} block_t={block_t} "
          f"block_r={block_r} rays={n_pix}")
    print(f"{'bounce':>6} {'order':>8} | " +
          " ".join(f"G={g:<5}" for g in GROUPS) + "  (relative flops, G=256 order=pixel == 1.0)")

    active = jnp.ones((n_pix,), bool)
    key = jax.random.PRNGKey(seed)
    totals = {}
    for bounce in range(depth):
        t_max = jnp.where(active, 1e30, 0.0)
        t, idx = kern(jnp.asarray(o), jnp.asarray(d), t_max)
        on = np.asarray(o, np.float32)
        dn = np.asarray(d, np.float32)
        dz = np.where(dn == 0, 1e-30, dn)
        inv_d = (1.0 / dz).astype(np.float32)
        # converged bound: final best t for hits, t_max for misses, 0 dead
        tmn = np.asarray(t_max, np.float32)
        tb = np.where(np.asarray(idx) >= 0, np.asarray(t, np.float32), tmn)
        tb = np.minimum(tb, tmn)

        enter = slab_enter(on, inv_d, tb, caabb)

        orders = {"pixel": np.arange(n_pix)}
        # production sort key (aggregate._sort_key, oct-major)
        sb = tables.slab_aabbs
        lo3 = np.nanmin(sb[:, 0:3], axis=0)
        ext3 = np.maximum(np.nanmax(sb[:, 3:6], axis=0) - lo3, 1e-6)
        q = np.clip((on - lo3) / ext3 * 8.0, 0.0, 7.0).astype(np.uint32)

        def spread3(x):
            x = (x | (x << 4)) & np.uint32(0x0C3)
            x = (x | (x << 2)) & np.uint32(0x249)
            return x

        cell = (spread3(q[:, 0]) << 2) | (spread3(q[:, 1]) << 1) | spread3(q[:, 2])
        octant = ((dn[:, 0] < 0) * 4 + (dn[:, 1] < 0) * 2 + (dn[:, 2] < 0)).astype(np.uint32)
        keyv = octant * 512 + cell
        keyv = np.where(tmn > 0, keyv, np.uint32(1 << 14))
        orders["oct_cell"] = np.argsort(keyv, kind="stable")
        # first-entered-cluster key (dead lanes last)
        first_c = np.where(enter.any(axis=1), enter.argmax(axis=1), enter.shape[1])
        orders["first_c"] = np.argsort(np.where(tmn > 0, first_c, 1 << 20), kind="stable")

        base = None
        for oname, perm in orders.items():
            e = enter[perm]
            row = []
            for g in GROUPS:
                f = flops_at(e, g, block_t)
                totals.setdefault((oname, g), 0.0)
                totals[(oname, g)] += f
                row.append(f)
            if base is None:
                base = row[GROUPS.index(256)] or 1.0
            print(f"{bounce:>6} {oname:>8} | " +
                  " ".join(f"{f / base:7.3f}" for f in row))

        # continuation (matches tools/roofline.py)
        hit = idx >= 0
        safe_idx = jnp.clip(idx, 0, ktris.count - 1)
        hp, hn, _uv, herr = isect.triangle_winner_attributes(
            jnp.asarray(o), jnp.asarray(d), t_max, safe_idx, ktris)
        key, sub = jax.random.split(key)
        u2 = jax.random.uniform(sub, (n_pix, 2))
        local, _pdf = m.cosine_sample_hemisphere(u2)
        fx, fy, fz = (lambda n: m.coordinate_system(n) + (n,))(hn)
        nd = m.to_world(local, fx, fy, fz)
        o = jnp.where(hit[:, None], isect.offset_point_by_error(hp, hn, herr, nd), o)
        d = jnp.where(hit[:, None], nd, d)
        active = active & hit

    print(f"\ntotals over all bounces (relative to order=pixel G=256 "
          f"= {totals[('pixel', 256)]:.4g} flops):")
    base = totals[("pixel", 256)] or 1.0
    for oname in ("pixel", "oct_cell", "first_c"):
        print(f"{oname:>8} | " + " ".join(
            f"{totals[(oname, g)] / base:7.3f}" for g in GROUPS))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="*", default=["mesh10k.pbrt"])
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--chunk", type=int, default=32768)
    args = ap.parse_args()
    for s in args.scenes or ["mesh10k.pbrt"]:
        analyze(s, args.depth, args.chunk)


if __name__ == "__main__":
    main()
