"""Pallas sphere cluster kernel: cluster-culled closest/any-hit over sphere
tables, replacing the dense O(rays × spheres) jnp path beyond a few dozen
spheres (the reference puts spheres in its BVH like any primitive,
aggregate/bvh.rs:24-124; our dense path was the one remaining O(N·S)
scaling hole — VERDICT r4 item 9 / aggregate.py's old >256 warning).

Reuses the triangle kernel's machinery wholesale (same ray packing, same
(1+2γ₃)-widened slab tests, same slab/super/cluster streamed sweep, same
sub-group predication — intersect_kernel._make_closest_kernel is
parameterized by tile test): only the per-pair math differs. A sphere is
one table row holding its world-to-object transform + radius; the tile
test maps each ray into each sphere's object space (rows (S,1) × ray
lanes (1,R)) and solves the reference's stable q-form quadratic
(sphere.rs:111-132) — identical fp ops to ops/intersect.sphere_quadratic,
so results match the dense path bit-for-bit (modulo exact-t tie winners,
whose table order differs).

Sphere table layout (S_pad, 16) f32, spheres on the SUBLANE axis:
  cols 0-8  w2o rotation rows (r00 r01 r02 r10 .. r22)
  cols 9-11 w2o translation
  col 12    radius
  col 13    valid flag (+1/-1)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curry_pbrt_tpu.dtypes import FLOAT_MAX, Float
from curry_pbrt_tpu.ops.pallas.intersect_kernel import (
    SUPER_G,
    _make_any_kernel,
    _make_closest_kernel,
    _round_up,
    _slab_grid_call,
    kdmedian_order,
    union_boxes,
)

BLOCK_S = 64  # spheres per cluster (sublane rows per tile)
SPH_COLS = 16


def _sphere_tile_test(rays_ref, sph_tile, t_best, lane_ds=None):
    """Stable-quadratic test of one (BLOCK_S, lanes) tile. Returns (t, ok)
    with FLOAT_MAX misses — same acceptance as sphere_quadratic: t0 if ≥ 0
    else t1, reject t0 > t_best or t1 < 0."""
    ls = slice(None) if lane_ds is None else lane_ds
    ox = rays_ref[0:1, ls]
    oy = rays_ref[1:2, ls]
    oz = rays_ref[2:3, ls]
    dx = rays_ref[13:14, ls]  # raw direction rows (pack_rays 13-15)
    dy = rays_ref[14:15, ls]
    dz = rays_ref[15:16, ls]

    m00 = sph_tile[:, 0:1]; m01 = sph_tile[:, 1:2]; m02 = sph_tile[:, 2:3]
    m10 = sph_tile[:, 3:4]; m11 = sph_tile[:, 4:5]; m12 = sph_tile[:, 5:6]
    m20 = sph_tile[:, 6:7]; m21 = sph_tile[:, 7:8]; m22 = sph_tile[:, 8:9]
    tx = sph_tile[:, 9:10]; ty = sph_tile[:, 10:11]; tz = sph_tile[:, 11:12]
    radius = sph_tile[:, 12:13]
    valid = sph_tile[:, 13:14] > 0.0

    oox = m00 * ox + m01 * oy + m02 * oz + tx  # (S, R)
    ooy = m10 * ox + m11 * oy + m12 * oz + ty
    ooz = m20 * ox + m21 * oy + m22 * oz + tz
    ddx = m00 * dx + m01 * dy + m02 * dz
    ddy = m10 * dx + m11 * dy + m12 * dz
    ddz = m20 * dx + m21 * dy + m22 * dz

    a = ddx * ddx + ddy * ddy + ddz * ddz
    safe_a = jnp.where(a == 0, 1.0, a)
    b_half = oox * ddx + ooy * ddy + ooz * ddz
    r2 = radius * radius
    c = oox * oox + ooy * ooy + ooz * ooz - r2
    t_center = -b_half / safe_a
    px = oox + t_center * ddx
    py = ooy + t_center * ddy
    pz = ooz + t_center * ddz
    perp2 = px * px + py * py + pz * pz
    disc_ok = (perp2 <= r2) & (a > 0)
    # safe_sqrt's forward form (double-where), identical fp ops to the
    # dense path so t matches bit-for-bit
    disc = a * (r2 - perp2)
    s = jnp.where(disc <= 0.0, 0.0,
                  jnp.sqrt(jnp.where(disc <= 0.0, 1.0, disc)))
    sgn = jnp.where(b_half >= 0, 1.0, -1.0)
    q = -(b_half + sgn * s)
    safe_q = jnp.where(q == 0, 1.0, q)
    r1 = q / safe_a
    r2_ = jnp.where(q == 0, r1, c / safe_q)
    t0 = jnp.minimum(r1, r2_)
    t1 = jnp.maximum(r1, r2_)
    t = jnp.where(t0 >= 0.0, t0, t1)
    ok = valid & disc_ok & (t0 <= t_best) & (t1 >= 0.0) & (t <= t_best)
    return jnp.where(ok, t, FLOAT_MAX), ok


@dataclasses.dataclass
class SphereTables:
    """Host-built sphere kernel tables (kd-ordered, slab-padded)."""

    sph16: np.ndarray  # (S_pad, 16)
    row_sphere: np.ndarray  # (S_pad,) i32 original sphere index, -1 pad
    cluster_aabbs: np.ndarray  # (C, 8)
    super_aabbs: np.ndarray
    slab_aabbs: np.ndarray
    block_s: int
    clusters_per_slab: int
    use_supers: bool


def build_sphere_tables(
    w2o, o2w, radius, prim,
    block_s: int = BLOCK_S,
    view_origin=None,
    clusters_per_slab: int = 256,
    use_supers=None,
) -> SphereTables:
    """kd-median-order spheres by world center, group block_s rows into
    AABB-carrying clusters (+supers/slabs as the tri tables), order
    front-to-back from view_origin. Invalid rows get valid=-1."""
    w2o = np.asarray(w2o, np.float32)
    o2w = np.asarray(o2w, np.float32)
    radius = np.asarray(radius, np.float32)
    prim = np.asarray(prim, np.int32)
    s = radius.shape[0]

    centers = o2w[:, :3, 3]
    # conservative world radius of the transformed object-space sphere
    # (same bound as ops/bvh._prim_bounds)
    rw = np.abs(o2w[:, :3, :3]).sum(axis=2).max(axis=1) * radius

    order = kdmedian_order(centers, centers, centers, block_s)
    w2o, o2w, radius, prim = w2o[order], o2w[order], radius[order], prim[order]
    centers, rw = centers[order], rw[order]

    nc_raw = -(-max(s, 1) // block_s)
    if use_supers is None:
        use_supers = nc_raw > 96
    use_supers = bool(use_supers)
    if use_supers or nc_raw > clusters_per_slab:
        nc = _round_up(nc_raw, SUPER_G)
        cps = int(min(clusters_per_slab, nc))
        n_slabs = -(-nc // cps)
        nc = n_slabs * cps
    else:
        nc, cps, n_slabs = nc_raw, nc_raw, 1
    s_pad = nc * block_s

    sph16 = np.zeros((s_pad, SPH_COLS), np.float32)
    sph16[:, 13] = -1.0
    sph16[:s, 0:9] = w2o[:, :3, :3].reshape(s, 9)
    sph16[:s, 9:12] = w2o[:, :3, 3]
    sph16[:s, 12] = radius
    sph16[:s, 13] = np.where(prim >= 0, 1.0, -1.0)
    row_sphere = np.concatenate(
        [order.astype(np.int32), np.full((s_pad - s,), -1, np.int32)]
    )

    valid = sph16[:, 13] > 0
    bmin = np.where(valid[:s, None], centers - rw[:, None], np.nan)
    bmax = np.where(valid[:s, None], centers + rw[:, None], np.nan)
    bmin = np.concatenate([bmin, np.full((s_pad - s, 3), np.nan, np.float32)])
    bmax = np.concatenate([bmax, np.full((s_pad - s, 3), np.nan, np.float32)])
    boxes8 = np.concatenate(
        [bmin, bmax, np.zeros((s_pad, 2), np.float32)], axis=-1
    ).astype(np.float32)
    caabb = union_boxes(boxes8.reshape(nc, block_s, 8))

    if view_origin is not None:
        vo = np.asarray(view_origin, np.float64)
        ccent = (caabb[:, 0:3].astype(np.float64) + caabb[:, 3:6]) * 0.5
        cdist = np.linalg.norm(ccent - vo, axis=-1)
        cdist = np.where(np.isnan(cdist), np.inf, cdist)
        ns = nc // SUPER_G
        if nc % SUPER_G == 0:
            sdist = cdist.reshape(ns, SUPER_G).min(axis=1)
            sorder = np.argsort(sdist, kind="stable")
            within = np.argsort(cdist.reshape(ns, SUPER_G), axis=1, kind="stable")
            cluster_order = (sorder[:, None] * SUPER_G + within[sorder]).reshape(-1)
        else:
            cluster_order = np.argsort(cdist, kind="stable")
        row_order = (
            cluster_order[:, None] * block_s + np.arange(block_s)[None, :]
        ).reshape(-1)
        sph16, row_sphere = sph16[row_order], row_sphere[row_order]
        caabb = caabb[cluster_order]

    use_supers = use_supers and cps > SUPER_G
    ns = nc // SUPER_G
    if use_supers:
        saabb = union_boxes(caabb.reshape(ns, SUPER_G, 8))
    else:
        saabb = union_boxes(caabb[None, :, :])
    slab_aabb = union_boxes(caabb.reshape(n_slabs, cps, 8))

    return SphereTables(
        sph16=sph16, row_sphere=row_sphere, cluster_aabbs=caabb,
        super_aabbs=saabb, slab_aabbs=slab_aabb, block_s=block_s,
        clusters_per_slab=cps, use_supers=use_supers,
    )


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "block_s", "block_r", "clusters_per_slab",
                     "use_supers", "subgroups"),
)
def sphere_closest_hit_tables(o, d, t_max, sph16, caabb, saabb, slab_aabb, *,
                              block_s: int, clusters_per_slab: int,
                              use_supers: bool, interpret=False,
                              block_r: int = 2048, subgroups: int = 1):
    """Closest-hit over sphere tables → (t: (N,), row: (N,) i32 table row,
    -1 on miss)."""
    from curry_pbrt_tpu.ops.pallas.intersect_kernel import pack_rays

    n = o.shape[0]
    rays = pack_rays(o, d, t_max, block_r)
    n_pad = rays.shape[1]
    out_shapes = [
        jax.ShapeDtypeStruct((1, n_pad), Float),
        jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((1, block_r), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_r), lambda i, j: (0, i), memory_space=pltpu.VMEM),
    ]
    if subgroups > 1 and block_r % (subgroups * 128):
        raise ValueError("subgroups must divide block_r into 128-lane multiples")
    outs = _slab_grid_call(
        _make_closest_kernel(block_s, clusters_per_slab, use_supers, False,
                             slab_aabb.shape[0], subgroups,
                             tile_test=_sphere_tile_test),
        rays, sph16, caabb, saabb, slab_aabb,
        out_shapes=out_shapes, out_specs=out_specs,
        interpret=interpret, block_r=block_r, cps=clusters_per_slab,
        use_supers=use_supers,
    )
    t = outs[0][0, :n]
    idx = outs[1][0, :n]
    return jnp.where(idx >= 0, t, FLOAT_MAX), idx


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "block_s", "block_r", "clusters_per_slab",
                     "use_supers", "subgroups"),
)
def sphere_any_hit_tables(o, d, t_max, sph16, caabb, saabb, slab_aabb, *,
                          block_s: int, clusters_per_slab: int,
                          use_supers: bool, interpret=False,
                          block_r: int = 2048, subgroups: int = 1):
    """Any-hit over sphere tables → (N,) bool."""
    from curry_pbrt_tpu.ops.pallas.intersect_kernel import pack_rays

    n = o.shape[0]
    rays = pack_rays(o, d, t_max, block_r)
    n_pad = rays.shape[1]
    if subgroups > 1 and block_r % (subgroups * 128):
        raise ValueError("subgroups must divide block_r into 128-lane multiples")
    hit = _slab_grid_call(
        _make_any_kernel(block_s, clusters_per_slab, use_supers,
                         slab_aabb.shape[0], subgroups,
                         tile_test=_sphere_tile_test),
        rays, sph16, caabb, saabb, slab_aabb,
        out_shapes=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        out_specs=pl.BlockSpec((1, block_r), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret, block_r=block_r, cps=clusters_per_slab,
        use_supers=use_supers,
    )
    return hit[0, :n] > 0
