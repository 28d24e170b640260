"""Group-granularity Pallas traversal: 8-ray × 128-tri native tiles.

The lane-major kernel (intersect_kernel.py) predicates tile tests at
256-lane sub-group granularity: a cluster entered for ONE ray pays the
watertight math for 256. tools/probe_granularity.py measures the cost of
that lockstep on the real mesh workloads: at 8-ray granularity the same
sweep needs only ~0.27× the tile flops (mesh10k, renderer ray order) —
the remaining gap to the reference's per-ray BVH (aggregate/bvh.rs:151-190)
is the 8-ray union, which for coherent neighbors is small.

This kernel transposes the tile: rays live on SUBLANES in groups of 8
(one VPU-native (8, 128) tile per elementwise op against 128 triangles on
LANES), and each group sweeps the cluster hierarchy independently with its
own evolving best-t — per-group predication instead of per-256-lane:

  rays   (n_groups, 8, 16)  — group g is rays_ref[g], a leading-axis index
                              (plain address arithmetic, no lane shuffles);
                              per-ray scalars are (8, 1) column slices
  tris   (cps, 16, 128)     — cluster c is tris_ref[c]; per-vertex
                              coordinates are (1, 128) row slices
  t/idx  (n_groups, 8, 1)   — per-group output tiles

The sweep order (slab → front-to-back supers → front-to-back clusters),
the conservative (1+2γ₃) slab widening, the watertight tile math
(triangle.rs:194-262 / pbrt §3.9), the strict-improvement + first-hit-at-
t_max acceptance, and the lowest-index tie-break are all IDENTICAL to the
lane-major kernel, so both produce bit-equal (t, idx) for the same tables
— which is how this kernel is tested and checksum-gated.

Hierarchy gating per group: dead groups (all t_max<=0) skip everything;
the slab box gates multi-slab scenes; the super box gates its 8 statically
unrolled clusters; the cluster box gates the tile test. All boxes are
(8, 1)-shaped tests of the group's 8 rays (the scalar loop over supers
runs on the sparse core while the VPU does tile math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curry_pbrt_tpu.dtypes import FLOAT_MAX, Float, gamma
from curry_pbrt_tpu.ops.pallas.intersect_kernel import (
    SUPER_G,
    TriTables,
    _round_up,
)

_G2 = Float(gamma(2))
_G3 = Float(gamma(3))
_G5 = Float(gamma(5))
_T_SCALE = Float(1.0 + 2.0 * gamma(3))

GROUP_R = 8  # rays per predication group (one sublane tile)
RAY_COLS = 16
BLOCK_T = 128  # tris per cluster = one full lane tile


def pack_rays_groups(o, d, t_max, block_r: int) -> jnp.ndarray:
    """(N,3),(N,3),(N,) → (N_pad/8, 8, 16) f32 — same column semantics as
    intersect_kernel.pack_rays rows (o, shear, t_max, k one-hots, inv_d);
    padding rays get t_max=0 (dead)."""
    from curry_pbrt_tpu.ops.intersect import ray_shear

    n = o.shape[0]
    kz, sx, sy, sz = ray_shear(d)
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    inv_d = 1.0 / jnp.where(d == 0, Float(1e-30), d)
    cols = jnp.stack(
        [
            o[:, 0], o[:, 1], o[:, 2],
            sx, sy, sz,
            t_max,
            kx.astype(Float), ky.astype(Float), kz.astype(Float),
            inv_d[:, 0], inv_d[:, 1], inv_d[:, 2],
        ],
        axis=-1,
    )
    cols = jnp.concatenate(
        [cols, jnp.zeros((n, RAY_COLS - cols.shape[1]), Float)], axis=-1
    )
    n_pad = _round_up(max(n, 1), block_r)
    cols = jnp.pad(cols, ((0, n_pad - n), (0, 0)))
    return cols.reshape(n_pad // GROUP_R, GROUP_R, RAY_COLS)


def tris_lane_major(tables: TriTables) -> np.ndarray:
    """tables.tris16 (T_pad, 16) → (n_clusters, 16, block_t) with triangles
    on the lane axis (host-side, numpy)."""
    t_pad = tables.tris16.shape[0]
    nc = tables.cluster_aabbs.shape[0]
    bt = t_pad // nc
    return np.ascontiguousarray(
        tables.tris16.reshape(nc, bt, 16).transpose(0, 2, 1)
    )


def _box8(aabb_ref, row, R, t_best):
    """Slab test of one 8-ray group vs AABB table row → (8, 1) bool.
    Same semantics as intersect_kernel._box_enter (conservative widening,
    dead-lane gate)."""
    ox, oy, oz = R[:, 0:1], R[:, 1:2], R[:, 2:3]
    ix, iy, iz = R[:, 10:11], R[:, 11:12], R[:, 12:13]

    def slab(blo, bhi, o, inv):
        t0 = (blo - o) * inv
        t1 = (bhi - o) * inv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1) * _T_SCALE

    nx, fx = slab(aabb_ref[row, 0], aabb_ref[row, 3], ox, ix)
    ny, fy = slab(aabb_ref[row, 1], aabb_ref[row, 4], oy, iy)
    nz, fz = slab(aabb_ref[row, 2], aabb_ref[row, 5], oz, iz)
    tn = jnp.maximum(nx, jnp.maximum(ny, nz))
    tf = jnp.minimum(fx, jnp.minimum(fy, fz))
    return (tn <= tf) & (tn < t_best) & (tf > 0.0) & (t_best > 0.0)


def _tile8(R, tri, t_best):
    """Watertight test of one 8-ray group vs one (16, 128) cluster tile →
    (t: (8, BLOCK_T) with FLOAT_MAX misses, ok). Transposed twin of
    intersect_kernel._tile_test — identical per-pair fp ops."""
    ox, oy, oz = R[:, 0:1], R[:, 1:2], R[:, 2:3]
    sx, sy, sz = R[:, 3:4], R[:, 4:5], R[:, 5:6]
    kxf, kyf, kzf = R[:, 7:8], R[:, 8:9], R[:, 9:10]

    mx0 = (kxf == 0.0).astype(Float); mx1 = (kxf == 1.0).astype(Float); mx2 = (kxf == 2.0).astype(Float)
    my0 = (kyf == 0.0).astype(Float); my1 = (kyf == 1.0).astype(Float); my2 = (kyf == 2.0).astype(Float)
    mz0 = (kzf == 0.0).astype(Float); mz1 = (kzf == 1.0).astype(Float); mz2 = (kzf == 2.0).astype(Float)

    def permuted(px, py, pz):
        tx = px - ox  # (8, BLOCK_T)
        ty = py - oy
        tz = pz - oz
        qx = mx0 * tx + mx1 * ty + mx2 * tz
        qy = my0 * tx + my1 * ty + my2 * tz
        qz = mz0 * tx + mz1 * ty + mz2 * tz
        return qx, qy, qz

    p0x, p0y, p0z = tri[0:1, :], tri[1:2, :], tri[2:3, :]
    p1x, p1y, p1z = tri[3:4, :], tri[4:5, :], tri[5:6, :]
    p2x, p2y, p2z = tri[6:7, :], tri[7:8, :], tri[8:9, :]
    valid = tri[9:10, :] > 0.0

    q0x, q0y, q0z = permuted(p0x, p0y, p0z)
    q1x, q1y, q1z = permuted(p1x, p1y, p1z)
    q2x, q2y, q2z = permuted(p2x, p2y, p2z)

    x0 = q0x + sx * q0z; y0 = q0y + sy * q0z
    x1 = q1x + sx * q1z; y1 = q1y + sy * q1z
    x2 = q2x + sx * q2z; y2 = q2y + sy * q2z

    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1
    same_side = ~(((e0 < 0) | (e1 < 0) | (e2 < 0)) & ((e0 > 0) | (e1 > 0) | (e2 > 0)))
    det = e0 + e1 + e2
    z0 = q0z * sz; z1 = q1z * sz; z2 = q2z * sz
    t_scaled = e0 * z0 + e1 * z1 + e2 * z2
    neg_det = det < 0
    in_range = (neg_det & (t_scaled < 0) & (t_scaled >= t_best * det)) | (
        ~neg_det & (t_scaled > 0) & (t_scaled <= t_best * det)
    )
    safe_det = jnp.where(det == 0, 1.0, det)
    inv_det = 1.0 / safe_det
    t = t_scaled * inv_det

    max_zt = jnp.maximum(jnp.abs(z0), jnp.maximum(jnp.abs(z1), jnp.abs(z2)))
    max_xt = jnp.maximum(jnp.abs(x0), jnp.maximum(jnp.abs(x1), jnp.abs(x2)))
    max_yt = jnp.maximum(jnp.abs(y0), jnp.maximum(jnp.abs(y1), jnp.abs(y2)))
    delta_z = _G3 * max_zt
    delta_x = _G5 * (max_xt + max_zt)
    delta_y = _G5 * (max_yt + max_zt)
    delta_e = 2.0 * (_G2 * max_xt * max_yt + delta_y * max_xt + delta_x * max_yt)
    max_e = jnp.maximum(jnp.abs(e0), jnp.maximum(jnp.abs(e1), jnp.abs(e2)))
    delta_t = (
        3.0
        * (_G3 * max_e * max_zt + delta_e * max_zt + delta_z * max_e)
        * jnp.abs(inv_det)
    )

    ok = valid & same_side & (det != 0) & in_range & (t > delta_t)
    return jnp.where(ok, t, FLOAT_MAX), ok


def _make_group_closest_kernel(block_t: int, clusters_per_slab: int,
                               n_slabs: int, n_groups: int):
    """Per-group hierarchy sweep; (t, idx) carried by value through the
    loops and written once per group per grid step."""

    def kernel(slab_aabb_ref, super_aabb_ref, caabb_ref, rays_ref, tris_ref,
               t_ref, idx_ref):
        j = pl.program_id(1)

        def group_body(g, _):
            R = rays_ref[g]  # (8, 16)
            tmax0 = R[:, 6:7]
            t0 = jnp.where(j == 0, tmax0, t_ref[g])
            i0 = jnp.where(j == 0, jnp.full_like(idx_ref[g], -1), idx_ref[g])

            def cluster_step(c, t_cur, i_cur):
                enter = _box8(caabb_ref, c, R, t_cur)

                def tile(args):
                    t_cur, i_cur = args
                    tri = tris_ref[c]  # (16, block_t)
                    t, _ok = _tile8(R, tri, t_cur)
                    t_min = jnp.min(t, axis=1, keepdims=True)
                    row = jnp.argmin(t, axis=1, keepdims=True).astype(jnp.int32)
                    tri_idx = (j * clusters_per_slab + c) * block_t + row
                    # strict improvement except first hit exactly at the
                    # incoming t_max (see intersect_kernel._test_lanes)
                    better = (t_min < t_cur) | (
                        (t_min == t_cur) & (i_cur < 0) & (t_min < FLOAT_MAX)
                    )
                    return (jnp.where(better, t_min, t_cur),
                            jnp.where(better, tri_idx, i_cur))

                return jax.lax.cond(jnp.any(enter), tile, lambda a: a,
                                    (t_cur, i_cur))

            def super_body(s, carry):
                t_cur, i_cur = carry
                enter_s = _box8(super_aabb_ref, s, R, t_cur)

                def visit(args):
                    t_cur, i_cur = args
                    for c_off in range(SUPER_G):  # static unroll
                        t_cur, i_cur = cluster_step(
                            s * SUPER_G + c_off, t_cur, i_cur)
                    return t_cur, i_cur

                return jax.lax.cond(jnp.any(enter_s), visit, lambda a: a,
                                    (t_cur, i_cur))

            def sweep(args):
                return jax.lax.fori_loop(
                    0, clusters_per_slab // SUPER_G, super_body, args)

            if n_slabs > 1:
                gate = jnp.any(_box8(slab_aabb_ref, j, R, t0))
            else:
                gate = jnp.any(t0 > 0.0)
            t1, i1 = jax.lax.cond(gate, sweep, lambda a: a, (t0, i0))
            t_ref[g] = t1
            idx_ref[g] = i1
            return 0

        jax.lax.fori_loop(0, n_groups, group_body, 0)

    return kernel


def _make_group_any_kernel(block_t: int, clusters_per_slab: int,
                           n_slabs: int, n_groups: int):
    def kernel(slab_aabb_ref, super_aabb_ref, caabb_ref, rays_ref, tris_ref,
               hit_ref):
        j = pl.program_id(1)

        def group_body(g, _):
            R = rays_ref[g]
            tmax = R[:, 6:7]
            h0 = jnp.where(j == 0, jnp.zeros_like(hit_ref[g]), hit_ref[g])

            def cluster_step(c, h):
                live = jnp.where(h > 0, Float(0.0), tmax)  # hit lanes dead
                enter = _box8(caabb_ref, c, R, live)

                def tile(h):
                    tri = tris_ref[c]
                    _t, ok = _tile8(R, tri, tmax)
                    any_hit = jnp.any(ok, axis=1, keepdims=True)
                    return jnp.maximum(h, any_hit.astype(jnp.int32))

                return jax.lax.cond(jnp.any(enter), tile, lambda h: h, h)

            def super_body(s, h):
                live = jnp.where(h > 0, Float(0.0), tmax)
                enter_s = _box8(super_aabb_ref, s, R, live)

                def visit(h):
                    for c_off in range(SUPER_G):
                        h = cluster_step(s * SUPER_G + c_off, h)
                    return h

                return jax.lax.cond(jnp.any(enter_s), visit, lambda h: h, h)

            def sweep(h):
                return jax.lax.fori_loop(
                    0, clusters_per_slab // SUPER_G, super_body, h)

            live0 = jnp.where(h0 > 0, Float(0.0), tmax)
            if n_slabs > 1:
                gate = jnp.any(_box8(slab_aabb_ref, j, R, live0))
            else:
                gate = jnp.any(live0 > 0.0)
            hit_ref[g] = jax.lax.cond(gate, sweep, lambda h: h, h0)
            return 0

        jax.lax.fori_loop(0, n_groups, group_body, 0)

    return kernel


def _group_grid_call(kernel, rays_g, tris_lm, caabb, saabb, slab_aabb,
                     out_shapes, out_specs, interpret, block_r, cps):
    n_groups_total = rays_g.shape[0]
    gpb = block_r // GROUP_R  # groups per ray block
    n_slabs = slab_aabb.shape[0]
    grid = (n_groups_total // gpb, n_slabs)
    block_t = tris_lm.shape[2]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # slab AABBs (full)
            pl.BlockSpec((cps // SUPER_G, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((cps, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((gpb, GROUP_R, RAY_COLS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cps, 16, block_t), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(slab_aabb, saabb, caabb, rays_g, tris_lm)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "block_t", "block_r", "clusters_per_slab"),
)
def tri_closest_hit_groups(o, d, t_max, tris_lm, caabb, saabb, slab_aabb, *,
                           block_t: int, clusters_per_slab: int,
                           interpret=False, block_r: int = 1024):
    """Closest-hit over group-major tables. Returns (t: (N,), tri: (N,) i32
    table-row index, -1 on miss) — bit-equal to tri_closest_hit_tables on
    the same TriTables (same sweep order, same acceptance, same tie-break).
    """
    n = o.shape[0]
    rays_g = pack_rays_groups(o, d, t_max, block_r)
    n_groups_total = rays_g.shape[0]
    gpb = block_r // GROUP_R
    out_shapes = [
        jax.ShapeDtypeStruct((n_groups_total, GROUP_R, 1), Float),
        jax.ShapeDtypeStruct((n_groups_total, GROUP_R, 1), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((gpb, GROUP_R, 1), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gpb, GROUP_R, 1), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    t_out, idx_out = _group_grid_call(
        _make_group_closest_kernel(block_t, clusters_per_slab,
                                   slab_aabb.shape[0], gpb),
        rays_g, tris_lm, caabb, saabb, slab_aabb,
        out_shapes=out_shapes, out_specs=out_specs,
        interpret=interpret, block_r=block_r, cps=clusters_per_slab,
    )
    t = t_out.reshape(-1)[:n]
    idx = idx_out.reshape(-1)[:n]
    return jnp.where(idx >= 0, t, FLOAT_MAX), idx


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "block_t", "block_r", "clusters_per_slab"),
)
def tri_any_hit_groups(o, d, t_max, tris_lm, caabb, saabb, slab_aabb, *,
                       block_t: int, clusters_per_slab: int,
                       interpret=False, block_r: int = 1024):
    """Any-hit (shadow) test over group-major tables → (N,) bool."""
    n = o.shape[0]
    rays_g = pack_rays_groups(o, d, t_max, block_r)
    n_groups_total = rays_g.shape[0]
    gpb = block_r // GROUP_R
    hit = _group_grid_call(
        _make_group_any_kernel(block_t, clusters_per_slab,
                               slab_aabb.shape[0], gpb),
        rays_g, tris_lm, caabb, saabb, slab_aabb,
        out_shapes=jax.ShapeDtypeStruct((n_groups_total, GROUP_R, 1),
                                        jnp.int32),
        out_specs=pl.BlockSpec((gpb, GROUP_R, 1), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret, block_r=block_r, cps=clusters_per_slab,
    )
    return hit.reshape(-1)[:n] > 0
