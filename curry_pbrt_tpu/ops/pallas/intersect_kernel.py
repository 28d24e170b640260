"""Pallas TPU kernel: cluster-culled watertight ray–triangle intersection.

Two-level structure, TPU-native (no per-lane gathers, no divergent stacks —
contrast the reference's recursive per-ray BVH, aggregate/bvh.rs:151-190):

  level 1  triangles are pre-sorted into Morton order so each BLOCK_T-sized
           contiguous block is spatially tight; every block carries a
           precomputed AABB ("cluster").
  level 2  the grid is 1-D over ray blocks; the whole tri table is
           VMEM-resident and the kernel sweeps clusters with an in-kernel
           fori_loop. Before testing a cluster it slab-tests the BLOCK_R
           rays against the cluster AABB with each ray's CURRENT best t and
           skips the tile's triangle math with @pl.when if no ray can
           enter — a skipped cluster costs one cheap slab test, no grid
           step, no DMA. Block-level predication replaces per-ray tree
           divergence: rays in a block are coherent (pixel-major layout),
           so most clusters skip.

The per-tile triangle math is the reference's watertight Möller test
(translate–permute–shear + edge functions + conservative fp-error
rejection, geometry/shape/triangle.rs:194-262 / pbrt §3.9) — identical to
ops/intersect.py:watertight_core so equivalence tests can compare behavior
on shared inputs. The accumulated per-ray t tightens as tri blocks stream,
so later clusters behind the current hit are culled too (the BVH's
shrinking-t_max, bvh.rs:161, expressed block-wise).

HBM traffic is O(N + T) per pass (no (N,T) intermediates).

Data layout (last dim = 128 lanes):
  rays:  (16, N) f32 — rows 0-2 origin, 3-5 shear sx/sy/sz, 6 t_max,
         7-9 one-hot permutation kx/ky/kz, 10-12 inv_d (slab test),
         rest padding. Rays on the LANE axis: per-ray scalars broadcast as
         (1, BLOCK_R) rows.
  tris:  (T, 16) f32 — cols 0-8 p0/p1/p2, 9 valid flag. Triangles on the
         SUBLANE axis: per-tri scalars broadcast as (BLOCK_T, 1) columns.
  cluster_aabb: (T/BLOCK_T, 8) f32 — bmin xyz, bmax xyz per tri block
         (empty blocks get an inverted box that can never be entered).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from curry_pbrt_tpu.dtypes import FLOAT_MAX, Float, gamma

_G2 = Float(gamma(2))
_G3 = Float(gamma(3))
_G5 = Float(gamma(5))
_T_SCALE = Float(1.0 + 2.0 * gamma(3))  # conservative slab widening (bounds.rs:303-323)

RAY_ROWS = 16
TRI_COLS = 16
BLOCK_R = 1024  # default rays per tile. Swept at the 32k-ray chunk size:
# large scenes want 1024 (tighter ray blocks -> higher cluster-skip rates:
# 2048 costs ~2x on the 10k mesh); small scenes, where the handful of big
# surfaces can't cull anyway, want 2048 (fewer per-block overheads).
BLOCK_T = 64  # default tris/cluster (swept 32/64/128 on the 10k mesh -> 64);
# small scenes pass block_t=8 so even a Cornell box splits into cullable
# clusters (one 64-tri cluster = zero culling)
MAX_VMEM_TRIS = 500_000  # whole tri table is VMEM-resident (16 f32/tri)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_rays(o, d, t_max, block_r: int = BLOCK_R) -> jnp.ndarray:
    """(N,3),(N,3),(N,) → (16, N_pad) f32 with shear + inv_d precomputed.

    Mirrors ops/intersect.py:ray_shear — kz = argmax |d| (permutation),
    shear maps the ray to +z.
    """
    from curry_pbrt_tpu.ops.intersect import ray_shear

    n = o.shape[0]
    kz, sx, sy, sz = ray_shear(d)
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    inv_d = 1.0 / jnp.where(d == 0, Float(1e-30), d)
    rows = jnp.stack(
        [
            o[:, 0], o[:, 1], o[:, 2],
            sx, sy, sz,
            t_max,
            kx.astype(Float), ky.astype(Float), kz.astype(Float),
            inv_d[:, 0], inv_d[:, 1], inv_d[:, 2],
        ],
        axis=0,
    )
    rows = jnp.concatenate(
        [rows, jnp.zeros((RAY_ROWS - rows.shape[0], n), Float)], axis=0
    )
    n_pad = _round_up(max(n, 1), block_r)
    return jnp.pad(rows, ((0, 0), (0, n_pad - n)))


def pack_tris(p0, p1, p2, valid, block_t: int = BLOCK_T) -> jnp.ndarray:
    """(T,3)×3 + (T,) bool → (T_pad, 16) f32."""
    t = p0.shape[0]
    cols = jnp.concatenate(
        [p0, p1, p2, jnp.where(valid, 1.0, -1.0)[:, None].astype(Float)], axis=-1
    )
    cols = jnp.concatenate(
        [cols, jnp.zeros((t, TRI_COLS - cols.shape[1]), Float)], axis=-1
    )
    t_pad = _round_up(max(t, 1), block_t)
    pad = jnp.zeros((t_pad - t, TRI_COLS), Float).at[:, 9].set(-1.0)
    return jnp.concatenate([cols, pad], axis=0)


def block_aabbs(p0, p1, p2, valid, block_t: int = BLOCK_T) -> np.ndarray:
    """Host-side per-block_t cluster AABBs → (T_pad/block_t, 8) f32.

    Invalid/padding rows are excluded; an all-invalid block gets a NaN box —
    every slab comparison with NaN is false, so it can never be entered (an
    inverted ±1 box would act as a phantom [-1,1]³ box under the min/max
    slab form).
    """
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    p2 = np.asarray(p2, np.float32)
    valid = np.asarray(valid, bool)
    t = p0.shape[0]
    t_pad = _round_up(max(t, 1), block_t)
    nb = t_pad // block_t
    out = np.zeros((nb, 8), np.float32)
    out[:, 0:6] = np.nan
    tmin = np.minimum(np.minimum(p0, p1), p2)
    tmax = np.maximum(np.maximum(p0, p1), p2)
    for b in range(nb):
        sl = slice(b * block_t, min((b + 1) * block_t, t))
        v = valid[sl]
        if v.any():
            out[b, 0:3] = tmin[sl][v].min(axis=0)
            out[b, 3:6] = tmax[sl][v].max(axis=0)
    return out


def morton_order(p0, p1, p2) -> np.ndarray:
    """Host-side Morton (Z-curve) permutation of triangle centroids so
    contiguous BLOCK_T blocks are spatially tight clusters."""
    c = (np.asarray(p0, np.float64) + np.asarray(p1) + np.asarray(p2)) / 3.0
    lo, hi = c.min(axis=0), c.max(axis=0)
    ext = np.where(hi - lo > 0, hi - lo, 1.0)
    q = np.clip(((c - lo) / ext * 1023.0).astype(np.uint64), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    key = (spread(q[:, 0]) << np.uint64(2)) | (spread(q[:, 1]) << np.uint64(1)) | spread(q[:, 2])
    return np.argsort(key, kind="stable").astype(np.int32)


def _cluster_enter(aabb_ref, j, rays_ref, t_best):
    """Slab test of the ray block vs tri block j's AABB → (1, BLOCK_R)
    bool. Conservative (1+2γ₃) widening as in bounds.rs:303-323.

    aabb_ref is the WHOLE (n_blocks, 8) table in SMEM."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    ix = rays_ref[10:11, :]
    iy = rays_ref[11:12, :]
    iz = rays_ref[12:13, :]
    bmin_x = aabb_ref[j, 0]
    bmin_y = aabb_ref[j, 1]
    bmin_z = aabb_ref[j, 2]
    bmax_x = aabb_ref[j, 3]
    bmax_y = aabb_ref[j, 4]
    bmax_z = aabb_ref[j, 5]

    def slab(blo, bhi, o, inv):
        t0 = (blo - o) * inv
        t1 = (bhi - o) * inv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1) * _T_SCALE

    nx, fx = slab(bmin_x, bmax_x, ox, ix)
    ny, fy = slab(bmin_y, bmax_y, oy, iy)
    nz, fz = slab(bmin_z, bmax_z, oz, iz)
    tn = jnp.maximum(nx, jnp.maximum(ny, nz))
    tf = jnp.minimum(fx, jnp.minimum(fy, fz))
    return (tn <= tf) & (tn < t_best) & (tf > 0.0)


def _tile_test(rays_ref, tris_ref, t_best):
    """Watertight test on one (BLOCK_T, BLOCK_R) tile against per-ray
    current-best t. Returns (t, ok): t is FLOAT_MAX where no hit."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    sx = rays_ref[3:4, :]
    sy = rays_ref[4:5, :]
    sz = rays_ref[5:6, :]
    kxf = rays_ref[7:8, :]
    kyf = rays_ref[8:9, :]
    kzf = rays_ref[9:10, :]

    # one-hot permutation masks, shape (1, BLOCK_R)
    mx0 = (kxf == 0.0).astype(Float); mx1 = (kxf == 1.0).astype(Float); mx2 = (kxf == 2.0).astype(Float)
    my0 = (kyf == 0.0).astype(Float); my1 = (kyf == 1.0).astype(Float); my2 = (kyf == 2.0).astype(Float)
    mz0 = (kzf == 0.0).astype(Float); mz1 = (kzf == 1.0).astype(Float); mz2 = (kzf == 2.0).astype(Float)

    def permuted(px, py, pz):
        """Translate by -o then permute per-ray: (BLOCK_T,1)·(1,BLOCK_R)."""
        tx = px - ox  # (BLOCK_T, BLOCK_R)
        ty = py - oy
        tz = pz - oz
        qx = mx0 * tx + mx1 * ty + mx2 * tz
        qy = my0 * tx + my1 * ty + my2 * tz
        qz = mz0 * tx + mz1 * ty + mz2 * tz
        return qx, qy, qz

    p0x = tris_ref[:, 0:1]; p0y = tris_ref[:, 1:2]; p0z = tris_ref[:, 2:3]
    p1x = tris_ref[:, 3:4]; p1y = tris_ref[:, 4:5]; p1z = tris_ref[:, 5:6]
    p2x = tris_ref[:, 6:7]; p2y = tris_ref[:, 7:8]; p2z = tris_ref[:, 8:9]
    valid = tris_ref[:, 9:10] > 0.0

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
    # (Mosaic can't select between i1 vectors, so this is the logical
    # expansion of the reference's det-sign branch.)
    neg_det = det < 0
    in_range = (neg_det & (t_scaled < 0) & (t_scaled >= t_best * det)) | (
        ~neg_det & (t_scaled > 0) & (t_scaled <= t_best * det)
    )
    safe_det = jnp.where(det == 0, 1.0, det)
    inv_det = 1.0 / safe_det
    t = t_scaled * inv_det

    # conservative fp-error rejection (triangle.rs:243-257)
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


def _make_closest_kernel(block_t: int):
    def _closest_kernel(aabb_ref, rays_ref, tris_ref, t_ref, idx_ref):
        """One ray block vs ALL tri clusters: the Morton-ordered tri table
        is VMEM-resident and the cluster sweep is an in-kernel fori_loop so
        a skipped cluster costs one slab test — no grid step, no DMA. (A
        two-level super-cluster variant was tried and measured net-negative
        at ≤10k tris; see PERF.md.)"""
        t_ref[:] = rays_ref[6:7, :]  # per-ray t_max
        idx_ref[:] = jnp.full_like(idx_ref, -1)

        def cluster_body(j, _):
            t_best = t_ref[:]
            enter = _cluster_enter(aabb_ref, j, rays_ref, t_best)

            @pl.when(jnp.any(enter))
            def _():
                off = pl.multiple_of(j * block_t, block_t)
                tri_tile = tris_ref[pl.ds(off, block_t), :]
                t, _ok = _tile_test(rays_ref, tri_tile, t_best)
                t_min = jnp.min(t, axis=0, keepdims=True)
                row = jnp.argmin(t, axis=0).astype(jnp.int32)[None, :]
                tri_idx = j * block_t + row

                # strict improvement, EXCEPT the first hit may land exactly
                # at the incoming t_max (the brute path's watertight in_range
                # accepts t <= t_max; best-t init = t_max would report it as
                # a miss — r3 advisor boundary finding). FLOAT_MAX guard
                # keeps no-hit tiles (t_min == FLOAT_MAX == t_ref when
                # t_max is unbounded) from writing a phantom index.
                better = (t_min < t_ref[:]) | (
                    (t_min == t_ref[:]) & (idx_ref[:] < 0) & (t_min < FLOAT_MAX)
                )
                t_ref[:] = jnp.where(better, t_min, t_ref[:])
                idx_ref[:] = jnp.where(better, tri_idx, idx_ref[:])

            return 0

        jax.lax.fori_loop(0, aabb_ref.shape[0], cluster_body, 0)

    return _closest_kernel


def _make_any_kernel(block_t: int):
    def _any_kernel(aabb_ref, rays_ref, tris_ref, hit_ref):
        hit_ref[:] = jnp.zeros_like(hit_ref)
        t_max = rays_ref[6:7, :]

        def cluster_body(j, _):
            not_hit = hit_ref[:] == 0
            enter = _cluster_enter(aabb_ref, j, rays_ref, t_max) & not_hit

            @pl.when(jnp.any(enter))
            def _():
                off = pl.multiple_of(j * block_t, block_t)
                tri_tile = tris_ref[pl.ds(off, block_t), :]
                _t, ok = _tile_test(rays_ref, tri_tile, t_max)
                any_hit = jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)
                hit_ref[:] = jnp.maximum(hit_ref[:], any_hit)

            return 0

        jax.lax.fori_loop(0, aabb_ref.shape[0], cluster_body, 0)

    return _any_kernel


def _grid_call(kernel, rays, tris, aabbs, out_shapes, out_specs, interpret,
               block_r=BLOCK_R):
    n_pad, t_pad = rays.shape[1], tris.shape[0]
    if t_pad > MAX_VMEM_TRIS:
        raise ValueError(
            f"triangle table ({t_pad}) exceeds the VMEM-resident kernel limit"
            f" ({MAX_VMEM_TRIS}); chunk the scene or extend the kernel with a"
            " tri-table grid dimension"
        )
    grid = (n_pad // block_r,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cluster AABBs
            pl.BlockSpec((RAY_ROWS, block_r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole tri table
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # tri table + per-block buffers (cap, not allocation)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(aabbs, rays, tris)


@functools.partial(jax.jit, static_argnames=("interpret", "block_t", "block_r"))
def tri_closest_hit_pallas(o, d, t_max, p0, p1, p2, valid, aabbs, *,
                           interpret=False, block_t=BLOCK_T, block_r=BLOCK_R):
    """Closest-hit over a Morton-ordered triangle soup. o/d: (N,3),
    t_max: (N,); p0/p1/p2: (T,3) in BLOCK order, valid: (T,) bool;
    aabbs from block_aabbs. Returns (t: (N,), tri: (N,) i32 block-order
    index, -1 on miss)."""
    n = o.shape[0]
    rays = pack_rays(o, d, t_max, block_r)
    tris = pack_tris(p0, p1, p2, valid, block_t)
    n_pad = rays.shape[1]
    t_out, idx_out = _grid_call(
        _make_closest_kernel(block_t), rays, tris, aabbs,
        out_shapes=[
            jax.ShapeDtypeStruct((1, n_pad), Float),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec((1, block_r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
        block_r=block_r,
    )
    t = t_out[0, :n]
    idx = idx_out[0, :n]
    # lanes that never beat t_max keep idx -1; t reported as FLOAT_MAX
    return jnp.where(idx >= 0, t, FLOAT_MAX), idx


@functools.partial(jax.jit, static_argnames=("interpret", "block_t", "block_r"))
def tri_any_hit_pallas(o, d, t_max, p0, p1, p2, valid, aabbs, *,
                       interpret=False, block_t=BLOCK_T, block_r=BLOCK_R):
    """Any-hit (shadow) test. Returns (N,) bool."""
    n = o.shape[0]
    rays = pack_rays(o, d, t_max, block_r)
    tris = pack_tris(p0, p1, p2, valid, block_t)
    n_pad = rays.shape[1]
    hit = _grid_call(
        _make_any_kernel(block_t), rays, tris, aabbs,
        out_shapes=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        out_specs=pl.BlockSpec((1, block_r), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        block_r=block_r,
    )
    return hit[0, :n] > 0
