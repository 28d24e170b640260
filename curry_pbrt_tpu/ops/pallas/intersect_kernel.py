"""Pallas TPU kernel: dense watertight ray–triangle intersection.

The jnp brute path (ops/intersect.py:triangle_intersect_t) materializes the
full (N rays × T tris) t/bary/ok tensors and then argmin-reduces them —
XLA fuses some of it, but the O(N·T) intermediates still round-trip HBM and
the reduction is a separate pass. This kernel keeps the whole (ray-block ×
tri-block) tile in VMEM, reduces to the per-ray running (t_best, tri_best)
in registers, and never writes an O(N·T) tensor: HBM traffic is O(N + T)
per block pair.

Math is the reference's watertight Möller test (translate–permute–shear +
edge functions + conservative fp-error rejection, geometry/shape/
triangle.rs:194-262 / pbrt §3.9) — identical to watertight_core so the
equivalence tests can compare bit-level behavior on shared inputs.

Data layout (chosen for TPU tiling: last dim = 128 lanes):
  rays:  (16, N) f32 — rows 0-2 origin xyz, 3-5 shear sx/sy/sz,
         6 t_max, 7-9 one-hot-encoded permutation kx/ky/kz as floats,
         rest padding. Rays live on the LANE axis so every per-ray scalar
         broadcasts as a (1, BLOCK_R) row.
  tris:  (T, 16) f32 — cols 0-8 p0/p1/p2 xyz, 9 valid flag (>0 = real,
         ≤0 = padding), rest padding. Triangles live on the SUBLANE axis
         so per-tri scalars broadcast as (BLOCK_T, 1) columns.
The (BLOCK_T, BLOCK_R) edge-function tile is the compute shape.
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

RAY_ROWS = 16
TRI_COLS = 16
BLOCK_R = 512  # rays per tile (lanes; multiple of 128)
BLOCK_T = 128  # triangles per tile (sublanes; multiple of 8)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_rays(o, d, t_max) -> jnp.ndarray:
    """(N,3),(N,3),(N,) → (16, N_pad) f32 with the shear precomputed.

    Mirrors ops/intersect.py:ray_shear — kz = argmax |d| (permutation),
    shear maps the ray to +z.
    """
    from curry_pbrt_tpu.ops.intersect import ray_shear

    n = o.shape[0]
    kz, sx, sy, sz = ray_shear(d)
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    rows = jnp.stack(
        [
            o[:, 0], o[:, 1], o[:, 2],
            sx, sy, sz,
            t_max,
            kx.astype(Float), ky.astype(Float), kz.astype(Float),
        ],
        axis=0,
    )
    rows = jnp.concatenate(
        [rows, jnp.zeros((RAY_ROWS - rows.shape[0], n), Float)], axis=0
    )
    n_pad = _round_up(max(n, 1), BLOCK_R)
    return jnp.pad(rows, ((0, 0), (0, n_pad - n)))


def pack_tris(p0, p1, p2, valid) -> jnp.ndarray:
    """(T,3)×3 + (T,) bool → (T_pad, 16) f32."""
    t = p0.shape[0]
    cols = jnp.concatenate(
        [p0, p1, p2, jnp.where(valid, 1.0, -1.0)[:, None].astype(Float)], axis=-1
    )
    cols = jnp.concatenate(
        [cols, jnp.zeros((t, TRI_COLS - cols.shape[1]), Float)], axis=-1
    )
    t_pad = _round_up(max(t, 1), BLOCK_T)
    pad = jnp.zeros((t_pad - t, TRI_COLS), Float).at[:, 9].set(-1.0)
    return jnp.concatenate([cols, pad], axis=0)


def _tile_test(rays_ref, tris_ref):
    """Watertight test on one (BLOCK_T, BLOCK_R) tile.

    Returns (t, ok): t is FLOAT_MAX where no acceptable hit.
    """
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    sx = rays_ref[3:4, :]
    sy = rays_ref[4:5, :]
    sz = rays_ref[5:6, :]
    t_max = rays_ref[6:7, :]
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
    in_range = (neg_det & (t_scaled < 0) & (t_scaled >= t_max * det)) | (
        ~neg_det & (t_scaled > 0) & (t_scaled <= t_max * det)
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


def _closest_kernel(rays_ref, tris_ref, t_ref, idx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, FLOAT_MAX)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    t, _ok = _tile_test(rays_ref, tris_ref)
    t_min = jnp.min(t, axis=0, keepdims=True)  # (1, BLOCK_R)
    row = jnp.argmin(t, axis=0).astype(jnp.int32)[None, :]  # (1, BLOCK_R)
    tri_idx = j * BLOCK_T + row

    better = t_min < t_ref[:]
    t_ref[:] = jnp.where(better, t_min, t_ref[:])
    idx_ref[:] = jnp.where(better, tri_idx, idx_ref[:])


def _any_kernel(rays_ref, tris_ref, hit_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        hit_ref[:] = jnp.zeros_like(hit_ref)

    _t, ok = _tile_test(rays_ref, tris_ref)
    any_hit = jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)
    hit_ref[:] = jnp.maximum(hit_ref[:], any_hit)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tri_closest_hit_pallas(o, d, t_max, p0, p1, p2, valid, *, interpret=False):
    """Closest-hit over a triangle soup. o/d: (N,3), t_max: (N,);
    p0/p1/p2: (T,3), valid: (T,) bool. Returns (t: (N,), tri: (N,) i32,
    tri == -1 on miss)."""
    n = o.shape[0]
    rays = pack_rays(o, d, t_max)
    tris = pack_tris(p0, p1, p2, valid)
    n_pad, t_pad = rays.shape[1], tris.shape[0]
    grid = (n_pad // BLOCK_R, t_pad // BLOCK_T)

    t_out, idx_out = pl.pallas_call(
        _closest_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_ROWS, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_T, TRI_COLS), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), Float),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(rays, tris)
    return t_out[0, :n], idx_out[0, :n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def tri_any_hit_pallas(o, d, t_max, p0, p1, p2, valid, *, interpret=False):
    """Any-hit (shadow) test. Returns (N,) bool."""
    n = o.shape[0]
    rays = pack_rays(o, d, t_max)
    tris = pack_tris(p0, p1, p2, valid)
    n_pad, t_pad = rays.shape[1], tris.shape[0]
    grid = (n_pad // BLOCK_R, t_pad // BLOCK_T)

    hit = pl.pallas_call(
        _any_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_ROWS, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_T, TRI_COLS), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        interpret=interpret,
    )(rays, tris)
    return hit[0, :n] > 0
