"""Pallas-backed aggregate: dense closest/any-hit with VMEM-tiled triangles.

Drop-in replacement for the jnp brute intersector (ops/intersect.py) and the
flat-BVH traversal (ops/bvh.py) for medium scenes: the triangle test runs in
the Pallas kernel (O(N+T) HBM traffic instead of the jnp path's O(N·T)
intermediates, which XLA pads minor-dim 3 → 128 lanes — a 42× memory blowup
that OOMs at 32k rays × 2k tris), spheres run through the jnp dense test
(sphere counts are tiny in every reference scene), and hit attributes are
reconstructed only for each ray's winning primitive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from curry_pbrt_tpu.dtypes import FLOAT_MAX, Float
from curry_pbrt_tpu.ops import intersect as isect
from curry_pbrt_tpu.ops.pallas.intersect_kernel import (
    tri_any_hit_pallas,
    tri_closest_hit_pallas,
)


def make_pallas_intersectors(tris: isect.TriangleArrays, sph: isect.SphereArrays):
    """Returns (intersect, predicate) callables matching the brute API."""
    have_tris = tris.count > 0
    have_sph = sph.count > 0
    tri_valid = tris.prim >= 0 if have_tris else None
    # Mosaic only compiles on TPU; everywhere else (the 8-device CPU test
    # platform) the kernel runs in interpret mode — same math, same results.
    interp = jax.default_backend() != "tpu"

    def _tri_closest(o, d, t_max):
        t, idx = tri_closest_hit_pallas(
            o, d, t_max, tris.p0, tris.p1, tris.p2, tri_valid, interpret=interp
        )
        return t, idx, idx >= 0

    def intersect(o, d, t_max) -> isect.Hit:
        N = o.shape[0]
        p = jnp.zeros((N, 3), Float)
        n = jnp.zeros((N, 3), Float)
        uv = jnp.zeros((N, 2), Float)
        perr = jnp.zeros((N, 3), Float)
        prim = jnp.full((N,), -1, jnp.int32)
        t_out = jnp.broadcast_to(jnp.asarray(FLOAT_MAX), (N,))

        if have_tris:
            tri_t, tri_idx, tri_hit = _tri_closest(o, d, t_max)
        if have_sph:
            st, sok = isect.sphere_intersect_t(o, d, t_max, sph)
            sph_best = jnp.argmin(st, axis=-1).astype(jnp.int32)
            oh_s = jnp.arange(st.shape[1], dtype=jnp.int32)[None, :] == sph_best[:, None]
            sph_t = jnp.min(st, axis=-1)
            sph_hit = jnp.any(sok & oh_s, axis=-1)

        if have_tris and have_sph:
            use_tri = tri_hit & (~sph_hit | (tri_t <= sph_t))
            use_sph = sph_hit & ~use_tri
        elif have_tris:
            use_tri, use_sph = tri_hit, None
        elif have_sph:
            use_tri, use_sph = None, sph_hit
        else:
            return isect.Hit(t_out, prim, p, n, uv, perr)

        if have_tris:
            safe_idx = jnp.clip(tri_idx, 0, tris.count - 1)
            # winner-only watertight re-test to recover barycentrics (same
            # trick as the BVH attribute pass, ops/bvh.py)
            p0 = jnp.take(tris.p0, safe_idx, axis=0)
            p1 = jnp.take(tris.p1, safe_idx, axis=0)
            p2 = jnp.take(tris.p2, safe_idx, axis=0)
            perm, sx, sy, sz = isect.ray_shear(d)
            _t, b, _ok = isect.watertight_core(o, perm, sx, sy, sz, t_max, p0, p1, p2)
            tp, tn, tuv, terr = isect.triangle_hit_attributes(safe_idx, b, tris)
            m = use_tri[:, None]
            p = jnp.where(m, tp, p)
            n = jnp.where(m, tn, n)
            uv = jnp.where(use_tri[:, None], tuv, uv)
            perr = jnp.where(m, terr, perr)
            t_out = jnp.where(use_tri, tri_t, t_out)
            prim = jnp.where(use_tri, jnp.take(tris.prim, safe_idx), prim)
        if have_sph:
            sp, sn, suv, serr = isect.sphere_hit_attributes(sph_best, sph_t, o, d, sph)
            m = use_sph[:, None]
            p = jnp.where(m, sp, p)
            n = jnp.where(m, sn, n)
            uv = jnp.where(use_sph[:, None], suv, uv)
            perr = jnp.where(m, serr, perr)
            t_out = jnp.where(use_sph, sph_t, t_out)
            prim = jnp.where(use_sph, jnp.take(sph.prim, sph_best), prim)

        return isect.Hit(t_out, prim, p, n, uv, perr)

    def predicate(o, d, t_max):
        hit = jnp.zeros(o.shape[:1], bool)
        if have_tris:
            hit = hit | tri_any_hit_pallas(
                o, d, t_max, tris.p0, tris.p1, tris.p2, tri_valid, interpret=interp
            )
        if have_sph:
            _st, sok = isect.sphere_intersect_t(o, d, t_max, sph)
            hit = hit | jnp.any(sok, axis=-1)
        return hit

    return intersect, predicate
