"""Flat threaded BVH: host SAH build → arrays → lockstep device traversal.

The reference builds a full-sweep SAH tree and traverses it recursively per
ray (/root/reference/src/aggregate/bvh.rs). A recursion stack is hostile to
lockstep SIMD, so the device structure here is a THREADED BVH: every node
carries a `hit` link (next node in depth-first order) and a `miss` link
(the sibling-or-ancestor escape), making traversal a single per-lane node
pointer — no stack, no divergence beyond the while-loop trip count:

    ptr = 0
    while any(ptr != END):
        node = gather(nodes, ptr)
        enter = slab_test(node.bounds, ray, t_max)
        if node is leaf and enter: test its ≤LEAF_SIZE prims, shrink t_max
        ptr = enter ? node.hit : node.miss

The SAH build replicates the reference cost model exactly: full sort per
axis, prefix/suffix bound sweeps, cost = 0.125 + (n_L·SA_L + n_R·SA_R)/SA_P,
leaf when the best cost exceeds the primitive count (bvh.rs:24-124). The
builder runs in C++ when the native extension is built (native/bvh_builder)
and falls back to vectorized numpy.

Slab test matches bounds.rs:303-323: cached 1/d, sign-selected slabs, and
the conservative (1 + 2γ₃) t_far scaling.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from curry_pbrt_tpu.dtypes import FLOAT_MAX, Float, gamma
from curry_pbrt_tpu.ops import intersect as isect

LEAF_SIZE = 4
END = np.int32(-1)
_T_SCALE = Float(1.0 + 2.0 * gamma(3))


class FlatBVH(NamedTuple):
    bmin: jnp.ndarray  # (M,3)
    bmax: jnp.ndarray  # (M,3)
    hit: jnp.ndarray  # (M,) i32 next-if-enter
    miss: jnp.ndarray  # (M,) i32 next-if-skip
    first: jnp.ndarray  # (M,) i32 first prim slot (leaves), -1 internal
    count: jnp.ndarray  # (M,) i32 ≤ LEAF_SIZE
    prim_refs: jnp.ndarray  # (K,) i32: tri index, or n_tris + sphere index
    n_tris: int

    @property
    def n_nodes(self) -> int:
        return int(self.bmin.shape[0])


# ---------------------------------------------------------------------------
# host build


def _prim_bounds(scene) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-primitive AABBs + encoded refs. Returns (bmin (P,3), bmax, refs)."""
    p0 = np.asarray(scene.tris.p0)
    p1 = np.asarray(scene.tris.p1)
    p2 = np.asarray(scene.tris.p2)
    tri_valid = np.asarray(scene.tris.prim) >= 0
    tmin = np.minimum(np.minimum(p0, p1), p2)[tri_valid]
    tmax = np.maximum(np.maximum(p0, p1), p2)[tri_valid]
    tri_refs = np.nonzero(tri_valid)[0].astype(np.int32)

    o2w = np.asarray(scene.spheres.o2w)
    radius = np.asarray(scene.spheres.radius)
    sph_valid = np.asarray(scene.spheres.prim) >= 0
    centers = o2w[:, :3, 3][sph_valid]
    # conservative world AABB of a transformed object-space sphere
    r = (np.abs(o2w[:, :3, :3]).sum(axis=2).max(axis=1) * radius)[sph_valid]
    smin = centers - r[:, None]
    smax = centers + r[:, None]
    n_tris = int(np.asarray(scene.tris.p0).shape[0])
    sph_refs = (np.nonzero(sph_valid)[0] + n_tris).astype(np.int32)

    bmin = np.concatenate([tmin, smin], axis=0)
    bmax = np.concatenate([tmax, smax], axis=0)
    refs = np.concatenate([tri_refs, sph_refs])
    return bmin.astype(np.float32), bmax.astype(np.float32), refs


def _sah_build(bmin, bmax):
    """Reference-cost SAH recursive build → (nodes, order): node dicts in
    DFS pre-order and the permuted primitive index array (numpy fallback
    path; the C++ builder produces flat arrays directly)."""
    return _sah_build_numpy(bmin, bmax)


def _sah_build_numpy(bmin, bmax):
    centers = 0.5 * (bmin + bmax)
    n = len(bmin)
    order = np.arange(n)
    nodes = []  # dicts: leaf {first,count,bmin,bmax} / internal {left,right,bmin,bmax}

    def surface_area(mn, mx):
        d = np.maximum(mx - mn, 0)
        return 2.0 * (d[..., 0] * d[..., 1] + d[..., 0] * d[..., 2] + d[..., 1] * d[..., 2])

    def build(lo, hi):
        """Builds subtree over order[lo:hi]; returns node id (DFS pre-order:
        parent before children so hit-links are node_id+1)."""
        idx = order[lo:hi]
        node_bmin = bmin[idx].min(axis=0)
        node_bmax = bmax[idx].max(axis=0)
        count = hi - lo
        me = len(nodes)
        nodes.append(None)  # reserve
        if count <= 1:
            nodes[me] = dict(leaf=True, first=lo, count=count, bmin=node_bmin, bmax=node_bmax)
            return me
        best = None  # (cost, axis, split_i, sorted_idx)
        sa_parent = max(surface_area(node_bmin, node_bmax), 1e-20)
        for axis in range(3):
            srt = idx[np.argsort(centers[idx, axis], kind="stable")]
            fmn = np.minimum.accumulate(bmin[srt], axis=0)
            fmx = np.maximum.accumulate(bmax[srt], axis=0)
            rmn = np.minimum.accumulate(bmin[srt][::-1], axis=0)[::-1]
            rmx = np.maximum.accumulate(bmax[srt][::-1], axis=0)[::-1]
            i = np.arange(1, count)
            cost = 0.125 + (
                i * surface_area(fmn[:-1], fmx[:-1])
                + (count - i) * surface_area(rmn[1:], rmx[1:])
            ) / sa_parent
            k = int(np.argmin(cost))
            if best is None or cost[k] < best[0]:
                best = (float(cost[k]), axis, k, srt)
        cost, axis, k, srt = best
        if cost > count:
            nodes[me] = dict(leaf=True, first=lo, count=count, bmin=node_bmin, bmax=node_bmax)
            return me
        order[lo:hi] = srt
        left = build(lo, lo + k + 1)
        right = build(lo + k + 1, hi)
        nodes[me] = dict(
            leaf=False, left=left, right=right, axis=axis, bmin=node_bmin, bmax=node_bmax
        )
        return me

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000 + 2 * n))
    try:
        build(0, n)
    finally:
        sys.setrecursionlimit(old)
    return nodes, order


def build_flat_bvh(scene) -> FlatBVH:
    bmin, bmax, refs = _prim_bounds(scene)
    if len(refs) == 0:
        z3 = jnp.zeros((1, 3), Float)
        return FlatBVH(
            z3, z3, jnp.full((1,), END), jnp.full((1,), END),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32), int(np.asarray(scene.tris.p0).shape[0]),
        )
    # native C++ builder (SAH + threading + flattening in one pass)
    from curry_pbrt_tpu.ops import bvh_native

    flat = bvh_native.sah_build_flat(bmin, bmax)
    if flat is not None:
        return FlatBVH(
            bmin=jnp.asarray(flat["bmin"]), bmax=jnp.asarray(flat["bmax"]),
            hit=jnp.asarray(flat["hit"]), miss=jnp.asarray(flat["miss"]),
            first=jnp.asarray(flat["first"]), count=jnp.asarray(flat["count"]),
            prim_refs=jnp.asarray(refs[flat["order"]].astype(np.int32)),
            n_tris=int(np.asarray(scene.tris.p0).shape[0]),
        )

    nodes, order = _sah_build(bmin, bmax)

    # flatten with threading; oversize SAH leaves split into chained
    # fixed-width leaf nodes
    fb_min, fb_max, fhit, fmiss, ffirst, fcount = [], [], [], [], [], []

    def emit_iter(root):
        # stack of (node_id, miss_link_resolver) where links are filled after
        # allocation; we process DFS so children positions are known on the way
        def alloc_node(node, miss):
            me = len(fb_min)
            fb_min.append(node["bmin"]); fb_max.append(node["bmax"])
            ffirst.append(-1); fcount.append(0)
            fhit.append(-2); fmiss.append(miss)
            return me

        def rec(node_id, miss):
            node = nodes[node_id]
            if node["leaf"]:
                first, count = node["first"], node["count"]
                me = len(fb_min)
                pieces = [
                    (first + k, min(LEAF_SIZE, count - k)) for k in range(0, count, LEAF_SIZE)
                ] or [(first, 0)]
                for i, (f0, c0) in enumerate(pieces):
                    nxt = miss if i == len(pieces) - 1 else len(fb_min) + 1
                    fb_min.append(node["bmin"]); fb_max.append(node["bmax"])
                    ffirst.append(f0); fcount.append(c0)
                    fhit.append(nxt); fmiss.append(nxt)
                return me
            me = alloc_node(node, miss)
            right_placeholder = []
            left_id = None
            # left child's escape goes to the right child's (unknown) index:
            # process right first? No — DFS order must be left-first for
            # hit-links. Record left subtree, then patch.
            mark = len(fb_min)
            lid = rec(node_id=node["left"], miss=-3)  # -3 = patch-to-right
            rid = rec(node_id=node["right"], miss=miss)
            fhit[me] = lid
            for j in range(mark, rid):
                if fmiss[j] == -3:
                    fmiss[j] = rid
                if fhit[j] == -3:
                    fhit[j] = rid
            return me

        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 10000 + 4 * len(nodes)))
        try:
            rec(root, -1)
        finally:
            sys.setrecursionlimit(old)

    emit_iter(0)

    pr = refs[order]
    return FlatBVH(
        bmin=jnp.asarray(np.asarray(fb_min, np.float32)),
        bmax=jnp.asarray(np.asarray(fb_max, np.float32)),
        hit=jnp.asarray(np.asarray(fhit, np.int32)),
        miss=jnp.asarray(np.asarray(fmiss, np.int32)),
        first=jnp.asarray(np.asarray(ffirst, np.int32)),
        count=jnp.asarray(np.asarray(fcount, np.int32)),
        prim_refs=jnp.asarray(pr.astype(np.int32)),
        n_tris=int(np.asarray(scene.tris.p0).shape[0]),
    )


# ---------------------------------------------------------------------------
# device traversal


def _slab_test(bmin, bmax, o, inv_d, neg, t_max):
    """bounds.rs:303-323 slab test. bmin/bmax: (N,3) gathered; o: (N,3);
    inv_d: (N,3); neg: (N,3) bool (d<0); t_max: (N,)."""
    near = jnp.where(neg, bmax, bmin)
    far = jnp.where(neg, bmin, bmax)
    t0 = (near - o) * inv_d
    t1 = (far - o) * inv_d * _T_SCALE
    tn = jnp.max(t0, axis=-1)
    tf = jnp.min(t1, axis=-1)
    return (tn <= tf) & (tn < t_max) & (tf > 0.0)


def _leaf_prim_test(bvh: FlatBVH, tris, sph, slot, valid, o, d, shear, t_max):
    """Test one leaf slot's primitive per lane. Returns (t, code, ok)."""
    ref = jnp.take(bvh.prim_refs, jnp.clip(slot, 0, bvh.prim_refs.shape[0] - 1))
    is_tri = ref < bvh.n_tris
    tri_idx = jnp.clip(ref, 0, max(tris.count - 1, 0))
    sph_idx = jnp.clip(ref - bvh.n_tris, 0, max(sph.count - 1, 0))

    perm, sx, sy, sz = shear
    if tris.count > 0:
        p0 = jnp.take(tris.p0, tri_idx, axis=0)
        p1 = jnp.take(tris.p1, tri_idx, axis=0)
        p2 = jnp.take(tris.p2, tri_idx, axis=0)
        t_tri, _b, ok_tri = isect.watertight_core(o, perm, sx, sy, sz, t_max, p0, p1, p2)
    else:
        t_tri = jnp.full(o.shape[:-1], FLOAT_MAX)
        ok_tri = jnp.zeros(o.shape[:-1], bool)
    if sph.count > 0:
        w2o = jnp.take(sph.w2o, sph_idx, axis=0)
        radius = jnp.take(sph.radius, sph_idx)
        o_obj = jnp.einsum("nij,nj->ni", w2o[:, :3, :3], o) + w2o[:, :3, 3]
        d_obj = jnp.einsum("nij,nj->ni", w2o[:, :3, :3], d)
        t_s, ok_s = isect.sphere_quadratic(o_obj, d_obj, radius, t_max)
    else:
        t_s = jnp.full(o.shape[:-1], FLOAT_MAX)
        ok_s = jnp.zeros(o.shape[:-1], bool)

    t = jnp.where(is_tri, t_tri, t_s)
    ok = valid & jnp.where(is_tri, ok_tri, ok_s)
    return jnp.where(ok, t, FLOAT_MAX), ref, ok


def bvh_traverse(bvh: FlatBVH, tris, sph, o, d, t_max, any_hit: bool = False):
    """→ (t: (N,), ref: (N,) winning prim_ref or -1).

    With any_hit=True, exits lanes on first confirmed hit (shadow rays).
    """
    N = o.shape[0]
    inv_d = 1.0 / jnp.where(d == 0, Float(1e-30), d)
    neg = d < 0.0
    shear = isect.ray_shear(d)

    def cond(state):
        ptr, t_best, ref_best = state
        return jnp.any(ptr >= 0)

    def body(state):
        ptr, t_best, ref_best = state
        live = ptr >= 0
        p = jnp.maximum(ptr, 0)
        nb_min = jnp.take(bvh.bmin, p, axis=0)
        nb_max = jnp.take(bvh.bmax, p, axis=0)
        first = jnp.take(bvh.first, p)
        count = jnp.take(bvh.count, p)
        hit_l = jnp.take(bvh.hit, p)
        miss_l = jnp.take(bvh.miss, p)

        enter = _slab_test(nb_min, nb_max, o, inv_d, neg, t_best) & live
        is_leaf = (first >= 0) & enter

        t_new, ref_new = t_best, ref_best
        for k in range(LEAF_SIZE):
            valid = is_leaf & (k < count)
            t_k, ref_k, ok_k = _leaf_prim_test(
                bvh, tris, sph, first + k, valid, o, d, shear, t_new
            )
            better = ok_k & (t_k < t_new)
            t_new = jnp.where(better, t_k, t_new)
            ref_new = jnp.where(better, ref_k, ref_new)

        nxt = jnp.where(enter, hit_l, miss_l)
        if any_hit:
            nxt = jnp.where(ref_new >= 0, END, nxt)
        ptr = jnp.where(live, nxt, ptr)
        return ptr, t_new, ref_new

    ptr0 = jnp.zeros((N,), jnp.int32)
    state = (ptr0, t_max, jnp.full((N,), -1, jnp.int32))
    ptr, t, ref = jax.lax.while_loop(cond, body, state)
    return t, ref


def make_bvh_intersectors(bvh: FlatBVH, tris, sph):
    """Returns (intersect, predicate, intersect_tprim) callables matching
    the brute API."""

    def intersect(o, d, t_max) -> isect.Hit:
        t, ref = bvh_traverse(bvh, tris, sph, o, d, t_max, any_hit=False)
        N = o.shape[0]
        is_tri = (ref >= 0) & (ref < bvh.n_tris)
        is_sph = ref >= bvh.n_tris
        tri_idx = jnp.clip(ref, 0, max(tris.count - 1, 0))
        sph_idx = jnp.clip(ref - bvh.n_tris, 0, max(sph.count - 1, 0))

        p = jnp.zeros((N, 3), Float)
        n = jnp.zeros((N, 3), Float)
        uv = jnp.zeros((N, 2), Float)
        perr = jnp.zeros((N, 3), Float)
        prim = jnp.full((N,), -1, jnp.int32)
        if tris.count > 0:
            # winner-only re-test + attributes, single vertex gather
            tp, tn, tuv, terr = isect.triangle_winner_attributes(
                o, d, t_max, tri_idx, tris
            )
            mask = is_tri[:, None]
            p = jnp.where(mask, tp, p)
            n = jnp.where(mask, tn, n)
            uv = jnp.where(is_tri[:, None], tuv, uv)
            perr = jnp.where(mask, terr, perr)
            prim = jnp.where(is_tri, jnp.take(tris.prim, tri_idx), prim)
        if sph.count > 0:
            sp, sn, suv, serr = isect.sphere_hit_attributes(sph_idx, t, o, d, sph)
            mask = is_sph[:, None]
            p = jnp.where(mask, sp, p)
            n = jnp.where(mask, sn, n)
            uv = jnp.where(is_sph[:, None], suv, uv)
            perr = jnp.where(mask, serr, perr)
            prim = jnp.where(is_sph, jnp.take(sph.prim, sph_idx), prim)
        return isect.Hit(t, prim, p, n, uv, perr)

    def predicate(o, d, t_max):
        _t, ref = bvh_traverse(bvh, tris, sph, o, d, t_max, any_hit=True)
        return ref >= 0

    def intersect_tprim(o, d, t_max):
        """(t, prim) only — no attribute reconstruction (NEE MIS leg)."""
        t, ref = bvh_traverse(bvh, tris, sph, o, d, t_max, any_hit=False)
        is_tri = (ref >= 0) & (ref < bvh.n_tris)
        is_sph = ref >= bvh.n_tris
        tri_idx = jnp.clip(ref, 0, max(tris.count - 1, 0))
        sph_idx = jnp.clip(ref - bvh.n_tris, 0, max(sph.count - 1, 0))
        prim = jnp.full(o.shape[:1], -1, jnp.int32)
        if tris.count > 0:
            prim = jnp.where(is_tri, jnp.take(tris.prim, tri_idx), prim)
        if sph.count > 0:
            prim = jnp.where(is_sph, jnp.take(sph.prim, sph_idx), prim)
        return jnp.where(ref >= 0, t, FLOAT_MAX), prim

    return intersect, predicate, intersect_tprim
