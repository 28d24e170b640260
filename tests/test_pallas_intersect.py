"""Equivalence: Pallas cluster-culled triangle kernel vs the jnp brute
intersector.

Runs in interpret mode on the CPU test platform (same math as
ops/intersect.py:watertight_core, so t values must match exactly and the
winning triangle must agree wherever the min is unique). The cluster AABB
cull must never change results — only skip work.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from curry_pbrt_tpu.ops import intersect as isect
from curry_pbrt_tpu.ops.pallas.intersect_kernel import (
    block_aabbs,
    morton_order,
    tri_any_hit_pallas,
    tri_closest_hit_pallas,
)


def _random_scene(seed, n_rays=64, n_tris=37, spread=2.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    p0 = base
    p1 = base + rng.normal(0, 0.7, (n_tris, 3)).astype(np.float32)
    p2 = base + rng.normal(0, 0.7, (n_tris, 3)).astype(np.float32)
    o = rng.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.full((n_rays,), 100.0, np.float32)
    return map(jnp.asarray, (o, d, t_max, p0, p1, p2))


def _aabbs(p0, p1, p2, valid=None):
    if valid is None:
        valid = jnp.ones((p0.shape[0],), bool)
    return jnp.asarray(block_aabbs(p0, p1, p2, valid)), valid


@pytest.mark.parametrize("seed,n_tris", [(0, 37), (1, 37), (2, 37), (4, 300)])
def test_closest_hit_matches_brute(seed, n_tris):
    # n_tris=300 spans 3 tri blocks → exercises the cluster cull + the
    # cross-block t tightening
    o, d, t_max, p0, p1, p2 = _random_scene(seed, n_tris=n_tris)
    tris = isect.TriangleArrays(p0, p1, p2, jnp.arange(p0.shape[0], dtype=jnp.int32))

    tt, _b, ok = isect.triangle_intersect_t(o, d, t_max, tris)
    ref_t = np.asarray(jnp.min(tt, axis=-1))
    ref_any = np.asarray(jnp.any(ok, axis=-1))

    aabbs, valid = _aabbs(p0, p1, p2)
    t, idx = tri_closest_hit_pallas(
        o, d, t_max, p0, p1, p2, valid, aabbs, interpret=True
    )
    t, idx = np.asarray(t), np.asarray(idx)

    assert np.array_equal(idx >= 0, ref_any)
    # same math, but XLA may fuse FMAs differently between the two lowerings:
    # allow last-ULP drift
    np.testing.assert_allclose(t[ref_any], ref_t[ref_any], rtol=1e-6, atol=0)
    # winning triangle must actually produce (essentially) the winning t
    tt = np.asarray(tt)
    for i in np.nonzero(ref_any)[0]:
        np.testing.assert_allclose(tt[i, idx[i]], ref_t[i], rtol=1e-6, atol=0)


def test_morton_order_is_permutation():
    _o, _d, _t, p0, p1, p2 = _random_scene(11, n_tris=500, spread=5.0)
    order = morton_order(p0, p1, p2)
    assert sorted(order.tolist()) == list(range(500))


def test_any_hit_matches_brute():
    o, d, t_max, p0, p1, p2 = _random_scene(7, n_rays=96, n_tris=21)
    tris = isect.TriangleArrays(p0, p1, p2, jnp.arange(p0.shape[0], dtype=jnp.int32))
    _tt, _b, ok = isect.triangle_intersect_t(o, d, t_max, tris, with_bary=False)
    ref = np.asarray(jnp.any(ok, axis=-1))
    aabbs, valid = _aabbs(p0, p1, p2)
    got = np.asarray(
        tri_any_hit_pallas(o, d, t_max, p0, p1, p2, valid, aabbs, interpret=True)
    )
    np.testing.assert_array_equal(got, ref)


def test_padding_lanes_are_misses():
    """Padded rays/tris must not alias into real lanes."""
    o, d, t_max, p0, p1, p2 = _random_scene(3, n_rays=5, n_tris=3)
    valid = jnp.array([True, False, True])
    aabbs, _ = _aabbs(p0, p1, p2, valid)
    t, idx = tri_closest_hit_pallas(o, d, t_max, p0, p1, p2, valid, aabbs,
                                    interpret=True)
    assert t.shape == (5,) and idx.shape == (5,)
    assert not np.any(np.asarray(idx) == 1)  # invalid tri never wins


def test_aggregate_matches_brute_on_mesh():
    """Full pallas aggregate (Morton + clusters + attributes) vs brute on a
    multi-block mesh with spheres."""
    from curry_pbrt_tpu.ops.pallas.aggregate import make_pallas_intersectors

    o, d, t_max, p0, p1, p2 = _random_scene(13, n_rays=128, n_tris=260, spread=4.0)
    tris = isect.TriangleArrays(p0, p1, p2, jnp.arange(260, dtype=jnp.int32))
    sph = isect.SphereArrays(
        jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (1, 4, 4)),
        jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (1, 4, 4)),
        jnp.asarray([1.2], jnp.float32),
        jnp.asarray([260], jnp.int32),
    )
    inter, pred, tprim = make_pallas_intersectors(tris, sph)
    got = inter(o, d, t_max)
    ref = isect.intersect_brute(o, d, t_max, tris=tris, sph=sph)
    np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(ref.prim))
    hit = np.asarray(ref.prim) >= 0
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(ref.t)[hit], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.p)[hit], np.asarray(ref.p)[hit], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(pred(o, d, t_max)),
                                  np.asarray(isect.intersect_predicate_brute(
                                      o, d, t_max, tris=tris, sph=sph)))
    # slim (t, prim) path agrees with the full intersect
    t2, prim2 = tprim(o, d, t_max)
    np.testing.assert_array_equal(np.asarray(prim2), np.asarray(ref.prim))
    np.testing.assert_allclose(
        np.asarray(t2)[hit], np.asarray(ref.t)[hit], rtol=1e-6
    )
