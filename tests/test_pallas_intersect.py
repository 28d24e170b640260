"""Equivalence: Pallas dense triangle kernel vs the jnp brute intersector.

Runs in interpret mode on the CPU test platform (same math as
ops/intersect.py:watertight_core, so t values must match exactly and the
winning triangle must agree wherever the min is unique).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from curry_pbrt_tpu.ops import intersect as isect
from curry_pbrt_tpu.ops.pallas.intersect_kernel import (
    tri_any_hit_pallas,
    tri_closest_hit_pallas,
)


def _random_scene(seed, n_rays=64, n_tris=37):
    rng = np.random.default_rng(seed)
    # triangles scattered in [-2,2]^3
    base = rng.uniform(-2, 2, (n_tris, 3)).astype(np.float32)
    p0 = base
    p1 = base + rng.normal(0, 0.7, (n_tris, 3)).astype(np.float32)
    p2 = base + rng.normal(0, 0.7, (n_tris, 3)).astype(np.float32)
    o = rng.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.full((n_rays,), 100.0, np.float32)
    return map(jnp.asarray, (o, d, t_max, p0, p1, p2))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_closest_hit_matches_brute(seed):
    o, d, t_max, p0, p1, p2 = _random_scene(seed)
    tris = isect.TriangleArrays(p0, p1, p2, jnp.arange(p0.shape[0], dtype=jnp.int32))

    tt, _b, ok = isect.triangle_intersect_t(o, d, t_max, tris)
    ref_t = np.asarray(jnp.min(tt, axis=-1))
    ref_any = np.asarray(jnp.any(ok, axis=-1))

    t, idx = tri_closest_hit_pallas(
        o, d, t_max, p0, p1, p2, jnp.ones((p0.shape[0],), bool), interpret=True
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


def test_any_hit_matches_brute():
    o, d, t_max, p0, p1, p2 = _random_scene(7, n_rays=96, n_tris=21)
    tris = isect.TriangleArrays(p0, p1, p2, jnp.arange(p0.shape[0], dtype=jnp.int32))
    _tt, _b, ok = isect.triangle_intersect_t(o, d, t_max, tris)
    ref = np.asarray(jnp.any(ok, axis=-1))
    got = np.asarray(
        tri_any_hit_pallas(o, d, t_max, p0, p1, p2, jnp.ones((p0.shape[0],), bool),
                           interpret=True)
    )
    np.testing.assert_array_equal(got, ref)


def test_padding_lanes_are_misses():
    """Padded rays/tris must not alias into real lanes."""
    o, d, t_max, p0, p1, p2 = _random_scene(3, n_rays=5, n_tris=3)
    valid = jnp.array([True, False, True])
    t, idx = tri_closest_hit_pallas(o, d, t_max, p0, p1, p2, valid, interpret=True)
    assert t.shape == (5,) and idx.shape == (5,)
    assert not np.any(np.asarray(idx) == 1)  # invalid tri never wins
