import numpy as np
import jax.numpy as jnp

from curry_pbrt_tpu.dtypes import FLOAT_MAX, Float
from curry_pbrt_tpu.ops import intersect as isect
from curry_pbrt_tpu.ops import transform as tf


def make_tris(verts, prim_ids=None):
    verts = np.asarray(verts, np.float32).reshape(-1, 3, 3)
    n = len(verts)
    prim = np.arange(n, dtype=np.int32) if prim_ids is None else np.asarray(prim_ids, np.int32)
    return isect.TriangleArrays(
        jnp.asarray(verts[:, 0]), jnp.asarray(verts[:, 1]), jnp.asarray(verts[:, 2]), jnp.asarray(prim)
    )


def make_spheres(centers, radii, prim_ids=None):
    centers = np.asarray(centers, np.float32).reshape(-1, 3)
    n = len(centers)
    o2w = np.stack([tf.translate(c) for c in centers])
    w2o = np.stack([tf.translate(-c) for c in centers])
    prim = np.arange(n, dtype=np.int32) if prim_ids is None else np.asarray(prim_ids, np.int32)
    return isect.SphereArrays(
        jnp.asarray(o2w), jnp.asarray(w2o), jnp.asarray(np.asarray(radii, np.float32)), jnp.asarray(prim)
    )


def rays(os_, ds_, t_max=None):
    o = jnp.asarray(np.asarray(os_, np.float32).reshape(-1, 3))
    d = jnp.asarray(np.asarray(ds_, np.float32).reshape(-1, 3))
    t = jnp.full((o.shape[0],), FLOAT_MAX) if t_max is None else jnp.asarray(t_max, jnp.float32)
    return o, d, t


UNIT_TRI = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]


class TestSphere:
    def test_hit_front(self):
        sph = make_spheres([[0, 0, 0]], [1.0])
        o, d, t = rays([[0, 0, -5]], [[0, 0, 1]])
        hit = isect.intersect_brute(o, d, t, isect.empty_triangles(), sph)
        assert bool(hit.valid[0])
        assert abs(float(hit.t[0]) - 4.0) < 1e-5
        np.testing.assert_allclose(np.asarray(hit.p[0]), [0, 0, -1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(hit.n[0]), [0, 0, -1], atol=1e-5)

    def test_inside_hits_far_side(self):
        sph = make_spheres([[0, 0, 0]], [1.0])
        o, d, t = rays([[0, 0, 0]], [[0, 0, 1]])
        hit = isect.intersect_brute(o, d, t, isect.empty_triangles(), sph)
        assert bool(hit.valid[0]) and abs(float(hit.t[0]) - 1.0) < 1e-5

    def test_miss(self):
        sph = make_spheres([[0, 0, 0]], [1.0])
        o, d, t = rays([[0, 2, -5]], [[0, 0, 1]])
        hit = isect.intersect_brute(o, d, t, isect.empty_triangles(), sph)
        assert not bool(hit.valid[0])

    def test_t_max_respected(self):
        sph = make_spheres([[0, 0, 0]], [1.0])
        o, d, t = rays([[0, 0, -5]], [[0, 0, 1]], [3.0])
        hit = isect.intersect_brute(o, d, t, isect.empty_triangles(), sph)
        assert not bool(hit.valid[0])

    def test_translated_sphere_normal(self):
        sph = make_spheres([[10, 0, 0]], [2.0])
        o, d, t = rays([[10, 0, -9]], [[0, 0, 1]])
        hit = isect.intersect_brute(o, d, t, isect.empty_triangles(), sph)
        assert bool(hit.valid[0])
        np.testing.assert_allclose(np.asarray(hit.p[0]), [10, 0, -2], atol=1e-4)
        np.testing.assert_allclose(np.asarray(hit.n[0]), [0, 0, -1], atol=1e-5)

    def test_uv_poles(self):
        sph = make_spheres([[0, 0, 0]], [1.0])
        o, d, t = rays([[0, 0, 5]], [[0, 0, -1]])
        hit = isect.intersect_brute(o, d, t, isect.empty_triangles(), sph)
        # +z pole → v = acos(1)/π = 0
        assert abs(float(hit.uv[0, 1])) < 1e-5

    def test_grazing_stability(self):
        # rays nearly tangent to a big far sphere: the stable quadratic must
        # not produce spurious misses or NaNs
        sph = make_spheres([[0, 0, 1000]], [100.0])
        ys = np.linspace(99.99, 100.01, 64, dtype=np.float32)
        o = np.stack([np.zeros(64), ys, np.full(64, -100.0)], -1).astype(np.float32)
        d = np.tile(np.asarray([[0, 0, 1]], np.float32), (64, 1))
        hit = isect.intersect_brute(*rays(o, d), isect.empty_triangles(), sph)
        assert not np.any(np.isnan(np.asarray(hit.t)))
        # all y < 100 - eps must hit
        assert np.all(np.asarray(hit.valid)[ys < 99.995])


class TestTriangle:
    def test_hit_and_barycentric(self):
        tris = make_tris([UNIT_TRI])
        o, d, t = rays([[0.25, 0.25, -3]], [[0, 0, 1]])
        hit = isect.intersect_brute(o, d, t, tris, isect.empty_spheres())
        assert bool(hit.valid[0])
        assert abs(float(hit.t[0]) - 3.0) < 1e-5
        np.testing.assert_allclose(np.asarray(hit.p[0]), [0.25, 0.25, 0], atol=1e-5)

    def test_edge_is_watertight(self):
        # two triangles sharing a diagonal: rays through the shared edge must
        # hit exactly one of them (no leaks)
        quad = [
            [[0, 0, 0], [1, 0, 0], [1, 1, 0]],
            [[1, 1, 0], [0, 1, 0], [0, 0, 0]],
        ]
        tris = make_tris(quad)
        ts = np.linspace(0.01, 0.99, 97, dtype=np.float32)
        o = np.stack([ts, ts, np.full_like(ts, -1.0)], -1)  # along the diagonal
        d = np.tile(np.asarray([[0, 0, 1]], np.float32), (97, 1))
        hit = isect.intersect_brute(*rays(o, d), tris, isect.empty_spheres())
        assert np.all(np.asarray(hit.valid))

    def test_miss_outside(self):
        tris = make_tris([UNIT_TRI])
        o, d, t = rays([[0.9, 0.9, -3]], [[0, 0, 1]])  # outside hypotenuse
        hit = isect.intersect_brute(o, d, t, tris, isect.empty_spheres())
        assert not bool(hit.valid[0])

    def test_backface_still_hits(self):
        tris = make_tris([UNIT_TRI])
        o, d, t = rays([[0.25, 0.25, 3]], [[0, 0, -1]])
        hit = isect.intersect_brute(o, d, t, tris, isect.empty_spheres())
        assert bool(hit.valid[0])

    def test_normal_orientation(self):
        tris = make_tris([UNIT_TRI])
        o, d, t = rays([[0.25, 0.25, -3]], [[0, 0, 1]])
        hit = isect.intersect_brute(o, d, t, tris, isect.empty_spheres())
        # n = normalize((p0-p2) × (p1-p2)) = +z for CCW in xy
        np.testing.assert_allclose(np.asarray(hit.n[0]), [0, 0, 1], atol=1e-6)

    def test_padding_ignored(self):
        tris = make_tris([UNIT_TRI, [[0, 0, 0], [0, 0, 0], [0, 0, 0]]], prim_ids=[0, -1])
        o, d, t = rays([[0.25, 0.25, -3]], [[0, 0, 1]])
        hit = isect.intersect_brute(o, d, t, tris, isect.empty_spheres())
        assert bool(hit.valid[0]) and int(hit.prim[0]) == 0

    def test_closest_of_many(self):
        tris = make_tris(
            [
                [[-9, -9, 5], [9, -9, 5], [0, 9, 5]],
                [[-9, -9, 2], [9, -9, 2], [0, 9, 2]],
                [[-9, -9, 8], [9, -9, 8], [0, 9, 8]],
            ]
        )
        o, d, t = rays([[0, 0, 0]], [[0, 0, 1]])
        hit = isect.intersect_brute(o, d, t, tris, isect.empty_spheres())
        assert int(hit.prim[0]) == 1 and abs(float(hit.t[0]) - 2.0) < 1e-5

    def test_mixed_tri_sphere_closest(self):
        tris = make_tris([[[-9, -9, 5], [9, -9, 5], [0, 9, 5]]], prim_ids=[0])
        sph = make_spheres([[0, 0, 3]], [0.5], prim_ids=[1])
        o, d, t = rays([[0, 0, 0]], [[0, 0, 1]])
        hit = isect.intersect_brute(o, d, t, tris, sph)
        assert int(hit.prim[0]) == 1 and abs(float(hit.t[0]) - 2.5) < 1e-5

    def test_unnormalized_direction(self):
        # shadow rays use d = to - from with t ∈ [0, 1)
        tris = make_tris([UNIT_TRI])
        o, d, t = rays([[0.2, 0.2, -4]], [[0, 0, 8]], [1.0 - 1e-5])
        hit = isect.intersect_brute(o, d, t, tris, isect.empty_spheres())
        assert bool(hit.valid[0]) and abs(float(hit.t[0]) - 0.5) < 1e-5


class TestPredicate:
    def test_predicate(self):
        tris = make_tris([UNIT_TRI])
        sph = make_spheres([[5, 0, 0]], [1.0], prim_ids=[1])
        o, d, t = rays(
            [[0.2, 0.2, -1], [5, 0, -9], [9, 9, -1]],
            [[0, 0, 1], [0, 0, 1], [0, 0, 1]],
        )
        p = np.asarray(isect.intersect_predicate_brute(o, d, t, tris, sph))
        assert list(p) == [True, True, False]


class TestOffsets:
    def test_spawned_ray_does_not_self_hit(self):
        tris = make_tris([[[-5, -5, 0], [5, -5, 0], [0, 5, 0]]])
        o, d, t = rays([[0.1, 0.1, -3]], [[0, 0, 1]])
        hit = isect.intersect_brute(o, d, t, tris, isect.empty_spheres())
        # bounce straight back toward the camera
        new_d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        no, nd = isect.spawn_ray(hit.p, hit.n, hit.p_error, new_d)
        t2 = jnp.full((1,), FLOAT_MAX)
        hit2 = isect.intersect_brute(no, nd, t2, tris, isect.empty_spheres())
        assert not bool(hit2.valid[0])
