"""Flat-BVH traversal must agree exactly with the brute-force oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from curry_pbrt_tpu.dtypes import FLOAT_MAX
from curry_pbrt_tpu.ops import intersect as isect
from curry_pbrt_tpu.ops.bvh import build_flat_bvh, make_bvh_intersectors, bvh_traverse
from curry_pbrt_tpu.sceneio.compiler import compile_scene_string


def random_tri_scene(n_tris=64, n_spheres=4, seed=0):
    """Random triangle soup + spheres compiled through the scene pipeline."""
    rng = np.random.RandomState(seed)
    lines = [
        'Film "image" "integer xresolution" [8] "integer yresolution" [8]',
        'Sampler "halton" "integer pixelsamples" [1]',
        'Camera "perspective" "float fov" [60]',
        'Integrator "path" "integer maxdepth" [2]',
        "WorldBegin",
        'Material "matte"',
    ]
    pts, idx = [], []
    for i in range(n_tris):
        c = rng.rand(3) * 8 - 4 + np.array([0, 0, 8])
        v = c[None, :] + rng.randn(3, 3) * 0.7
        pts.extend(v.reshape(-1))
        idx.extend([3 * i, 3 * i + 1, 3 * i + 2])
    lines.append(
        'Shape "trianglemesh" "integer indices" [%s] "point P" [%s]'
        % (" ".join(map(str, idx)), " ".join("%.5f" % x for x in pts))
    )
    for i in range(n_spheres):
        c = rng.rand(3) * 8 - 4 + np.array([0, 0, 8])
        lines.append("AttributeBegin")
        lines.append("Translate %.4f %.4f %.4f" % tuple(c))
        lines.append('Shape "sphere" "float radius" [%.4f]' % (0.3 + rng.rand()))
        lines.append("AttributeEnd")
    lines.append("WorldEnd")
    return compile_scene_string("\n".join(lines), overrides={"clip": False})


def random_rays(n, seed=1):
    rng = np.random.RandomState(seed)
    o = (rng.rand(n, 3) * 16 - 8 + np.array([0, 0, 8])).astype(np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.full((n,), FLOAT_MAX)


class TestBVHEquivalence:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_closest_hit_matches_brute(self, seed):
        scene = random_tri_scene(seed=seed)
        bvh = build_flat_bvh(scene)
        inter, pred, _tprim = make_bvh_intersectors(bvh, scene.tris, scene.spheres)
        o, d, t = random_rays(512, seed=seed + 10)
        hb = isect.intersect_brute(o, d, t, scene.tris, scene.spheres)
        hv = inter(o, d, t)
        np.testing.assert_array_equal(np.asarray(hb.prim), np.asarray(hv.prim))
        sel = np.asarray(hb.valid)
        np.testing.assert_allclose(
            np.asarray(hb.t)[sel], np.asarray(hv.t)[sel], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(hb.p)[sel], np.asarray(hv.p)[sel], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(hb.n)[sel], np.asarray(hv.n)[sel], atol=1e-5
        )

    def test_predicate_matches_brute(self):
        scene = random_tri_scene(seed=3)
        bvh = build_flat_bvh(scene)
        inter, pred, _tprim = make_bvh_intersectors(bvh, scene.tris, scene.spheres)
        o, d, t = random_rays(512, seed=20)
        pb = np.asarray(
            isect.intersect_predicate_brute(o, d, t, scene.tris, scene.spheres)
        )
        pv = np.asarray(pred(o, d, t))
        np.testing.assert_array_equal(pb, pv)

    def test_t_max_respected(self):
        scene = random_tri_scene(seed=4)
        bvh = build_flat_bvh(scene)
        inter, pred, _tprim = make_bvh_intersectors(bvh, scene.tris, scene.spheres)
        o, d, _ = random_rays(256, seed=30)
        t = jnp.full((256,), 2.0)
        hb = isect.intersect_brute(o, d, t, scene.tris, scene.spheres)
        hv = inter(o, d, t)
        np.testing.assert_array_equal(np.asarray(hb.prim), np.asarray(hv.prim))

    def test_structure_sane(self):
        scene = random_tri_scene(seed=5)
        bvh = build_flat_bvh(scene)
        hit = np.asarray(bvh.hit)
        miss = np.asarray(bvh.miss)
        first = np.asarray(bvh.first)
        count = np.asarray(bvh.count)
        M = bvh.n_nodes
        assert np.all(hit < M) and np.all(miss < M)
        assert np.all(hit >= -1) and np.all(miss >= -1)
        leaves = first >= 0
        # leaf prim slots cover every primitive exactly once
        slots = []
        for f, c in zip(first[leaves], count[leaves]):
            slots.extend(range(f, f + c))
        n_prims = int((np.asarray(scene.tris.prim) >= 0).sum()) + int(
            (np.asarray(scene.spheres.prim) >= 0).sum()
        )
        assert sorted(slots) == list(range(n_prims))
        # hit-links walk forward in DFS order (acyclic traversal)
        assert np.all((hit > np.arange(M)) | (hit == -1))
        assert np.all((miss > np.arange(M)) | (miss == -1))
