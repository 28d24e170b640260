"""Differentiable reconstruction-filter splat (the beyond-reference film
capability the north star names): forward behavior of the triangle (tent)
filter against the box reference path, the custom VJP against finite
differences, and the Film "filter" plumbing.

Reference anchor: the reference film is box-only (film.rs:4-19); the splat
path (ops/film.py:filter_splat + triangle_taps) is selected by
`Film "string filter" ["triangle"]`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from curry_pbrt_tpu.ops import film as F
from curry_pbrt_tpu.render import plan_render, _render_chunk_splat
from curry_pbrt_tpu.sceneio.compiler import compile_scene_string
from curry_pbrt_tpu.render import render_scene

SCENE_T = """
Film "image" "integer xresolution" [16] "integer yresolution" [16]{filt}
Sampler "halton" "integer pixelsamples" [8]
Camera "perspective" "float fov" [40]
Integrator "path" "integer maxdepth" [2]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [6 6 6]
  Shape "trianglemesh" "integer indices" [0 1 2 2 3 0]
    "point P" [-2 2.8 1   2 2.8 1   2 2.8 5   -2 2.8 5]
AttributeEnd
Material "matte" "rgb Kd" [0.5 0.4 0.3]
Shape "trianglemesh" "integer indices" [0 1 2 2 3 0]
  "point P" [-3 -1 0   3 -1 0   3 -1 6   -3 -1 6]
WorldEnd
"""


def _scene(filt=None, **ov):
    f = f'\n  "string filter" ["{filt}"]' if filt else ""
    return compile_scene_string(SCENE_T.format(filt=f),
                                overrides={"clip": False, **ov})


# ---------------------------------------------------------------------------
# unit: filter_splat forward + custom VJP


class TestFilterSplat:
    def test_forward_matches_numpy_scatter(self):
        rng = np.random.default_rng(0)
        M, P = 64, 16
        rad = rng.random((M, 3)).astype(np.float32)
        ids = rng.integers(0, P, (M,)).astype(np.int32)
        w = rng.random((M,)).astype(np.float32)
        film, wsum = F.filter_splat(jnp.asarray(rad), jnp.asarray(ids),
                                    jnp.asarray(w), P)
        ref_f = np.zeros((P, 3), np.float32)
        ref_w = np.zeros((P,), np.float32)
        for i in range(M):
            ref_f[ids[i]] += rad[i] * w[i]
            ref_w[ids[i]] += w[i]
        np.testing.assert_allclose(np.asarray(film), ref_f, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(wsum), ref_w, rtol=1e-5)

    def test_vjp_matches_finite_difference(self):
        rng = np.random.default_rng(1)
        M, P = 32, 8
        rad = jnp.asarray(rng.random((M, 3)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, P, (M,)), jnp.int32)
        w = jnp.asarray(rng.random((M,)), jnp.float32)
        g_out = jnp.asarray(rng.random((P, 3)), jnp.float32)

        def loss(r):
            film, wsum = F.filter_splat(r, ids, w, P)
            return jnp.sum(film * g_out) + 0.0 * jnp.sum(wsum)

        g = jax.grad(loss)(rad)
        eps = 1e-3
        for i, c in ((3, 0), (17, 2), (31, 1)):
            dr = np.zeros((M, 3), np.float32)
            dr[i, c] = eps
            fd = (float(loss(rad + dr)) - float(loss(rad - dr))) / (2 * eps)
            np.testing.assert_allclose(float(g[i, c]), fd, rtol=1e-2, atol=1e-4)

    def test_triangle_taps_weights(self):
        # one sample at (3.25, 5.75) on a 8x8 film: bilinear weights
        xy = jnp.asarray([[3.25, 5.75]], jnp.float32)
        rad = jnp.ones((1, 3), jnp.float32)
        r4, ids, w = F.triangle_taps(xy, rad, 8, 8)
        got = {int(i): float(x) for i, x in zip(ids, w)}
        exp = {5 * 8 + 3: 0.75 * 0.25, 5 * 8 + 4: 0.25 * 0.25,
               6 * 8 + 3: 0.75 * 0.75, 6 * 8 + 4: 0.25 * 0.75}
        for pid, wexp in exp.items():
            np.testing.assert_allclose(got[pid], wexp, rtol=1e-5)
        np.testing.assert_allclose(float(jnp.sum(w)), 1.0, rtol=1e-5)

    def test_taps_off_film_and_nan_dropped(self):
        xy = jnp.asarray([[-0.4, 0.0], [3.0, 3.0]], jnp.float32)
        rad = jnp.asarray([[1.0, 1, 1], [np.nan, 1, 1]], jnp.float32)
        _r4, ids, w = F.triangle_taps(xy, rad, 8, 8)
        w = np.asarray(w).reshape(4, 2)
        ids = np.asarray(ids).reshape(4, 2)
        # sample 0: the x=-1 taps are off-film (weight 0); x=0 taps live
        np.testing.assert_allclose(w[:, 0].sum(), 0.6, rtol=1e-5)
        # NaN sample contributes nothing anywhere
        assert w[:, 1].sum() == 0.0


# ---------------------------------------------------------------------------
# integration: Film "filter" plumbing + forward + gradients


class TestTriangleFilterRender:
    def test_parse_and_default(self):
        assert _scene().settings.filter == "box"
        assert _scene("triangle").settings.filter == "triangle"
        with pytest.raises(ValueError, match="unsupported film filter"):
            _scene("gaussian")

    def test_forward_close_to_box_and_deterministic(self):
        box = render_scene(_scene(), show_progress=False)
        tri = render_scene(_scene("triangle"), show_progress=False)
        tri2 = render_scene(_scene("triangle"), show_progress=False)
        np.testing.assert_array_equal(tri, tri2)
        assert not np.isnan(tri).any()
        # tent filtering preserves energy on smooth content and blurs edges
        np.testing.assert_allclose(tri.mean(), box.mean(), rtol=0.03)
        assert np.abs(tri - box).max() < 0.5
        # it must actually DO something (not silently fall back to box)
        assert np.abs(tri - box).max() > 1e-4

    def test_chunked_splat_matches_single_chunk(self):
        """Footprints crossing chunk edges must accumulate correctly: a
        4-chunk render equals the 1-chunk render exactly (same samples,
        same taps, only the scatter grouping differs)."""
        one = render_scene(_scene("triangle"), chunk_pixels=256,
                           show_progress=False)
        four = render_scene(_scene("triangle"), chunk_pixels=64,
                            show_progress=False)
        np.testing.assert_allclose(four, one, rtol=1e-5, atol=1e-6)

    def test_gradient_through_splat_matches_fd(self):
        """jax.grad of a filtered-film loss w.r.t. emission L vs central
        finite differences — the custom VJP end-to-end (BASELINE config-4
        metric through the non-box film)."""
        scene = _scene("triangle")
        plan = plan_render(scene, chunk_pixels=256)
        xres, yres = scene.settings.resolution
        n_pixels = xres * yres
        ys, xs = np.mgrid[0:yres, 0:xres]
        px = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32))
        po = jnp.asarray(plan.pixel_offsets.reshape(-1))

        def loss(params):
            film, wsum, _ = _render_chunk_splat(plan, params, po, px, n_pixels)
            img = F.normalize_splat(film, wsum)
            return jnp.sum(img)

        params = scene.init_params
        g = jax.jit(jax.grad(loss))(params)
        g_L = np.asarray(g["light_L"])
        assert g_L.shape[0] == scene.n_lights
        jl = jax.jit(loss)
        eps = 1e-3

        def perturbed(row, ch, sign):
            arr = np.asarray(params["light_L"]).copy()
            arr[row, ch] += sign * eps
            return dict(params, light_L=jnp.asarray(arr))

        for row in range(g_L.shape[0]):
            for ch in range(3):
                fd = (float(jl(perturbed(row, ch, +1)))
                      - float(jl(perturbed(row, ch, -1)))) / (2 * eps)
                assert fd != 0.0
                np.testing.assert_allclose(g_L[row, ch], fd, rtol=2e-2)
