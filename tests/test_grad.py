"""Differentiable rendering: pixel gradients vs finite differences
(BASELINE.json config 4: grad allclose for albedo / emission / texture),
plus an end-to-end inverse-rendering optimization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from curry_pbrt_tpu.render import plan_render, _render_chunk
from curry_pbrt_tpu.sceneio.compiler import compile_scene_string

SCENE = """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
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


@pytest.fixture(scope="module")
def setup():
    scene = compile_scene_string(SCENE, overrides={"clip": False})
    plan = plan_render(scene, chunk_pixels=64)
    xres, yres = scene.settings.resolution
    ys, xs = np.mgrid[0:yres, 0:xres]
    px = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32))
    po = jnp.asarray(plan.pixel_offsets.reshape(-1))
    return scene, plan, po, px


def loss_of(plan, po, px):
    def loss(params):
        img = _render_chunk(plan, params, po, px)
        return jnp.sum(img)

    return loss


def fd_grad(loss, params, path, idx, eps=1e-3):
    """Central finite difference of one scalar leaf entry."""

    def perturb(sign):
        p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
        leaf = p
        for k in path[:-1]:
            leaf = leaf[k]
        arr = np.asarray(leaf[path[-1]]).copy()
        flat = arr.reshape(-1)
        flat[idx] += sign * eps
        leaf[path[-1]] = jnp.asarray(arr)
        return p

    return (float(loss(perturb(+1))) - float(loss(perturb(-1)))) / (2 * eps)


class TestGradients:
    def test_albedo_gradient_matches_fd(self, setup):
        scene, plan, po, px = setup
        loss = jax.jit(loss_of(plan, po, px))
        params = scene.init_params
        g = jax.jit(jax.grad(loss_of(plan, po, px)))(params)
        mat_key = next(iter(g["materials"]))
        g_kd = np.asarray(g["materials"][mat_key]["Kd"])
        assert g_kd.shape == (3,)
        for ch in range(3):
            fd = fd_grad(loss, scene.init_params, ("materials", mat_key, "Kd"), ch)
            assert fd != 0.0
            np.testing.assert_allclose(g_kd[ch], fd, rtol=2e-2), (ch, g_kd[ch], fd)

    def test_emission_gradient_matches_fd(self, setup):
        scene, plan, po, px = setup
        loss = jax.jit(loss_of(plan, po, px))
        g = jax.jit(jax.grad(loss_of(plan, po, px)))(scene.init_params)
        g_L = np.asarray(g["light_L"])
        # both area-light triangles share one L row each
        for li in range(g_L.shape[0]):
            fd = fd_grad(loss, scene.init_params, ("light_L",), 3 * li, eps=1e-2)
            np.testing.assert_allclose(g_L[li, 0], fd, rtol=2e-2)

    def test_emission_gradient_positive(self, setup):
        # more light → more pixels lit: dLoss/dL > 0
        scene, plan, po, px = setup
        g = jax.jit(jax.grad(loss_of(plan, po, px)))(scene.init_params)
        assert np.all(np.asarray(g["light_L"]) >= 0)
        assert np.asarray(g["light_L"]).sum() > 0


class TestInverseRendering:
    def test_optimize_albedo_recovers_target(self, setup):
        """Render a target with known albedo, re-optimize from a wrong
        initialization — albedo must converge toward the target (the
        config-4 inverse rendering task, scalar version)."""
        import optax

        scene, plan, po, px = setup
        target_params = scene.init_params
        target = _render_chunk(plan, target_params, po, px)

        params = jax.tree_util.tree_map(lambda x: x, target_params)
        mat_key = [
            k for k, v in params["materials"].items() if "Kd" in v
        ][0]
        params["materials"] = dict(params["materials"])
        params["materials"][mat_key] = dict(params["materials"][mat_key])
        params["materials"][mat_key]["Kd"] = jnp.asarray([0.9, 0.1, 0.6])

        def loss(p):
            img = _render_chunk(plan, p, po, px)
            return jnp.mean((img - target) ** 2)

        # optimize ONLY the albedo — emission is a known quantity in the
        # config-4 task; leaving light_L free makes the problem degenerate
        # (image ∝ L·albedo)
        def mask_fn(p):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: any(
                    getattr(k, "key", None) == "Kd" for k in path
                ),
                p,
            )

        opt = optax.masked(optax.adam(0.1), mask_fn)
        state = opt.init(params)
        step = jax.jit(
            lambda p, s: (lambda l, g: (l, *_apply(opt, p, s, g)))(
                *jax.value_and_grad(loss)(p)
            )
        )
        for _ in range(250):
            l, params, state = step(params, state)
        got = np.asarray(params["materials"][mat_key]["Kd"])
        np.testing.assert_allclose(got, [0.5, 0.4, 0.3], atol=0.01)
        assert float(l) < 1e-6


def _apply(opt, params, state, grads):
    import optax

    updates, state = opt.update(grads, state, params)
    return optax.apply_updates(params, updates), state


class TestGradientBackendEquivalence:
    def test_grad_matches_across_intersectors(self, setup):
        """Parameter gradients must be identical through every intersector
        backend: the TPU production path (pallas, here in interpret mode)
        detaches ray geometry inside the kernel wrapper
        (ops/pallas/aggregate.py:_detached), and a misplaced stop_gradient
        there would ship silently — brute is the oracle (VERDICT r4 item 3).
        """
        scene, _plan, po, px = setup

        grads = {}
        for backend in ("brute", "pallas", "bvh"):
            plan_b = plan_render(scene, intersector=backend, chunk_pixels=64)
            g = jax.jit(jax.grad(loss_of(plan_b, po, px)))(scene.init_params)
            mat_key = next(iter(g["materials"]))
            grads[backend] = (
                np.asarray(g["materials"][mat_key]["Kd"]),
                np.asarray(g["light_L"]),
            )
        for backend in ("pallas", "bvh"):
            for a, b in zip(grads["brute"], grads[backend]):
                np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-7), backend
        # and they are real gradients, not zeros
        assert np.abs(grads["brute"][0]).sum() > 0
        assert np.abs(grads["brute"][1]).sum() > 0
