"""Multi-device sharding: image identical to single-device, grads psum'd.

Runs on the 8-virtual-CPU-device mesh (conftest XLA_FLAGS)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from curry_pbrt_tpu.render import plan_render, _render_chunk
from curry_pbrt_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_render,
    make_sharded_train_step,
)
from tests.test_render_analytic import AREA_LIGHT_VISIBLE, render_inline
from curry_pbrt_tpu.sceneio.compiler import compile_scene_string


@pytest.fixture(scope="module")
def small_scene():
    return compile_scene_string(AREA_LIGHT_VISIBLE, overrides={"spp": 2})


def chunk_inputs(scene, plan, n_pixels):
    xres, yres = scene.settings.resolution
    ys, xs = np.mgrid[0:yres, 0:xres]
    pix_xy = np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float32)[:n_pixels]
    offs = plan.pixel_offsets.reshape(-1)[:n_pixels]
    return jnp.asarray(offs), jnp.asarray(pix_xy)


class TestShardedRender:
    def test_matches_single_device(self, small_scene):
        assert len(jax.devices()) == 8, "conftest should provide 8 cpu devices"
        scene = small_scene
        plan = plan_render(scene, chunk_pixels=256)
        po, px = chunk_inputs(scene, plan, 256)
        single = _render_chunk(plan, scene.init_params, po, px)
        mesh = make_mesh(8)
        sharded = make_sharded_render(plan, mesh)(scene.init_params, po, px)
        np.testing.assert_allclose(
            np.asarray(single), np.asarray(sharded), rtol=1e-5, atol=1e-6
        )

    def test_device_count_invariance(self, small_scene):
        scene = small_scene
        plan = plan_render(scene, chunk_pixels=256)
        po, px = chunk_inputs(scene, plan, 256)
        r2 = make_sharded_render(plan, make_mesh(2))(scene.init_params, po, px)
        r8 = make_sharded_render(plan, make_mesh(8))(scene.init_params, po, px)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r8), rtol=1e-5, atol=1e-6)


class TestShardedTraining:
    def test_train_step_runs_and_reduces(self, small_scene):
        import optax

        scene = small_scene
        plan = plan_render(scene, chunk_pixels=256)
        po, px = chunk_inputs(scene, plan, 256)
        target = jnp.zeros((256, 3), jnp.float32)
        opt = optax.adam(1e-2)
        params = scene.init_params
        step = make_sharded_train_step(plan, make_mesh(8), opt)
        state = opt.init(params)
        p1, s1, loss1 = step(params, state, target, po, px)
        assert np.isfinite(float(loss1))
        # emission params should move toward zero target
        l0 = np.asarray(params["light_L"])
        l1 = np.asarray(p1["light_L"])
        assert not np.allclose(l0, l1)

    def test_gradient_matches_unsharded(self, small_scene):
        scene = small_scene
        plan = plan_render(scene, chunk_pixels=256)
        po, px = chunk_inputs(scene, plan, 256)
        target = jnp.full((256, 3), 0.5, jnp.float32)

        def loss_unsharded(p):
            img = _render_chunk(plan, p, po, px)
            return jnp.mean((img - target) ** 2)

        g_ref = jax.grad(loss_unsharded)(scene.init_params)

        from functools import partial
        from jax.sharding import PartitionSpec as P

        from jax import shard_map

        mesh = make_mesh(8)

        def device_loss(p, tgt, po_, px_):
            img = _render_chunk(plan, p, po_, px_)
            return jax.lax.pmean(jnp.mean((img - tgt) ** 2), "rays")

        fn = shard_map(
            device_loss, mesh=mesh,
            in_specs=(P(), P("rays"), P("rays"), P("rays")), out_specs=P(),
            check_vma=False,
        )
        g_shard = jax.grad(lambda p: fn(p, target, po, px))(scene.init_params)
        np.testing.assert_allclose(
            np.asarray(g_ref["light_L"]), np.asarray(g_shard["light_L"]),
            rtol=1e-4, atol=1e-7,
        )
