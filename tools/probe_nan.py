import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from curry_pbrt_tpu.sceneio.compiler import compile_scene_string
from curry_pbrt_tpu.render import plan_render
from curry_pbrt_tpu.models import integrators as I
from curry_pbrt_tpu.models.camera import generate_rays
from curry_pbrt_tpu.ops.halton import halton_indices, halton_sample_2d
from tests.test_render_analytic import SPHERE_FURNACE

scene = compile_scene_string(SPHERE_FURNACE)
plan = plan_render(scene)
spp = scene.settings.spp
C = 16
pix = np.array([[x,y] for y in range(14,18) for x in range(14,18)], np.float32)
offs = np.array([plan.pixel_offsets[int(y),int(x)] for x,y in pix], np.uint32)

def radiances(params, po, px):
    offs = jnp.repeat(po, spp)
    sidx = jnp.tile(jnp.arange(spp, dtype=jnp.uint32), (C,))
    idx = halton_indices(offs, sidx, plan.cfg)
    jitter = halton_sample_2d(idx, 0, plan.cfg, plan.perms) - 0.5
    xy = jnp.repeat(px, spp, axis=0) + jitter
    o, d = generate_rays(scene.camera, xy, None)
    return I.path_trace(plan.ctx, params, o, d, idx, plan.cfg, plan.perms,
                        scene.settings.max_depth, plan.dim_base)

r = jax.jit(radiances)(scene.init_params, jnp.asarray(offs), jnp.asarray(pix))
r = np.asarray(r)
print("samples:", r.shape, "nan count:", int(np.isnan(r).sum()), flush=True)
print("mean (nan-dropped):", float(np.nanmean(r[:,0])))
print("hist:", np.histogram(r[~np.isnan(r[:,0]),0], bins=8, range=(0,1.2))[0])
print("min/max:", float(np.nanmin(r)), float(np.nanmax(r)))
np.save("/tmp/tpu_rad.npy", r)
