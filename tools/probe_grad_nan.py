import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from curry_pbrt_tpu.render import plan_render
from curry_pbrt_tpu.sceneio.compiler import compile_scene_string
from curry_pbrt_tpu.models import integrators as I
from curry_pbrt_tpu.models import lights as LT
from curry_pbrt_tpu.models.camera import generate_rays
from curry_pbrt_tpu.ops.halton import halton_indices, halton_sample_2d
from curry_pbrt_tpu.ops import math as m
from curry_pbrt_tpu.ops.intersect import offset_point_by_error
from curry_pbrt_tpu.dtypes import FLOAT_MAX, Float
from tests.test_grad import SCENE

scene = compile_scene_string(SCENE, overrides={"clip": False})
plan = plan_render(scene, chunk_pixels=64)
ctx = plan.ctx
xres, yres = scene.settings.resolution
ys, xs = np.mgrid[0:yres, 0:xres]
px = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32))
po = jnp.asarray(plan.pixel_offsets.reshape(-1))
spp = scene.settings.spp
C = po.shape[0]

def setup(params):
    offs = jnp.repeat(po, spp)
    sidx = jnp.tile(jnp.arange(spp, dtype=jnp.uint32), (C,))
    idx = halton_indices(offs, sidx, plan.cfg)
    jitter = halton_sample_2d(idx, 0, plan.cfg, plan.perms) - 0.5
    xy = jnp.repeat(px, spp, axis=0) + jitter
    o, d = generate_rays(scene.camera, xy, None)
    return o, d, idx

params = scene.init_params

def stage_loss(stage):
    def loss(params):
        o, d, idx = setup(params)
        N = o.shape[0]
        hit = ctx.intersect(o, d, jnp.full((N,), FLOAT_MAX))
        hit_light = jnp.take(ctx.prim_light, jnp.maximum(hit.prim, 0))
        hit_light = jnp.where(hit.prim >= 0, hit_light, -1)
        le = LT.le_emitted(params["light_L"], hit_light)
        if stage == "emit":
            return jnp.sum(le)
        mat_ids = jnp.take(ctx.prim_mat, jnp.maximum(hit.prim, 0))
        mat_ids = jnp.where(hit.prim >= 0, mat_ids, -1)
        frame = I._shading_frame(hit.n)
        wo = -d
        u = I._sampler_dict(idx, plan.dim_base, plan.cfg, plan.perms)
        if stage == "shade_eval":
            fx, fy, fz = frame
            wo_l = m.to_local(wo, fx, fy, fz)
            wi_l = m.to_local(m.normalize(jnp.asarray([[0.1,0.8,0.2]])*jnp.ones_like(wo)), fx, fy, fz)
            f, pdf, pres = I.shade_eval(ctx, mat_ids, hit.uv, params, wo_l, wi_l)
            return jnp.sum(jnp.where(pres[:,None], f, 0.0))
        if stage == "light_sample":
            lf = u["light_pick"] * Float(ctx.n_lights)
            light_idx = jnp.minimum(lf.astype(jnp.int32), ctx.n_lights - 1)
            ls = LT.sample_li(ctx.lights, ctx.env, params["light_L"], light_idx,
                              hit.p, hit.n, hit.p_error,
                              jnp.stack([u["light_u"], u["light_v"]], -1))
            return jnp.sum(jnp.where(ls.present[:,None], ls.li, 0.0) / jnp.where(ls.pdf==0,1.0,ls.pdf)[:,None])
        if stage == "nee":
            nee = I.uniform_sample_one_light(ctx, params, hit, mat_ids, wo, frame, u)
            active = hit.valid & (mat_ids >= 0)
            return jnp.sum(jnp.where(active[:,None], nee, 0.0))
        if stage == "bsdf_sample":
            fx, fy, fz = frame
            wo_l = m.to_local(wo, fx, fy, fz)
            wi_l, f, pdf, pres, is_delta = I.shade_sample(ctx, mat_ids, hit.uv, params, wo_l,
                                                          u["bsdf_bucket"], u["bsdf_extra"])
            safe = jnp.where(pdf==0,1.0,pdf)
            thr = f * (jnp.abs(wi_l[:,2]) / safe)[:,None]
            return jnp.sum(jnp.where(pres[:,None], thr, 0.0))
        raise ValueError(stage)
    return loss

for stage in ["emit", "shade_eval", "light_sample", "nee", "bsdf_sample"]:
    g = jax.jit(jax.grad(stage_loss(stage)))(params)
    gl = np.asarray(g["light_L"])
    mk = next(iter(g["materials"]))
    gm = np.asarray(g["materials"][mk].get("Kd", jnp.zeros(3)))
    print(stage, "light_L nan:", np.isnan(gl).any(), "Kd nan:", np.isnan(gm).any(),
          "light_L:", gl.ravel()[:3], "Kd:", gm.ravel()[:3], flush=True)
