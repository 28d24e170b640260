import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax, jax.numpy as jnp
from curry_pbrt_tpu.sceneio.compiler import compile_scene_string
from curry_pbrt_tpu.render import make_shade_context
from curry_pbrt_tpu.models import integrators as I
from curry_pbrt_tpu.models import lights as LT
from curry_pbrt_tpu.ops.intersect import Hit
from tests.test_render_analytic import SPHERE_FURNACE

scene = compile_scene_string(SPHERE_FURNACE)
ctx = make_shade_context(scene)
params = scene.init_params

N = 4096
rng = np.random.RandomState(0)
# surface point: front of the sphere (center (0,0,4), r=1)
theta = np.arccos(rng.rand(N))          # points on the camera-facing cap
phi = rng.rand(N) * 2 * np.pi
nrm = np.stack([np.sin(theta)*np.cos(phi), np.sin(theta)*np.sin(phi), -np.cos(theta)], -1).astype(np.float32)
p = (np.array([0,0,4], np.float32) + nrm).astype(np.float32)
perr = np.full((N,3), 2e-6, np.float32) * np.abs(p)
uv = np.zeros((N,2), np.float32)
hit = Hit(jnp.full((N,),1.0), jnp.zeros((N,),jnp.int32), jnp.asarray(p), jnp.asarray(nrm), jnp.asarray(uv), jnp.asarray(perr))
mat_ids = jnp.zeros((N,), jnp.int32) + int(scene.materials[0].mat_id)
wo = jnp.asarray(nrm)  # toward the viewer (outward)
frame = I._shading_frame(jnp.asarray(nrm))
u = {k: jnp.asarray(rng.rand(N).astype(np.float32)) for k in
     ["light_pick","light_u","light_v","nee_u","nee_v","bsdf_bucket","bsdf_extra","rr"]}

def pieces(u):
    light_L = params["light_L"]
    lf = u["light_pick"] * jnp.float32(ctx.n_lights)
    light_idx = jnp.minimum(lf.astype(jnp.int32), ctx.n_lights - 1)
    ls = LT.sample_li(ctx.lights, ctx.env, light_L, light_idx, hit.p, hit.n, hit.p_error,
                      jnp.stack([u["light_u"], u["light_v"]], -1))
    occ = ctx.predicate(ls.vis_o, ls.vis_d, ls.vis_tmax)
    nee = I.uniform_sample_one_light(ctx, params, hit, mat_ids, wo, frame, u)
    return ls.wi, ls.pdf, ls.present, occ, nee

wi, pdf, pres, occ, nee = jax.jit(pieces)(u)
print("backend:", jax.default_backend())
occ = np.asarray(occ); wi = np.asarray(wi); nee = np.asarray(nee)
up = (wi * nrm).sum(-1)  # cos with surface normal
print("occluded frac:", occ.mean())
print("occluded frac among upper-hemisphere wi:", occ[up > 0.02].mean())
print("nee mean:", nee.mean(0))
print("nee zero frac:", (nee[:,0] == 0).mean(), " upper-zero frac:", (nee[up>0.02,0]==0).mean())
np.save("/tmp/probe_occ_%s.npy" % jax.default_backend(), np.stack([occ, up, nee[:,0]], -1))
