import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from curry_pbrt_tpu.render import plan_render, _render_chunk
from curry_pbrt_tpu.sceneio.compiler import compile_scene_string
from tests.test_grad import SCENE
import optax

scene = compile_scene_string(SCENE, overrides={"clip": False})
plan = plan_render(scene, chunk_pixels=64)
xres, yres = scene.settings.resolution
ys, xs = np.mgrid[0:yres, 0:xres]
px = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32))
po = jnp.asarray(plan.pixel_offsets.reshape(-1))
target_params = scene.init_params
target = _render_chunk(plan, target_params, po, px)

def loss(p):
    img = _render_chunk(plan, p, po, px)
    return jnp.mean((img - target) ** 2)

g0 = jax.jit(jax.grad(loss))(target_params)
mk = [k for k,v in target_params["materials"].items() if "Kd" in v][0]
print("grad at target Kd:", np.asarray(g0["materials"][mk]["Kd"]))
print("grad at target L:", np.asarray(g0["light_L"]))

# loss landscape along red albedo
import copy
for dv in [-0.1,-0.05,-0.02,0,0.02,0.05,0.1]:
    p = jax.tree_util.tree_map(lambda x: x, target_params)
    p["materials"] = dict(p["materials"]); p["materials"][mk]=dict(p["materials"][mk])
    kd = np.asarray(p["materials"][mk]["Kd"]).copy(); kd[0]+=dv
    p["materials"][mk]["Kd"]=jnp.asarray(kd)
    print("dv %+0.3f loss %.3e" % (dv, float(jax.jit(loss)(p))))

# optimize with cosine decay
params = jax.tree_util.tree_map(lambda x: x, target_params)
params["materials"] = dict(params["materials"]); params["materials"][mk]=dict(params["materials"][mk])
params["materials"][mk]["Kd"] = jnp.asarray([0.9,0.1,0.6])
sched = optax.cosine_decay_schedule(0.05, 300)
opt = optax.adam(sched)
state = opt.init(params)
@jax.jit
def step(p, s):
    l, g = jax.value_and_grad(loss)(p)
    u, s = opt.update(g, s, p)
    return optax.apply_updates(p, u), s, l
for i in range(300):
    params, state, l = step(params, state)
print("final Kd:", np.asarray(params["materials"][mk]["Kd"]), "loss", float(l))
