import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax
print("backend:", jax.default_backend(), flush=True)
from curry_pbrt_tpu.sceneio.compiler import compile_scene_file
from curry_pbrt_tpu.render import render_scene

scene = compile_scene_file("scenes/cornell.pbrt", overrides={"resolution": (128,128), "spp": 4, "max_depth": 2})
t0=time.time(); img = render_scene(scene, show_progress=False)
print("cornel 128x4 render %.2fs mean %.4f nan %d" % (time.time()-t0, img.mean(), np.isnan(img).sum()), flush=True)
np.save("/tmp/cornel128.npy", img)

scene = compile_scene_file("scenes/cornell.pbrt", overrides={"resolution": (512,512), "spp": 64, "max_depth": 5})
t0=time.time(); img = render_scene(scene, show_progress=False)
dt = time.time()-t0
print("cornel 512x64 render %.2fs mean %.4f" % (dt, img.mean()), flush=True)
np.save("/tmp/cornel512.npy", img)

import jax.numpy as jnp
from curry_pbrt_tpu.ops.film import to_srgb_u8
from curry_pbrt_tpu.utils.imageio import write_png
write_png("/tmp/cornel512.png", np.asarray(to_srgb_u8(jnp.asarray(img))))
write_png("/tmp/cornel128.png", np.asarray(to_srgb_u8(jnp.asarray(np.load("/tmp/cornel128.npy")))))
print("wrote pngs")
