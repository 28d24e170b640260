import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
from curry_pbrt_tpu.sceneio.compiler import compile_scene_string
from curry_pbrt_tpu.render import render_scene
from tests.test_render_analytic import SPHERE_FURNACE
import jax
print("backend:", jax.default_backend())
scene = compile_scene_string(SPHERE_FURNACE)
img = render_scene(scene, show_progress=False)
print("furnace corner", img[0,0].mean(), "center", img[14:18,14:18].mean(), "(expect 1.0 / 0.6)")
