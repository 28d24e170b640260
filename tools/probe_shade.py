#!/usr/bin/env python
"""Bisect the shade_eval cost on the bench scene: which piece of the
per-material loop costs 22ms/1M lanes?"""

import os, sys, time
from functools import partial
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp

from curry_pbrt_tpu.sceneio.compiler import compile_scene_file
from curry_pbrt_tpu.render import plan_render
from curry_pbrt_tpu.models import integrators as I
from curry_pbrt_tpu.ops import bsdf as B
from curry_pbrt_tpu.ops import math as m
from curry_pbrt_tpu.dtypes import Float


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3:9.3f} ms")


scene = compile_scene_file(
    REPO / "scenes" / "cornell.pbrt",
    overrides={"resolution": (512, 512), "spp": 64, "max_depth": 5},
)
plan = plan_render(scene)
ctx = plan.ctx
params = scene.init_params
N = 1 << 20
key = jax.random.PRNGKey(0)
wo_l = jax.random.normal(key, (N, 3), Float)
wo_l = wo_l / jnp.linalg.norm(wo_l, axis=-1, keepdims=True)
wi_l = jnp.roll(wo_l, 1, axis=0)
uv = jax.random.uniform(key, (N, 2), Float)
mat_ids = jax.random.randint(key, (N,), 0, 5).astype(jnp.int32)
u1 = jax.random.uniform(key, (N,), Float)

print("materials in ctx:", [(mt.kind, mt.mat_id, mt.lobe_plan) for mt in ctx.materials])

# 1. full shade_eval
timeit("shade_eval full", jax.jit(lambda p: I.shade_eval(ctx, mat_ids, uv, p, wo_l, wi_l)), params)

# 2. single matte bsdf_eval_pdf with pre-built lobes (const albedo)
alb = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5], Float), (N, 3))
lobe = B.Lobe("lambert_r", alb)
timeit("bsdf_eval_pdf 1 lambert", jax.jit(lambda wo, wi: B.bsdf_eval_pdf([lobe], wo, wi)), wo_l, wi_l)

# 3. make_lobes alone for each material
for mt in ctx.materials:
    timeit(
        f"make_lobes {mt.kind}#{mt.mat_id}",
        jax.jit(lambda p, mt=mt: [l.albedo for l in mt.make_lobes(uv, p, ctx.registry)]),
        params,
    )

# 4. masked accumulate (the where-chains) alone
def mask_chain(f_in):
    f = jnp.zeros((N, 3), Float)
    pdf = jnp.zeros((N,), Float)
    pres = jnp.zeros((N,), bool)
    for k in range(4):
        sel = mat_ids == k
        f = jnp.where(sel[:, None], f_in, f)
        pdf = jnp.where(sel, f_in[:, 0], pdf)
        pres = jnp.where(sel, True, pres)
    return f, pdf, pres

timeit("mask chain x4", jax.jit(mask_chain), alb)

# 5. shade_eval but with make_lobes hoisted (prebuilt lobes per material)
prebuilt = [(mt, mt.make_lobes(uv, params, ctx.registry)) for mt in ctx.materials]
prebuilt = [(mt, ls) for mt, ls in prebuilt if any(not l.is_delta for l in ls)]

def shade_eval_prebuilt(wo_l, wi_l):
    f = jnp.zeros((N, 3), Float)
    pdf = jnp.zeros((N,), Float)
    present = jnp.zeros((N,), bool)
    for mt, lobes in prebuilt:
        mf, mp, mpres = B.bsdf_eval_pdf(lobes, wo_l, wi_l)
        sel = mat_ids == mt.mat_id
        f = jnp.where(sel[:, None], mf, f)
        pdf = jnp.where(sel, mp, pdf)
        present = jnp.where(sel, mpres, present)
    return f, pdf, present

timeit("shade_eval prebuilt-lobes", jax.jit(shade_eval_prebuilt), wo_l, wi_l)

# 6. shade_sample_nondelta full
timeit(
    "shade_sample_nondelta full",
    jax.jit(lambda p: I.shade_sample_nondelta(ctx, mat_ids, uv, p, wo_l, u1, u1)),
    params,
)
