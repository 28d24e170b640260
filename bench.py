#!/usr/bin/env python
"""Benchmark suite. Prints ONE JSON line; headline fields first:

  {"metric": "rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": R, "timing": {...}, "configs": {...}}

Headline (BASELINE config 3): textured Cornell 512², 64 spp, depth-5 path
trace. rays/sec/chip = total traced path segments (camera + bounce
closest-hits + NEE shadow + NEE MIS rays over active lanes) ÷ wall time ÷
chips, fixed seeds.

Timing methodology (recorded in the JSON): one warm-up pass (compile
excluded), then PASSES timed passes, MEDIAN reported — the reference for
vs_baseline (baseline_cpu.json) is captured with the *same* protocol via
`python bench.py --capture-cpu-baseline` (spawns a CPU-backend subprocess;
cached with provenance). The reference renderer is CPU-only with no
published numbers (/root/reference/readme.md), so the CPU timing of this
same renderer stands in for it.

Secondary configs (recorded alongside, not the headline metric):
  config 2  spheres.pbrt 256², 16 spp, directlighting (camera-rays/s)
  config 5  mesh10k.pbrt 512², 16 spp, depth 8, cluster-culled Pallas
            (camera-rays/s; full config-5 resolution is sized down so a
            bench pass stays O(10 s) — rays/s is what's being measured)
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPO = Path(__file__).resolve().parent
BASELINE_CACHE = REPO / "baseline_cpu.json"

HEADLINE = dict(scene="cornell_tex.pbrt", res=512, spp=64, depth=5)
PASSES = 5


def _build(scene, res, spp, depth, integrator=None, intersector=None):
    import jax
    import jax.numpy as jnp
    from curry_pbrt_tpu.sceneio.compiler import compile_scene_file
    from curry_pbrt_tpu.render import (
        plan_render,
        _render_chunk_stats,
        _chunked_pixel_arrays,
    )

    overrides = {"resolution": (res, res) if isinstance(res, int) else res,
                 "spp": spp, "max_depth": depth}
    if integrator:
        overrides["integrator"] = integrator
    sc = compile_scene_file(REPO / "scenes" / scene, overrides=overrides)
    plan = plan_render(sc, intersector=intersector)
    po_np, px_np, _ = _chunked_pixel_arrays(plan)
    params = sc.init_params

    def render_all(params, po, px):
        imgs, segs = jax.lax.map(
            lambda c: _render_chunk_stats(plan, params, c[0], c[1]), (po, px)
        )
        return jnp.sum(imgs), jnp.sum(segs)

    fn = jax.jit(render_all)
    po, px = jnp.asarray(po_np), jnp.asarray(px_np)
    return fn, params, po, px, sc


def run_config(scene, res, spp, depth, integrator=None, intersector=None):
    """→ dict with wall (median), segments, rays/s."""
    fn, params, po, px, sc = _build(scene, res, spp, depth, integrator, intersector)
    # warm-up: compile + one full pass (block via scalar fetch — the axon
    # backend's block_until_ready doesn't reliably block)
    s, seg = fn(params, po, px)
    float(s)
    walls = []
    for _ in range(PASSES):
        t0 = time.time()
        s, seg = fn(params, po, px)
        checksum, segments = float(s), float(seg)
        walls.append(time.time() - t0)
    wall = statistics.median(walls)
    xres, yres = sc.settings.resolution
    camera_rays = xres * yres * sc.settings.spp
    out = {
        "wall_s": round(wall, 4),
        "walls_s": [round(w, 4) for w in walls],
        "camera_rays": camera_rays,
        "camera_rays_per_sec": round(camera_rays / wall, 1),
        "checksum": round(checksum, 1),
    }
    if segments > 0:
        out["segments"] = segments
        out["rays_per_sec"] = round(segments / wall, 1)
    return out


def _run_config_isolated(scene, res, spp, depth, integrator=None,
                         intersector=None, retries=1):
    """run_config in a subprocess (worker-crash isolation), with retry."""
    kw = dict(scene=scene, res=res, spp=spp, depth=depth,
              integrator=integrator, intersector=intersector)
    code = (
        "import json, sys;"
        f"sys.path.insert(0, {str(REPO)!r});"
        "from bench import run_config;"
        f"print('RESULT ' + json.dumps(run_config(**{kw!r})))"
    )
    last = None
    for _ in range(retries + 1):
        res_p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            cwd=REPO, timeout=1800,
        )
        lines = [l for l in res_p.stdout.splitlines() if l.startswith("RESULT ")]
        if lines:
            return json.loads(lines[0][len("RESULT "):])
        last = (res_p.stdout + res_p.stderr)[-300:]
    return {"error": last}


def capture_cpu_baseline():
    """Run the headline config on the CPU backend in a subprocess and cache
    the result with provenance (same renderer, same protocol)."""
    code = (
        "import os, json, sys;"
        f"sys.path.insert(0, {str(REPO)!r});"
        # the axon plugin ignores JAX_PLATFORMS; config update before backend
        # init is what forces CPU (see tests/conftest.py)
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from bench import run_config, HEADLINE;"
        "print('CPU_RESULT ' + json.dumps(run_config(**HEADLINE)))"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    line = [l for l in res.stdout.splitlines() if l.startswith("CPU_RESULT ")]
    if not line:
        sys.stderr.write(res.stdout + res.stderr)
        raise SystemExit("CPU baseline run failed")
    data = json.loads(line[0][len("CPU_RESULT "):])
    import platform

    payload = {
        "rays_per_sec": data["rays_per_sec"],
        "detail": data,
        "provenance": {
            "backend": "cpu (XLA, all host cores)",
            "host": platform.node(),
            "cpu_count": os.cpu_count(),
            "config": HEADLINE,
            "protocol": f"1 warm-up + {PASSES} passes, median",
            "captured_unix": int(time.time()),
        },
    }
    BASELINE_CACHE.write_text(json.dumps(payload, indent=1))
    print(f"wrote {BASELINE_CACHE}: {data['rays_per_sec']:.0f} rays/s", file=sys.stderr)
    return payload


def cpu_baseline():
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())["rays_per_sec"]
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capture-cpu-baseline", action="store_true")
    ap.add_argument("--skip-secondary", action="store_true",
                    help="headline config only")
    args = ap.parse_args()

    if args.capture_cpu_baseline:
        capture_cpu_baseline()
        return

    head = run_config(**HEADLINE)
    base = cpu_baseline()
    rps = head["rays_per_sec"]

    configs = {"cornell_tex_512_headline": head}
    if not args.skip_secondary:
        # each secondary config runs in its OWN subprocess: the shared TPU
        # worker behind the axon tunnel occasionally crashes mid-run, which
        # would otherwise poison every subsequent config in this process;
        # one retry absorbs a flaky crash
        configs["spheres_direct_256"] = _run_config_isolated(
            "spheres.pbrt", 256, 16, 0, integrator="directlighting"
        )
        configs["mesh10k_512"] = _run_config_isolated(
            "mesh10k.pbrt", 512, 16, 8, intersector="pallas"
        )

    result = {
        "metric": "rays_per_sec_per_chip",
        "value": rps,
        "unit": "rays/s",
        "vs_baseline": round(rps / base, 3) if base else None,
        "timing": {
            "warmup_passes": 1,
            "timed_passes": PASSES,
            "aggregation": "median",
            "baseline_protocol": "identical (see baseline_cpu.json provenance)",
        },
        "configs": configs,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
