#!/usr/bin/env python
"""Benchmark suite. Prints ONE JSON line; headline fields first:

  {"metric": "rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": R, "timing": {...}, "sol": {...}, "configs": {...}}

Headline (BASELINE config 3): textured Cornell 512², 64 spp, depth-5 path
trace. rays/sec/chip = total traced path segments (camera + bounce
closest-hits + NEE shadow + NEE MIS rays over active lanes) ÷ wall time ÷
chips, fixed seeds. Every config reports the same segments-based unit
(directlighting included — its NEE shadow + MIS rays count too).

Timing methodology (recorded in the JSON): one warm-up pass (compile
excluded), then PASSES timed passes, MEDIAN reported. vs_baseline ratios
compare against this same renderer on this host's CPU, captured with the
*same* per-config protocol via `python bench.py --capture-cpu-baseline`
(cached in baseline_cpu.json with provenance). The reference renderer is
CPU-only with no published numbers (/root/reference/readme.md), so the CPU
timing of this same renderer stands in for it.

Configs:
  cornell_tex_512_headline  BASELINE config 3 (the headline metric)
  spheres_direct_256        config 2: spheres.pbrt 256², 16 spp, directlighting
  mesh10k_512               config-5 workload at r3's bench size (512², 16
                            spp, depth 8) — kept for round-over-round
                            comparability
  mesh10k_1024_full         config 5 AS SPECIFIED: 1024², 256 spp, depth 8
                            (2 timed passes; VERDICT r4 item 7). vs_baseline
                            uses the mesh10k_512 CPU rate (same scene/unit;
                            a full-size CPU pass would take hours).
  mesh100k_512              hierarchy benchmark (1.6k clusters, 7 slabs)
  mesh600k_256              streamed-slab benchmark (620k tris — beyond the
                            r3 kernel's 500k VMEM error)
  spherefield10k_256        10k-sphere field through the sphere cluster
                            kernel (r5 — the dense path OOMs at this count)

The "sol" section merges roofline.json (tools/roofline.py --write): the
traversal kernel's achieved f32 throughput as a % of the assumed v5e VPU
peak, per scene (VERDICT r3 item 5).
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
ROOFLINE_CACHE = REPO / "roofline.json"

HEADLINE = dict(scene="cornell_tex.pbrt", res=512, spp=64, depth=5)
PASSES = 5

# secondary configs: name -> (run_config kwargs, timed passes, baseline key)
SECONDARY = {
    "spheres_direct_256": (
        dict(scene="spheres.pbrt", res=256, spp=16, depth=0,
             integrator="directlighting"),
        PASSES, "spheres_direct_256",
    ),
    "mesh10k_512": (
        dict(scene="mesh10k.pbrt", res=512, spp=16, depth=8,
             intersector="pallas"),
        PASSES, "mesh10k_512",
    ),
    "mesh100k_512": (
        dict(scene="mesh100k.pbrt", res=512, spp=16, depth=8,
             intersector="pallas"),
        2, "mesh100k_256r",  # CPU pass at 256²/4spp — same scene/depth,
        # same seg/s unit; full 512²/16spp would be ~75 min on this host
    ),
    "mesh600k_256": (
        dict(scene="mesh600k.pbrt", res=256, spp=4, depth=5,
             intersector="pallas"),
        2, "mesh600k_128r",  # CPU pass at 128²/2spp (same scene/depth/unit)
    ),
    "spherefield10k_256": (
        # 10k-sphere field through the sphere cluster kernel (r5; the dense
        # O(rays×spheres) path RESOURCE_EXHAUSTs at this count, so there is
        # no same-protocol CPU rate — this config is a capability +
        # regression gate, with probe ratios in PERF.md)
        dict(scene="spherefield10k.pbrt", res=256, spp=4, depth=3,
             intersector="pallas"),
        3, None,
    ),
    # LAST: ~12 minutes (warm group + two full passes) — if an external
    # timeout cuts the bench short, the cheap configs are already recorded
    "mesh10k_1024_full": (
        dict(scene="mesh10k.pbrt", res=1024, spp=256, depth=8,
             intersector="pallas"),
        2, "mesh10k_512",  # full-size CPU pass would take hours; same unit
    ),
}

# Bit-level TPU regression gate (VERDICT r4 item 8): expected per-config
# image checksums on the TPU backend. The renderer is seeded/deterministic,
# so any drift means a codegen or numerics change; the bench fails loudly
# (exit 2, `checksum_failures` in the JSON). After an INTENTIONAL numerics
# change (with its regenerated goldens + PERF.md entry), regenerate with
# CURRY_UPDATE_CHECKSUMS=1, which prints the new table instead of failing.
EXPECTED_TPU_CHECKSUMS = {
    "cornell_tex_512_headline": 86446.0,
    "spheres_direct_256": 60703.7,
    "mesh10k_512": 318225.1,
    "mesh100k_512": 319003.6,
    "mesh600k_256": 79705.3,
    "spherefield10k_256": 30907.0,
    "mesh10k_1024_full": 1273154.2,
}
CHECKSUM_ATOL = 0.05  # the stored values are rounded to 0.1

# configs captured on the CPU backend for vs_baseline ratios. The two *r
# entries are reduced-scale protocols for the big-mesh scenes (VERDICT r4
# item 4): identical scene/depth/intersector kwargs, reduced res/spp so a
# CPU pass is minutes, compared through the resolution-independent seg/s
# rate (the protocol mesh10k_1024_full already uses).
CPU_BASELINE_CONFIGS = {
    "headline": (HEADLINE, PASSES),
    "spheres_direct_256": (SECONDARY["spheres_direct_256"][0], PASSES),
    "mesh10k_512": (SECONDARY["mesh10k_512"][0], 1),  # ~2 min/pass on CPU
    "mesh100k_256r": (
        dict(scene="mesh100k.pbrt", res=256, spp=4, depth=8,
             intersector="pallas"),
        1,  # ~5 min/pass at 2.5k seg/s on this host
    ),
    "mesh600k_128r": (
        dict(scene="mesh600k.pbrt", res=128, spp=2, depth=5,
             intersector="pallas"),
        1,
    ),
}


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


MAX_CHUNKS_PER_DISPATCH = 512  # a single device execution beyond ~5 min
# reproducibly crashes the axon TPU worker (observed on mesh10k_1024_full:
# 8192 chunks ≈ 6.5 min in one lax.map); huge configs run as equal-size
# dispatch groups instead — same compiled fn, same per-chunk work


def run_config(scene, res, spp, depth, integrator=None, intersector=None,
               passes=None):
    """→ dict with wall (median), segments, rays/s."""
    passes = PASSES if passes is None else passes
    fn, params, po, px, sc = _build(scene, res, spp, depth, integrator, intersector)
    k = po.shape[0]
    if k > MAX_CHUNKS_PER_DISPATCH:
        # group size = the largest divisor of k within the dispatch cap, so
        # padding chunks never exist — a padding chunk would re-render pixel
        # (0,0) and its traced segments would self-inflate rays_per_sec
        # (advisor r4). Every shipped config has power-of-two k; a prime k
        # would degrade to g=1 (correct, just more dispatches).
        g = next(gg for gg in range(MAX_CHUNKS_PER_DISPATCH, 0, -1)
                 if k % gg == 0)
        n_groups = k // g
        groups = [(po[i * g:(i + 1) * g], px[i * g:(i + 1) * g])
                  for i in range(n_groups)]
    else:
        groups = [(po, px)]

    def full_pass():
        checksum = segments = 0.0
        for gpo, gpx in groups:
            s, seg = fn(params, gpo, gpx)
            checksum += float(s)
            segments += float(seg)
        return checksum, segments

    # warm-up: compile + warm pass (block via scalar fetch — the axon
    # backend's block_until_ready doesn't reliably block). Grouped configs
    # warm on the first group only: one group compiles + warms the same
    # executable the remaining groups reuse, and a full extra pass would
    # double the minutes-long mesh10k_1024_full run.
    if len(groups) > 1:
        s0, seg0 = fn(params, *groups[0])
        float(s0)
    else:
        full_pass()
    walls = []
    for _ in range(passes):
        t0 = time.time()
        checksum, segments = full_pass()
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


def _run_config_isolated(kwargs, passes, retries=1):
    """run_config in a subprocess (worker-crash isolation), with retry."""
    kw = dict(kwargs, passes=passes)
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
            cwd=REPO, timeout=3600,
        )
        lines = [l for l in res_p.stdout.splitlines() if l.startswith("RESULT ")]
        if lines:
            return json.loads(lines[0][len("RESULT "):])
        last = (res_p.stdout + res_p.stderr)[-300:]
    return {"error": last}


def capture_cpu_baseline(only_missing=True):
    """Run the baseline configs on the CPU backend in subprocesses and cache
    rates with provenance (same renderer, same per-config protocol).

    By default configs already present in the cache are kept as-is (the
    mesh10k pass alone is ~12 min); --recapture-cpu-baseline redoes all."""
    import platform

    entries = {}
    cached = cpu_baseline() or {}
    for name, (kw, passes) in CPU_BASELINE_CONFIGS.items():
        if only_missing and name in cached.get("configs", {}):
            entries[name] = cached["configs"][name]
            print(f"{name}: cached ({entries[name].get('rays_per_sec', 0):.0f} rays/s)",
                  file=sys.stderr)
            continue
        code = (
            "import os, json, sys;"
            f"sys.path.insert(0, {str(REPO)!r});"
            # the axon plugin ignores JAX_PLATFORMS; config update before
            # backend init is what forces CPU (see tests/conftest.py)
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "from bench import run_config;"
            f"print('CPU_RESULT ' + json.dumps(run_config(passes={passes}, **{kw!r})))"
        )
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
        )
        line = [l for l in res.stdout.splitlines() if l.startswith("CPU_RESULT ")]
        if not line:
            sys.stderr.write(res.stdout + res.stderr)
            raise SystemExit(f"CPU baseline run failed for {name}")
        data = json.loads(line[0][len("CPU_RESULT "):])
        entries[name] = {"rays_per_sec": data.get("rays_per_sec"), "detail": data,
                         "config": kw, "passes": passes,
                         "captured_unix": int(time.time())}
        print(f"{name}: {data.get('rays_per_sec', 0):.0f} rays/s (CPU)",
              file=sys.stderr)

    payload = {
        # legacy top-level field = headline rate (r3 compatibility)
        "rays_per_sec": entries["headline"]["rays_per_sec"],
        "configs": entries,
        "provenance": {
            "backend": "cpu (XLA, all host cores)",
            "host": platform.node(),
            "cpu_count": os.cpu_count(),
            "config": HEADLINE,
            "protocol": f"1 warm-up + per-config passes, median",
            "captured_unix": int(time.time()),
        },
    }
    BASELINE_CACHE.write_text(json.dumps(payload, indent=1))
    print(f"wrote {BASELINE_CACHE}", file=sys.stderr)
    return payload


def cpu_baseline():
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capture-cpu-baseline", action="store_true")
    ap.add_argument("--recapture-cpu-baseline", action="store_true",
                    help="redo every baseline config, ignoring the cache")
    ap.add_argument("--skip-secondary", action="store_true",
                    help="headline config only")
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the minutes-long mesh10k_1024_full config")
    args = ap.parse_args()

    if args.capture_cpu_baseline or args.recapture_cpu_baseline:
        capture_cpu_baseline(only_missing=not args.recapture_cpu_baseline)
        return

    head = run_config(**HEADLINE)
    base = cpu_baseline()
    base_cfgs = (base or {}).get("configs", {})

    def base_rate(key):
        if key is None:
            return None
        if key == "headline" or key in base_cfgs:
            e = base_cfgs.get(key)
            return e["rays_per_sec"] if e else (base or {}).get("rays_per_sec")
        return None

    rps = head["rays_per_sec"]
    head_base = base_rate("headline") or (base or {}).get("rays_per_sec")
    configs = {"cornell_tex_512_headline": head}
    if head_base:
        head["vs_baseline"] = round(rps / head_base, 2)

    if not args.skip_secondary:
        # each secondary config runs in its OWN subprocess: the shared TPU
        # worker behind the axon tunnel occasionally crashes mid-run, which
        # would otherwise poison every subsequent config in this process;
        # one retry absorbs a flaky crash
        for name, (kw, passes, bkey) in SECONDARY.items():
            if args.skip_full and name == "mesh10k_1024_full":
                continue
            r = _run_config_isolated(kw, passes)
            br = base_rate(bkey)
            if br and "rays_per_sec" in r:
                r["vs_baseline"] = round(r["rays_per_sec"] / br, 2)
                if bkey != name:
                    r["vs_baseline_note"] = f"vs CPU {bkey} rate (same scene/unit)"
            configs[name] = r

    result = {
        "metric": "rays_per_sec_per_chip",
        "value": rps,
        "unit": "rays/s",
        "vs_baseline": round(rps / head_base, 3) if head_base else None,
        "timing": {
            "warmup_passes": 1,
            "timed_passes": PASSES,
            "aggregation": "median",
            "baseline_protocol": "identical per config (see baseline_cpu.json)",
        },
        "configs": configs,
    }
    if ROOFLINE_CACHE.exists():
        roof = json.loads(ROOFLINE_CACHE.read_text())
        result["sol"] = {
            "vpu_peak_derivation": roof.get("vpu_peak_derivation"),
            "scenes": {
                k: {"sol_pct": v["sol_pct"],
                    "traversal_achieved_tflops": v["traversal_achieved_tflops"]}
                for k, v in roof.get("scenes", {}).items()
            },
        }

    # bit-level TPU regression gate (see EXPECTED_TPU_CHECKSUMS)
    import jax

    if jax.default_backend() == "tpu":
        failures = {}
        for name, cfg in configs.items():
            exp = EXPECTED_TPU_CHECKSUMS.get(name)
            got = cfg.get("checksum")
            if exp is not None and got is not None and abs(got - exp) > CHECKSUM_ATOL:
                failures[name] = {"expected": exp, "got": got}
        if failures and os.environ.get("CURRY_UPDATE_CHECKSUMS") == "1":
            new = {n: c["checksum"] for n, c in configs.items() if "checksum" in c}
            print(f"EXPECTED_TPU_CHECKSUMS = {json.dumps(new, indent=4)}",
                  file=sys.stderr)
        elif failures:
            result["checksum_failures"] = failures
            print(json.dumps(result))
            print(f"CHECKSUM MISMATCH (TPU regression gate): {failures} — "
                  "if intentional, regenerate with CURRY_UPDATE_CHECKSUMS=1",
                  file=sys.stderr)
            raise SystemExit(2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
