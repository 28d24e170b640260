#!/usr/bin/env python
"""Sweep arbitrary CURRY_* env points on one bench config, serialized through
subprocesses (one TPU client at a time; env vars are read at plan time).

Usage:
  python tools/sweep_env.py SCENE RES SPP DEPTH 'JSON_ENV' ['JSON_ENV' ...]

Each JSON_ENV is a dict of env vars for one point, e.g.
  '{"CURRY_BLOCK_T": "32", "CURRY_SUBGROUPS": "8"}'
An empty dict is the current-defaults control point. Prints one line per
point (wall median of 2 passes, rays/s, checksum — checksums must match
across points or the point is flagged).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_point(scene, res, spp, depth, env_overrides, passes=2):
    env = {k: v for k, v in os.environ.items() if not k.startswith("CURRY_")}
    env.update(env_overrides)
    code = (
        "import json, sys;"
        f"sys.path.insert(0, {str(REPO)!r});"
        "import bench;"
        f"r = bench.run_config({scene!r}, {res}, {spp}, {depth},"
        f" intersector='pallas', passes={passes});"
        "print('RESULT ' + json.dumps(r))"
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO, env=env, timeout=1800)
    lines = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
    if not lines:
        return {"error": (p.stdout + p.stderr)[-300:]}
    return json.loads(lines[0][7:])


def main():
    scene, res, spp, depth = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    points = [json.loads(a) for a in sys.argv[5:]] or [{}]
    checks = set()
    for envp in points:
        r = run_point(scene, res, spp, depth, envp)
        tag = " ".join(f"{k.replace('CURRY_', '').lower()}={v}" for k, v in envp.items()) or "defaults"
        if "error" in r:
            print(f"{tag:<48} ERROR {r['error'][:160]}", flush=True)
            continue
        checks.add(r["checksum"])
        flag = "" if len(checks) == 1 else "  !! CHECKSUM DRIFT"
        print(f"{tag:<48} wall={r['wall_s']:7.3f}s rays/s={r.get('rays_per_sec', 0):>12.0f}"
              f" checksum={r['checksum']}{flag}", flush=True)


if __name__ == "__main__":
    main()
