#!/usr/bin/env python
"""Sweep CURRY_SORT_MODE / CURRY_BLOCK_R / CURRY_CHUNK_RAYS on a mesh scene.
Each point runs in a subprocess (env vars are read at plan/make time; the
shared-TPU worker also occasionally dies mid-run). Prints one line per point.
"""

import itertools
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

SCENE = sys.argv[1] if len(sys.argv) > 1 else "mesh10k.pbrt"
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 512
SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 16
DEPTH = int(sys.argv[4]) if len(sys.argv) > 4 else 8

POINTS = [
    # (sort_mode, block_r, chunk_rays)
    ("cell_oct", None, None),
    ("oct_cell", None, None),
    ("cell", None, None),
    ("off", None, None),
    ("cell_oct", 512, None),
    ("cell_oct", 2048, None),
    ("cell_oct", None, 1 << 16),
    ("cell_oct", None, 1 << 17),
    ("cell_oct", 2048, 1 << 17),
]


def run_point(sort_mode, block_r, chunk):
    env = dict(os.environ)
    env["CURRY_SORT_MODE"] = sort_mode
    env.pop("CURRY_BLOCK_R", None)
    env.pop("CURRY_CHUNK_RAYS", None)
    if block_r:
        env["CURRY_BLOCK_R"] = str(block_r)
    if chunk:
        env["CURRY_CHUNK_RAYS"] = str(chunk)
    code = (
        "import json, sys;"
        f"sys.path.insert(0, {str(REPO)!r});"
        "import bench; bench.PASSES = 2;"
        f"r = bench.run_config({SCENE!r}, {RES}, {SPP}, {DEPTH}, intersector='pallas');"
        "print('RESULT ' + json.dumps(r))"
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO, env=env, timeout=1500)
    lines = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
    if not lines:
        return {"error": (p.stdout + p.stderr)[-200:]}
    return json.loads(lines[0][7:])


def main():
    for sort_mode, block_r, chunk in POINTS:
        r = run_point(sort_mode, block_r, chunk)
        tag = f"sort={sort_mode:<9} block_r={block_r or 'dflt':<5} chunk={chunk or 'dflt':<7}"
        if "error" in r:
            print(f"{tag} ERROR {r['error'][:120]}")
        else:
            print(f"{tag} wall={r['wall_s']:7.3f}s rays/s={r.get('rays_per_sec', 0):>12.0f} checksum={r['checksum']}")


if __name__ == "__main__":
    main()
