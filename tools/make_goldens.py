#!/usr/bin/env python
"""(Re)generate the bit-exact golden images in tests/goldens/.

Renders each scene at 32² on the CPU backend (the deterministic test
platform — tests/conftest.py forces it) and stores raw float32 radiance as
.npy. tests/test_exact_golden.py asserts np.array_equal against these, so
ANY radiance change — sampler, shading, intersector, parser — trips the
gate (the r3 statistics thresholds would have passed a 30% regression).

Run me after an INTENTIONAL image-affecting change, commit the diff, and
say why in the commit message.
"""

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

# (name, scene path, overrides) — small spp/depth: goldens gate drift, not
# image quality. Reference scenes included (the reference's de-facto goldens,
# examples/render_from_file.rs:5-12).
REF_SCENES = Path("/root/reference/scenes")
CASES = [
    ("cornell", REPO / "scenes" / "cornell.pbrt", {}),
    ("cornell_tex", REPO / "scenes" / "cornell_tex.pbrt", {}),
    ("spheres", REPO / "scenes" / "spheres.pbrt", {}),
    ("mesh10k", REPO / "scenes" / "mesh10k.pbrt", {"max_depth": 4}),
    ("ref_cornel_box", REF_SCENES / "cornel_box.pbrt", {}),
    ("ref_sphere", REF_SCENES / "sphere.pbrt", {}),
]
BASE = {"resolution": (32, 32), "spp": 4, "max_depth": 3}


def render_case(path, overrides):
    from curry_pbrt_tpu.render import render_scene
    from curry_pbrt_tpu.sceneio.compiler import compile_scene_file

    ov = dict(BASE)
    ov.update(overrides)
    scene = compile_scene_file(path, overrides=ov)
    return render_scene(scene, show_progress=False).astype(np.float32)


def main():
    out_dir = REPO / "tests" / "goldens"
    out_dir.mkdir(exist_ok=True)
    for name, path, overrides in CASES:
        if not path.exists():
            print(f"SKIP {name}: {path} missing")
            continue
        img = render_case(path, overrides)
        np.save(out_dir / f"{name}.npy", img)
        print(f"wrote {name}.npy  mean={img.mean():.5f} max={img.max():.4f}")


if __name__ == "__main__":
    main()
