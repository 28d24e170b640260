#!/usr/bin/env python
"""Generate the large-mesh benchmark scenes: a bumpy torus (exactly
2·nu·nv triangles) as binary PLY + a pbrt scene with a ground plane and a
quad area light.

  (no arg)  scenes/mesh10k.pbrt  + torus10k.ply  (BASELINE config 5)
  100k      scenes/mesh100k.pbrt + torus100k.ply (hierarchy benchmark)
  600k      scenes/mesh600k.pbrt + torus600k.ply (streamed-slab benchmark —
            the r3 kernel errored beyond 500k VMEM-resident tris)

Deterministic — safe to regenerate.
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from curry_pbrt_tpu.sceneio.ply import write_ply  # noqa: E402


def bumpy_torus(nu=100, nv=50, R=1.0, r=0.42, bump=0.08):
    iu = np.arange(nu)
    iv = np.arange(nv)
    uu, vv = np.meshgrid(iu, iv, indexing="ij")  # (nu, nv)
    theta = 2 * np.pi * uu / nu
    phi = 2 * np.pi * vv / nv
    rr = r * (1.0 + bump * np.sin(7 * theta) * np.cos(5 * phi))
    x = (R + rr * np.cos(phi)) * np.cos(theta)
    y = rr * np.sin(phi)
    z = (R + rr * np.cos(phi)) * np.sin(theta)
    verts = np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float32)

    def vid(i, j):
        return (i % nu) * nv + (j % nv)

    idx = []
    for i in range(nu):
        for j in range(nv):
            a, b, c, d = vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)
            idx.extend((a, b, c))
            idx.extend((a, c, d))
    return np.asarray(idx, np.int32), verts


SCENE = """\
# {label} benchmark scene: {ntris}-triangle mesh over a ground plane
LookAt 0 1.6 -3.4   0 0.1 0   0 1 0
Camera "perspective" "float fov" [42]
Sampler "halton" "integer pixelsamples" [16]
Film "image" "integer xresolution" [512] "integer yresolution" [512]
    "string filename" ["{name}.png"]
Integrator "path" "integer maxdepth" [8]

WorldBegin

AttributeBegin
  AreaLightSource "diffuse" "rgb L" [14 13 11]
  Shape "trianglemesh" "integer indices" [0 1 2 2 3 0]
    "point P" [-1.2 2.4 -1.2   1.2 2.4 -1.2   1.2 2.4 1.2   -1.2 2.4 1.2]
AttributeEnd

Material "matte" "rgb Kd" [0.72 0.72 0.70]
Shape "trianglemesh" "integer indices" [0 1 2 2 3 0]
  "point P" [-8 -0.55 -8   8 -0.55 -8   8 -0.55 8   -8 -0.55 8]

Material "plastic" "rgb Kd" [0.30 0.42 0.62] "rgb Ks" [0.35 0.35 0.35]
    "float roughness" [0.08]
AttributeBegin
  Rotate 28 0 1 0
  Shape "plymesh" "string filename" ["torus{size}.ply"]
AttributeEnd

WorldEnd
"""

SIZES = {
    # size tag → (nu, nv); tris = 2*nu*nv
    "10k": (100, 50, "config-5"),
    "100k": (320, 160, "hierarchy"),
    "600k": (775, 400, "streamed-slab"),
}


def main():
    tags = sys.argv[1:] or ["10k"]
    for tag in tags:
        nu, nv, label = SIZES[tag]
        idx, verts = bumpy_torus(nu=nu, nv=nv)
        name = f"mesh{tag}"
        out = REPO / "scenes" / f"torus{tag}.ply"
        write_ply(out, idx, verts)
        (REPO / "scenes" / f"{name}.pbrt").write_text(
            SCENE.format(label=label, ntris=len(idx) // 3, name=name, size=tag)
        )
        print(f"wrote {out} ({len(idx)//3} tris, {len(verts)} verts) + {name}.pbrt")


if __name__ == "__main__":
    main()
