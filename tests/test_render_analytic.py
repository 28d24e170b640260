"""End-to-end analytic golden tests: scenes with closed-form answers.

These are the oracle layer: instead of diffing against the (nondeterministic)
reference binary, we verify radiometry against physics — point-light falloff,
white-furnace closure, emitter radiance — which the reference implements the
same math for.
"""

import numpy as np
import pytest

from curry_pbrt_tpu.sceneio.compiler import compile_scene_string
from curry_pbrt_tpu.render import render_scene


def render_inline(text, **overrides):
    """clip=False disables the camera frustum clipper, which (like the
    reference, perspective.rs:54-78) culls any non-emissive primitive whose
    bound corners are ALL off-screen — even one spanning the screen."""
    scene = compile_scene_string(text, overrides=overrides)
    return render_scene(scene, show_progress=False), scene


SPHERE_FURNACE = """
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "halton" "integer pixelsamples" [64]
Camera "perspective" "float fov" [30]
Integrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "infinite"
Material "matte" "rgb Kd" [0.6 0.6 0.6]
AttributeBegin
  Translate 0 0 4
  Shape "sphere" "float radius" [1.0]
AttributeEnd
WorldEnd
"""


class TestFurnace:
    def test_white_furnace_sphere(self):
        """Lambertian sphere under a constant unit environment: every sphere
        pixel ≈ albedo (single bounce suffices — convex body), background = 1."""
        img, scene = render_inline(SPHERE_FURNACE)
        # corners see pure env
        assert abs(img[0, 0].mean() - 1.0) < 1e-3
        # center sees the sphere: reflected = albedo × env = 0.6
        center = img[14:18, 14:18].mean()
        assert abs(center - 0.6) < 0.03, center
        assert not np.isnan(img).any()


POINT_LIGHT_PLANE = """
Film "image" "integer xresolution" [33] "integer yresolution" [33]
Sampler "halton" "integer pixelsamples" [16]
Camera "perspective" "float fov" [40]
Integrator "path" "integer maxdepth" [1]
WorldBegin
AttributeBegin
  Translate 0 0 1
  LightSource "point" "rgb I" [4 4 4]
AttributeEnd
Material "matte" "rgb Kd" [0.5 0.5 0.5]
Shape "trianglemesh" "integer indices" [0 1 2 2 3 0]
  "point P" [-50 -50 2   50 -50 2   50 50 2   -50 50 2]
WorldEnd
"""


class TestPointLight:
    def test_inverse_square_lambert(self):
        """Plane z=2 viewed down +z, point light I=4 at z=1 on the axis. At
        the plane point directly under the light: L = I/d² · kd/π · cosθ
        with d=1, cos=1 → 4·0.5/π ≈ 0.6366."""
        img, scene = render_inline(POINT_LIGHT_PLANE, clip=False)
        expect = 4.0 * 0.5 / np.pi
        center = img[16, 16].mean()
        assert abs(center - expect) < 0.02 * expect, (center, expect)
        # off-axis point: light at distance² = 1 + r², cos³ falloff
        # pixel (16,16) is the optical axis for a 33-wide image (center 16.0
        # in continuous raster coords maps through x_ndc=0). Take a known
        # world offset: at 45° from the light's foot, r=1 → d²=2, cos=1/√2
        # → L = I·cos/(d²)·kd/π = 4·(1/√2)/2·0.5/π ≈ 0.2251
        # find the pixel: world x=1,z=2 projects to raster via the camera:
        # tan(20°)·2 = half-width at z=2 ≈ 0.728 … x=1 is outside the 40°
        # frustum at z=2; use r=0.5 instead: d²=1.25, cos=1/d·1/… compute:
        # cos = 1/sqrt(1.25); L = 4/1.25·(1/1.118)·0.5/π = 0.4556/π·…
        l = 4.0 / 1.25 * (1.0 / np.sqrt(1.25)) * 0.5 / np.pi
        # world x=0.5 at z=2 → ndc = 0.5/(2·tan20) = 0.6868 → raster x =
        # 16.5 + 0.6868·16.5 ≈ 27.8
        px = img[16, 28].mean()
        assert abs(px - l) < 0.05 * l, (px, l)
        assert not np.isnan(img).any()


AREA_LIGHT_VISIBLE = """
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "halton" "integer pixelsamples" [4]
Camera "perspective" "float fov" [30]
Integrator "path" "integer maxdepth" [2]
WorldBegin
Material "matte"
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [2 3 4]
  Shape "trianglemesh" "integer indices" [0 1 2 2 3 0]
    "point P" [-9 -9 5   9 -9 5   9 9 5   -9 9 5]
AttributeEnd
WorldEnd
"""


class TestEmitter:
    def test_emitter_radiance_direct(self):
        """Camera ray hits the emissive quad: pixel = L exactly (bounce-0
        emission, path.rs:21-29)."""
        img, _ = render_inline(AREA_LIGHT_VISIBLE)
        np.testing.assert_allclose(img[8, 8], [2, 3, 4], rtol=1e-5)


MIRROR_SCENE = """
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "halton" "integer pixelsamples" [8]
Camera "perspective" "float fov" [20]
Integrator "path" "integer maxdepth" [3]
WorldBegin
Material "mirror"
Shape "trianglemesh" "integer indices" [0 1 2 2 3 0]
  "point P" [-20 -20 6   20 -20 6   20 20 6   -20 20 6]
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [5 5 5]
  Translate 0 0 -4
  Shape "sphere" "float radius" [2.0]
AttributeEnd
WorldEnd
"""


class TestSpecular:
    def test_mirror_shows_light(self):
        """Mirror plane reflects the emissive sphere behind the camera:
        specular-bounce emission re-add (path.rs:21-29 with specular_bounce).
        Center pixel sees sphere radiance 5 (mirror Kr default 1)."""
        img, _ = render_inline(MIRROR_SCENE, clip=False)
        center = img[15:17, 15:17].mean()
        assert abs(center - 5.0) < 0.05, center
        assert not np.isnan(img).any()


GLASS_SCENE = """
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "halton" "integer pixelsamples" [32]
Camera "perspective" "float fov" [30]
Integrator "path" "integer maxdepth" [5]
WorldBegin
Material "glass"
AttributeBegin
  Translate 0 0 4
  Shape "sphere" "float radius" [1.0]
AttributeEnd
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [1 1 1]
  Translate 0 0 20
  Shape "sphere" "float radius" [10.0]
AttributeEnd
WorldEnd
"""


class TestGlass:
    def test_glass_energy_bounded(self):
        """Glass ball in front of a big emitter: finite, non-NaN, and
        roughly energy-conserving (≤ source radiance + eps)."""
        img, _ = render_inline(GLASS_SCENE)
        assert not np.isnan(img).any()
        assert img.max() < 3.0
        # through the center of the ball, normal-incidence transmittance
        # (~0.92)² ≈ 0.85 of the light comes through
        center = img[12, 12].mean()
        assert 0.5 < center <= 1.01, center
