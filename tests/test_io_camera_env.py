"""Coverage for three reference capabilities that had no dedicated tests:
EXR texture IO (image/exr.rs), thin-lens depth of field (camera/lens.rs),
and image-based infinite-area lighting with importance sampling
(light/infinite_area.rs)."""

import struct
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from curry_pbrt_tpu.models.camera import generate_rays, make_perspective_camera
from curry_pbrt_tpu.render import render_scene
from curry_pbrt_tpu.sceneio.compiler import compile_scene_string
from curry_pbrt_tpu.utils.imageio import read_exr, read_image, write_png


# ---------------------------------------------------------------------------
# EXR


def _write_minimal_exr(path, rgb: np.ndarray):
    """Single-part scanline EXR, FLOAT channels, compression NONE — the
    layout the reference's exr crate emits for float images."""
    h, w = rgb.shape[:2]

    def attr(name, atype, payload):
        return name.encode() + b"\0" + atype.encode() + b"\0" + struct.pack(
            "<I", len(payload)
        ) + payload

    chlist = b""
    for c in (b"B", b"G", b"R"):
        chlist += c + b"\0" + struct.pack("<IIII", 2, 0, 1, 1)  # FLOAT
    chlist += b"\0"
    dw = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (
        attr("channels", "chlist", chlist)
        + attr("compression", "compression", b"\0")
        + attr("dataWindow", "box2i", dw)
        + attr("displayWindow", "box2i", dw)
        + attr("lineOrder", "lineOrder", b"\0")
        + attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
        + attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\0"
    )
    body = b""
    offsets = []
    base = 8 + len(header) + 8 * h
    for y in range(h):
        offsets.append(base + len(body))
        line = b""
        # channels stored alphabetically: B, G, R
        for ci in (2, 1, 0):
            line += rgb[y, :, ci].astype("<f4").tobytes()
        body += struct.pack("<iI", y, len(line)) + line
    with open(path, "wb") as f:
        f.write(b"\x76\x2f\x31\x01" + struct.pack("<I", 2))
        f.write(header)
        f.write(struct.pack("<%dQ" % h, *offsets))
        f.write(body)


class TestExr:
    def test_roundtrip_float(self, tmp_path):
        rng = np.random.RandomState(3)
        img = rng.rand(6, 9, 3).astype(np.float32) * 4.0  # HDR range
        p = tmp_path / "t.exr"
        _write_minimal_exr(p, img)
        got = read_exr(p)
        np.testing.assert_allclose(got, img, rtol=0, atol=0)

    def test_read_image_dispatches_on_extension(self, tmp_path):
        img = np.full((4, 4, 3), 2.5, np.float32)
        p = tmp_path / "d.exr"
        _write_minimal_exr(p, img)
        np.testing.assert_allclose(read_image(p), img)

    def test_exr_texture_in_scene(self, tmp_path):
        """spectrum textures get inverse-gamma regardless of file format —
        the reference applies it to EXR too (texture_map.rs:41-46)."""
        from curry_pbrt_tpu.ops.math import inverse_gamma_correct

        img = np.full((4, 4, 3), 0.5, np.float32)
        _write_minimal_exr(tmp_path / "t.exr", img)
        text = """
WorldBegin
Texture "t" "spectrum" "imagemap" "string filename" ["t.exr"]
Material "matte" "texture Kd" ["t"]
Shape "trianglemesh" "integer indices" [0 1 2] "point P" [0 0 2 1 0 2 0 1 2]
WorldEnd
"""
        scene = compile_scene_string(text, base_dir=tmp_path,
                                     overrides={"clip": False})
        tex = np.asarray(next(iter(scene.init_params["textures"].values())))
        np.testing.assert_allclose(
            tex, inverse_gamma_correct(img.astype(np.float64)), rtol=1e-5
        )


# ---------------------------------------------------------------------------
# thin-lens DoF


class TestThinLens:
    def test_lens_rays_converge_at_focal_plane(self):
        """Every lens sample's ray through one film point must pass through
        the same focal-plane point (lens.rs:24-33)."""
        cam = make_perspective_camera(60.0, (64, 64), None,
                                      lens_radius=0.4, focal_distance=5.0)
        film_xy = jnp.asarray(np.tile([[17.3, 40.2]], (16, 1)), jnp.float32)
        rng = np.random.RandomState(0)
        lens_u = jnp.asarray(rng.rand(16, 2), jnp.float32)
        o, d = generate_rays(cam, film_xy, lens_u)
        o, d = np.asarray(o), np.asarray(d)
        assert np.ptp(o, axis=0).max() > 1e-3  # origins spread over the lens
        t = (5.0 - o[:, 2]) / d[:, 2]
        focus = o + t[:, None] * d
        assert np.ptp(focus, axis=0).max() < 1e-4  # all meet at one point

    def test_pinhole_ignores_lens(self):
        cam = make_perspective_camera(60.0, (64, 64))
        assert not cam.has_lens
        film_xy = jnp.asarray([[32.0, 32.0]], jnp.float32)
        o, _d = generate_rays(cam, film_xy, None)
        np.testing.assert_allclose(np.asarray(o), 0.0, atol=1e-7)

    def test_dof_render_blurs_off_focus(self):
        text = """
Film "image" "integer xresolution" [48] "integer yresolution" [16]
Sampler "halton" "integer pixelsamples" [%d]
Camera "perspective" "float fov" [40]
    "float lensradius" [%s] "float focaldistance" [4]
Integrator "path" "integer maxdepth" [1]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [8 8 8]
  # thin bright vertical strip AT the focal plane (z=4, center)
  Shape "trianglemesh" "integer indices" [0 1 2 2 3 0]
    "point P" [-0.05 -1 4   0.05 -1 4   0.05 1 4   -0.05 1 4]
AttributeEnd
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [8 8 8]
  # identical strip far BEHIND focus (z=12), shifted right
  Shape "trianglemesh" "integer indices" [0 1 2 2 3 0]
    "point P" [2.8 -3 12   3.1 -3 12   3.1 3 12   2.8 3 12]
AttributeEnd
WorldEnd
"""

        sharp = render_scene(
            compile_scene_string(text % (32, "0"), overrides={"clip": False}),
            show_progress=False,
        )
        dof = render_scene(
            compile_scene_string(text % (128, "0.35"), overrides={"clip": False}),
            show_progress=False,
        )
        row_s, row_d = sharp[8].mean(-1), dof[8].mean(-1)
        # image geometry (measured): in-focus strip (x=0, z=4) lands at
        # col 24; off-focus strip (x≈2.95, z=12) at cols ~29-31. Defocus
        # (≈1.3 px blur radius at z=12) must dim and widen the off-focus
        # peak while the in-focus one survives.
        infocus = slice(22, 27)
        offfocus = slice(27, 36)

        def lit_width(row):
            lit = np.nonzero(row > 0.05)[0]
            return lit.max() - lit.min() + 1 if len(lit) else 0

        assert row_d[offfocus].max() < 0.8 * row_s[offfocus].max(), (
            row_d[offfocus].max(), row_s[offfocus].max())
        assert lit_width(row_d[offfocus]) > lit_width(row_s[offfocus])
        assert row_d[infocus].max() > 0.8 * row_s[infocus].max(), (
            row_d[infocus].max(), row_s[infocus].max())
        assert not np.isnan(dof).any()


# ---------------------------------------------------------------------------
# image-based infinite light


class TestEnvMapLight:
    @pytest.fixture(scope="class")
    def env_scene(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("env")
        # bright patch on an otherwise dim latitude-longitude map
        img = np.full((16, 32, 3), 8, np.uint8)
        img[4:8, 8:16] = [250, 180, 60]
        write_png(d / "env.png", img)
        text = """
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "halton" "integer pixelsamples" [8]
Camera "perspective" "float fov" [60]
Integrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "infinite" "string mapname" ["env.png"]
Material "matte" "rgb Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "integer indices" [0 1 2 2 3 0]
  "point P" [-3 -1 1   3 -1 1   3 -1 7   -3 -1 7]
WorldEnd
"""
        (d / "s.pbrt").write_text(text)
        from curry_pbrt_tpu.sceneio.compiler import compile_scene_file

        return compile_scene_file(d / "s.pbrt", overrides={"clip": False})

    def test_env_distribution_built(self, env_scene):
        assert env_scene.env is not None
        assert env_scene.env.image.shape == (16, 32, 3)
        # importance table favors the bright patch's rows
        assert env_scene.n_lights == 1

    def test_escaped_rays_see_map_and_floor_is_lit(self, env_scene):
        img = render_scene(env_scene, show_progress=False)
        assert not np.isnan(img).any()
        # sky visible: well above the dim-map background (8/255 ≈ 0.031 —
        # env maps are NOT gamma-decoded, matching the reference's infinite
        # light which bypasses the TextureMap, infinite_area.rs:10-26)
        assert img.max() > 0.1
        # floor (bottom of image) receives env light via NEE importance
        assert img[20:].mean() > 0.005

    def test_deterministic(self, env_scene):
        a = render_scene(env_scene, show_progress=False)
        b = render_scene(env_scene, show_progress=False)
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# multiple infinite-area lights (the reference parses any number,
# light/mod.rs:43-64; each keeps its own map + importance table)


class TestMultipleEnvLights:
    def _scene(self, tmp_path, maps, tints, res=16, spp=4, extra=""):
        d = tmp_path
        lines = []
        for i, (img, tint) in enumerate(zip(maps, tints)):
            name = f"env{i}.png"
            write_png(d / name, img)
            lines.append(
                f'LightSource "infinite" "string mapname" ["{name}"] '
                f'"rgb L" [{tint[0]} {tint[1]} {tint[2]}]'
            )
        text = f"""
Film "image" "integer xresolution" [{res}] "integer yresolution" [{res}]
Sampler "halton" "integer pixelsamples" [{spp}]
Camera "perspective" "float fov" [60]
Integrator "path" "integer maxdepth" [2]
WorldBegin
{chr(10).join(lines)}
{extra}
WorldEnd
"""
        return compile_scene_string(text, base_dir=d, overrides={"clip": False})

    def test_two_envs_compile_with_own_maps(self, tmp_path):
        red = np.zeros((8, 16, 3), np.uint8); red[..., 0] = 200
        grn = np.zeros((8, 16, 3), np.uint8); grn[..., 1] = 200
        sc = self._scene(tmp_path, [red, grn], [(1, 1, 1)] * 2)
        assert len(sc.envs) == 2
        assert sc.n_lights == 2
        assert list(sc.lights.env_id) == [0, 1]
        # each env keeps its own image (red map first, green second)
        assert sc.envs[0].image[0, 0, 0] > sc.envs[0].image[0, 0, 1]
        assert sc.envs[1].image[0, 0, 1] > sc.envs[1].image[0, 0, 0]

    def test_escaped_radiance_is_sum_of_both_maps(self, tmp_path):
        """No geometry: every camera ray escapes; radiance must be the SUM
        of each infinite light's own map (le_out_scene over all lights,
        path.rs:24-28). Before multi-env support the second map silently
        replaced the first."""
        rng = np.random.default_rng(7)
        a = rng.integers(10, 250, (8, 16, 3)).astype(np.uint8)
        b = rng.integers(10, 250, (8, 16, 3)).astype(np.uint8)
        both = render_scene(
            self._scene(tmp_path, [a, b], [(1, 0.5, 0.25), (0.3, 1, 0.7)]),
            show_progress=False,
        )
        only_a = render_scene(
            self._scene(tmp_path, [a], [(1, 0.5, 0.25)]), show_progress=False
        )
        only_b = render_scene(
            self._scene(tmp_path, [b], [(0.3, 1, 0.7)]), show_progress=False
        )
        assert both.mean() > 0.05
        np.testing.assert_allclose(both, only_a + only_b, rtol=1e-5, atol=1e-6)

    def test_nee_samples_each_lights_own_map(self, tmp_path):
        """sample_li lanes must draw from the CHOSEN light's map: map A is
        red-only, map B green-only — light 0's li must have no green and
        light 1's no red."""
        from curry_pbrt_tpu.models import lights as LT

        red = np.zeros((8, 16, 3), np.uint8); red[..., 0] = 200
        grn = np.zeros((8, 16, 3), np.uint8); grn[..., 1] = 200
        sc = self._scene(tmp_path, [red, grn], [(1, 1, 1)] * 2)
        N = 64
        rng = np.random.default_rng(3)
        p = jnp.zeros((N, 3)); n = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (N, 1))
        perr = jnp.zeros((N, 3))
        u2 = jnp.asarray(rng.random((N, 2)), jnp.float32)
        for idx, (hot, cold) in ((0, (0, 1)), (1, (1, 0))):
            ls = LT.sample_li(
                sc.lights, sc.envs, sc.init_params["light_L"],
                jnp.full((N,), idx, jnp.int32), p, n, perr, u2,
            )
            li = np.asarray(ls.li)
            assert li[:, hot].max() > 0.1
            assert li[:, cold].max() < 1e-6
            assert np.asarray(ls.pdf).min() > 0

    def test_two_constant_envs_match_one_combined(self, tmp_path):
        """Diffuse floor under two CONSTANT env lights of tints a and b ==
        one env of tint a+b (identical sampling distributions, so the
        two-light NEE estimator has the same expectation; means agree to
        Monte-Carlo tolerance)."""
        const = np.full((4, 8, 3), 255, np.uint8)
        floor = (
            'Material "matte" "rgb Kd" [0.6 0.6 0.6]\n'
            'Shape "trianglemesh" "integer indices" [0 1 2 2 3 0] '
            '"point P" [-9 -1 -3   9 -1 -3   9 -1 12   -9 -1 12]'
        )
        two = render_scene(
            self._scene(tmp_path, [const, const],
                        [(0.4, 0.3, 0.2), (0.2, 0.5, 0.6)],
                        spp=64, extra=floor),
            show_progress=False,
        )
        one = render_scene(
            self._scene(tmp_path, [const], [(0.6, 0.8, 0.8)],
                        spp=64, extra=floor),
            show_progress=False,
        )
        np.testing.assert_allclose(two.mean(axis=(0, 1)), one.mean(axis=(0, 1)),
                                   rtol=0.05)
