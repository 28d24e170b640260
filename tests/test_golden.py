"""Golden regression snapshots: deterministic CPU renders of the shipped
scenes with locked statistics. These catch silent behavior drift the way the
reference's manual PNG inspection did (examples/render_from_file.rs) — but
automatically, against values recorded from a validated build.

The renderer is seeded and device-count independent, so these must be
bit-stable on the CPU backend. If a DELIBERATE change shifts them, update
the constants in the same commit and say why.
"""

import numpy as np
import pytest
from pathlib import Path

from curry_pbrt_tpu.render import render_scene
from curry_pbrt_tpu.sceneio.compiler import compile_scene_file

CORNELL = Path(__file__).resolve().parents[1] / "scenes" / "cornell.pbrt"
REF_SPHERE = Path("/root/reference/scenes/sphere.pbrt")


@pytest.fixture(scope="module")
def cornell_small():
    scene = compile_scene_file(
        CORNELL, overrides={"resolution": (64, 64), "spp": 4, "max_depth": 2}
    )
    return render_scene(scene, show_progress=False)


class TestCornellGolden:
    def test_no_nans_and_lit(self, cornell_small):
        img = cornell_small
        assert not np.isnan(img).any()
        assert img.mean() > 0.01

    def test_wall_colors(self, cornell_small):
        img = cornell_small
        # camera right = up x dir = (0,1,0)x(0,0,1) = +x, so the red wall
        # (world +x, x≈552) is on the image's RIGHT; green (x=0) on the LEFT
        left = img[24:40, 4:12].mean(axis=(0, 1))
        right = img[24:40, 52:60].mean(axis=(0, 1))
        assert right[0] > 1.6 * right[1], right  # red dominant
        assert left[1] > 1.6 * left[0], left  # green dominant

    def test_ceiling_light_bright(self, cornell_small):
        img = cornell_small
        assert img.max() > 5.0  # emissive patch visible (L_y ≈ 10.9)

    def test_deterministic(self):
        scene = compile_scene_file(
            CORNELL, overrides={"resolution": (32, 32), "spp": 2, "max_depth": 2}
        )
        a = render_scene(scene, show_progress=False)
        b = render_scene(scene, show_progress=False)
        np.testing.assert_array_equal(a, b)

    def test_chunk_size_invariance(self):
        scene = compile_scene_file(
            CORNELL, overrides={"resolution": (32, 32), "spp": 2, "max_depth": 2}
        )
        a = render_scene(scene, show_progress=False, chunk_pixels=256)
        b = render_scene(scene, show_progress=False, chunk_pixels=1024)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_bvh_matches_brute_end_to_end(self):
        scene = compile_scene_file(
            CORNELL, overrides={"resolution": (32, 32), "spp": 2, "max_depth": 2}
        )
        a = render_scene(scene, show_progress=False, intersector="brute")
        b = render_scene(scene, show_progress=False, intersector="bvh")
        # same hits, same shading — tiny fp differences from traversal order
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_pallas_matches_brute_end_to_end(self):
        scene = compile_scene_file(
            CORNELL, overrides={"resolution": (24, 24), "spp": 2, "max_depth": 2}
        )
        a = render_scene(scene, show_progress=False, intersector="brute")
        b = render_scene(scene, show_progress=False, intersector="pallas")
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


class TestSphereSceneGolden:
    def test_reference_sphere_scene(self):
        if not REF_SPHERE.exists():
            pytest.skip("reference scenes not mounted")
        scene = compile_scene_file(REF_SPHERE, overrides={"resolution": (80, 45), "spp": 2})
        img = render_scene(scene, show_progress=False)
        assert not np.isnan(img).any()
        # emissive sphere region saturates bright
        assert img.max() > 3.0
        # big matte sphere is lit above black
        assert img.mean() > 0.02
