import numpy as np
import pytest
from pathlib import Path

from curry_pbrt_tpu.sceneio.lexer import tokenize_string
from curry_pbrt_tpu.sceneio.parser import segments_from_tokens, find_segment, find_block
from curry_pbrt_tpu.sceneio import spd


class TestLexer:
    def test_basic_tokens(self):
        toks = tokenize_string('Camera "perspective" "float fov" [37.5]')
        kinds = [t.kind for t in toks]
        assert kinds == ["type", "string", "string", "array"]

    def test_comments_and_numbers(self):
        toks = tokenize_string("Translate 1 -2.5 3e2 # comment\nRotate 90 0 0 1")
        assert [t.kind for t in toks] == ["type", "int", "float", "float", "type",
                                         "int", "int", "int", "int"]
        assert toks[3].value == 300.0

    def test_block_markers(self):
        toks = tokenize_string("WorldBegin AttributeBegin AttributeEnd WorldEnd")
        assert [(t.kind, t.value) for t in toks] == [
            ("block_begin", "World"), ("block_begin", "Attribute"),
            ("block_end", "Attribute"), ("block_end", "World"),
        ]

    def test_include_splices(self, tmp_path):
        inc = tmp_path / "inc.pbrt"
        inc.write_text('Material "matte" "rgb Kd" [1 0 0]')
        main = tmp_path / "main.pbrt"
        main.write_text('WorldBegin\nInclude "inc.pbrt"\nWorldEnd\n')
        from curry_pbrt_tpu.sceneio.lexer import tokenize_file

        toks = tokenize_file(main)
        vals = [t.value for t in toks if t.kind == "type"]
        assert "Material" in vals

    def test_unpaired_errors(self):
        with pytest.raises(ValueError):
            tokenize_string('"unclosed')
        with pytest.raises(ValueError):
            tokenize_string("]")


class TestSegments:
    def test_nested_blocks(self):
        segs = segments_from_tokens(
            tokenize_string(
                'WorldBegin AttributeBegin Material "matte" AttributeEnd WorldEnd'
            )
        )
        world = find_block(segs, "World")
        assert world is not None
        inner = world.children[0]
        assert inner.block_type == "Attribute"
        assert inner.children[0].object_type == "Material"

    def test_named_block(self):
        segs = segments_from_tokens(
            tokenize_string('WorldBegin ObjectBegin "thing" ObjectEnd WorldEnd')
        )
        obj = find_block(segs, "World").children[0]
        assert obj.block_type == "Object" and obj.block_name == "thing"

    def test_property_set(self):
        segs = segments_from_tokens(
            tokenize_string(
                'Film "image" "string filename" ["out.png"] '
                '"integer xresolution" [640] "integer yresolution" [480]'
            )
        )
        ps = segs[0].properties
        assert ps.get_name() == "image"
        assert ps.get_string("filename") == "out.png"
        assert ps.get_int("xresolution") == 640
        assert ps.get_int("yresolution") == 480
        assert ps.get_int("missing", 7) == 7

    def test_bare_floats(self):
        segs = segments_from_tokens(tokenize_string("LookAt 1 2 3 4 5 6 7 8 9"))
        assert segs[0].properties.bare_floats() == [1, 2, 3, 4, 5, 6, 7, 8, 9]

    def test_mismatched_block_end(self):
        with pytest.raises(ValueError):
            segments_from_tokens(tokenize_string("WorldBegin AttributeEnd"))

    def test_reference_scenes_parse(self):
        for name in ("cornel_box.pbrt", "sphere.pbrt"):
            p = Path("/root/reference/scenes") / name
            if not p.exists():
                pytest.skip("reference not mounted")
            from curry_pbrt_tpu.sceneio.parser import read_scene

            segs = read_scene(p)
            assert find_block(segs, "World") is not None
            assert find_segment(segs, "Camera") is not None


class TestSPD:
    def test_constant_spd_is_grayish(self):
        rgb = spd.spd_to_rgb([400.0, 1.0, 700.0, 1.0])
        # equal-energy illuminant through the sRGB matrix is warm-white
        assert np.all(np.abs(rgb - 1.0) < 0.25), rgb
        assert abs(spd.luminance(rgb) - 1.0) < 0.01

    def test_red_spd(self):
        # energy only in long wavelengths → red-dominant
        rgb = spd.spd_to_rgb([400, 0.0, 580, 0.0, 620, 1.0, 700, 1.0])
        assert rgb[0] > 3 * abs(rgb[1])

    def test_cie_y_integral_reasonable(self):
        # tabulated value is 106.857; the analytic fit is within ~1%
        assert abs(spd.CIE_Y_INTEGRAL - 106.857) / 106.857 < 0.02

    def test_luminance_of_white(self):
        # flat unit SPD has luminance ≈ 1 by the normalization
        rgb = spd.spd_to_rgb([360.0, 1.0, 830.0, 1.0])
        y = spd.luminance(rgb)
        assert abs(y - 1.0) < 0.01
