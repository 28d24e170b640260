#!/usr/bin/env python
"""Pretty-print the block-segment tree of a scene file
(reference: examples/parse.rs)."""
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from curry_pbrt_tpu.sceneio.parser import read_scene, BlockSegment


def dump(seg: BlockSegment, indent=0):
    pad = "  " * indent
    if seg.is_block:
        print(f"{pad}{seg.block_type}Begin {seg.block_name or ''}")
        for c in seg.children:
            dump(c, indent + 1)
        print(f"{pad}{seg.block_type}End")
    else:
        props = []
        for p in seg.properties.props:
            if p.type_name:
                vals = " ".join(str(t.value) for t in p.values[:6])
                more = " ..." if len(p.values) > 6 else ""
                props.append(f'"{p.type_name} {p.name}" [{vals}{more}]')
            else:
                props.append(" ".join(repr(t.value) for t in p.values[:6]))
        print(f"{pad}{seg.object_type} {' '.join(props)}")


if __name__ == "__main__":
    for seg in read_scene(sys.argv[1]):
        dump(seg)
