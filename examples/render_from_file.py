#!/usr/bin/env python
"""Render a pbrt scene file (reference: examples/render_from_file.rs)."""
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from curry_pbrt_tpu.cli import main

if __name__ == "__main__":
    main()
