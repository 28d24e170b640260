#!/usr/bin/env python
"""Dump the raw token stream of a scene file (reference: examples/parse_lex.rs)."""
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from curry_pbrt_tpu.sceneio.lexer import tokenize_file

if __name__ == "__main__":
    for tok in tokenize_file(sys.argv[1]):
        print(tok.kind, repr(tok.value) if tok.kind != "array" else f"[{len(tok.value)} tokens]")
