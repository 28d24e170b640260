#!/usr/bin/env python
"""Dump 128 Halton 2-D samples for external plotting
(reference: examples/halton_sampler.rs)."""
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax.numpy as jnp
from curry_pbrt_tpu.ops import halton as h

if __name__ == "__main__":
    cfg = h.make_halton_config((1024, 768), spp=128)
    perms = h.make_permutations(cfg.seed)
    idx = (jnp.arange(128, dtype=jnp.uint32)) * jnp.uint32(cfg.scale_prod)
    u = h.halton_sample_2d(idx, 2, cfg, perms)
    for x, y in u.tolist():
        print(x)
        print(y)
