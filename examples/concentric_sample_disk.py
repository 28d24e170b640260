#!/usr/bin/env python
"""Dump concentric disk samples (reference: examples/concentric_sample_disk.rs)."""
import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax.numpy as jnp
from curry_pbrt_tpu.ops.math import concentric_sample_disk

if __name__ == "__main__":
    u = jnp.asarray(np.random.RandomState(0).rand(128, 2).astype(np.float32))
    p = concentric_sample_disk(u)
    for x, y in np.asarray(p).tolist():
        print(x)
        print(y)
