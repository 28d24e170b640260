#!/usr/bin/env python
"""Probe: 2-D grid (ray blocks × tri slabs) with
  - VMEM tri-slab input blocked on the inner axis (streaming DMA),
  - SMEM per-slab scalar-table input blocked on the inner axis,
  - output blocked on the OUTER axis only (revisited across inner steps =
    accumulation pattern).
Validates the structure the streamed intersector needs, on TPU and in
interpret mode.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR, SLAB = 256, 8  # rays/block, rows/slab


def kernel(tab_ref, rays_ref, slab_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # scalar read from the per-slab SMEM table row 0
    scale = tab_ref[0, 0]
    out_ref[:] = out_ref[:] + scale * jnp.sum(slab_ref[:]) + rays_ref[0:1, :]


def run(interpret):
    n_blocks, n_slabs = 2, 3
    rays = jnp.arange(4 * n_blocks * BR, dtype=jnp.float32).reshape(4, n_blocks * BR) * 0.001
    slabs = jnp.arange(n_slabs * SLAB * 8, dtype=jnp.float32).reshape(n_slabs * SLAB, 8) * 0.01
    tab = jnp.asarray(np.repeat(np.arange(n_slabs, dtype=np.float32) + 1.0, 8 * 4).reshape(n_slabs * 8, 4))

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_slabs),
        in_specs=[
            pl.BlockSpec((8, 4), lambda i, j: (j, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((4, BR), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((SLAB, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BR), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_blocks * BR), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(tab, rays, slabs)

    # reference
    slabs_np = np.asarray(slabs).reshape(n_slabs, SLAB, 8)
    tab_np = np.asarray(tab)
    rays_np = np.asarray(rays)
    ref = np.zeros((1, n_blocks * BR), np.float32)
    for i in range(n_blocks):
        sl = slice(i * BR, (i + 1) * BR)
        acc = np.zeros((BR,), np.float32)
        for j in range(n_slabs):
            acc += tab_np[j * 8, 0] * slabs_np[j].sum() + rays_np[0, sl]
        ref[0, sl] = acc
    assert np.allclose(np.asarray(out), ref, rtol=1e-5), (
        np.abs(np.asarray(out) - ref).max(), ref[0, :4], np.asarray(out)[0, :4])
    return np.asarray(out)


if __name__ == "__main__":
    a = run(interpret=True)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        b = run(interpret=False)
        print("tpu allclose interpret:", np.allclose(a, b), "max diff", np.abs(a - b).max())
    print("interpret out[0,:4]:", a[0, :4])
    print("OK")
    sys.exit(0)
