"""Piecewise-constant 1-D/2-D sampling distributions.

The reference builds per-row CDF tables and inverts them with a linear scan
(/root/reference/src/math/distribution.rs:45-53). Here CDFs are built once
host-side (numpy prefix sums) and inverted on device with a vectorized
`jnp.searchsorted` — O(log n) per lane, no data-dependent loops, and the
tables live in HBM/VMEM as flat arrays.

Semantics match the reference:
  pdf[i]     = f[i] / (n * sum(f)/n) = f[i] / sum(f)          (discrete)
  cdf[i]     = prefix-sum(f)[i] / sum(f)                       (inclusive)
  sample(u)  = first i with u <= cdf[i]; remap = (cdf[i]-u)/pdf[i]
  continuous = (i + remap)/n with density pdf[i]*n
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from curry_pbrt_tpu.dtypes import Float


class Distribution1D(NamedTuple):
    """Flat arrays; n is static. pdf/cdf: (n,)."""

    pdf: jnp.ndarray  # discrete pdf (sums to 1)
    cdf: jnp.ndarray  # inclusive prefix cdf, cdf[-1] == 1
    f_sum: jnp.ndarray  # scalar: sum(f)/n (the reference's f_sum)

    @property
    def n(self) -> int:
        return self.pdf.shape[-1]


def build_distribution_1d(f: np.ndarray) -> Distribution1D:
    f = np.asarray(f, dtype=np.float64)
    n = f.shape[-1]
    assert n > 0
    cdf = np.cumsum(f / n, axis=-1)
    f_sum = cdf[..., -1:]
    safe = np.where(f_sum == 0, 1.0, f_sum)
    pdf = (f / n) / safe
    cdf = cdf / safe
    return Distribution1D(
        pdf=jnp.asarray(pdf, dtype=Float),
        cdf=jnp.asarray(cdf, dtype=Float),
        f_sum=jnp.asarray(f_sum[..., 0], dtype=Float),
    )


def _searchsorted_rows(cdf, u):
    """First index i with u <= cdf[i]; cdf (..., n), u (...)."""
    return jnp.clip(
        jnp.sum((cdf < u[..., None]).astype(jnp.int32), axis=-1), 0, cdf.shape[-1] - 1
    )


def sample_1d_remap(dist: Distribution1D, u):
    """u: (...) → (idx, pdf, remap), each (...)."""
    idx = _searchsorted_rows(dist.cdf, u)
    pdf = jnp.take(dist.pdf, idx)
    cdf_i = jnp.take(dist.cdf, idx)
    remap = (cdf_i - u) / jnp.where(pdf == 0, 1.0, pdf)
    return idx, pdf, remap


def sample_1d_continuous(dist: Distribution1D, u):
    """u: (...) → (idx, density, x∈[0,1])."""
    n = jnp.float32(dist.n)
    idx, pdf, remap = sample_1d_remap(dist, u)
    return idx, pdf * n, (idx.astype(Float) + remap) / n


def pdf_1d_continuous(dist: Distribution1D, x):
    n = dist.n
    idx = jnp.clip((x * n).astype(jnp.int32), 0, n - 1)
    return jnp.take(dist.pdf, idx) / jnp.float32(n)


class Distribution2D(NamedTuple):
    """Row-major table: rows along axis 0 (the reference samples the ROW
    index from u.x and the column from u.y — distribution.rs:100-123)."""

    row_pdf: jnp.ndarray  # (R,) marginal over rows
    row_cdf: jnp.ndarray  # (R,)
    col_pdf: jnp.ndarray  # (R, C) per-row conditional
    col_cdf: jnp.ndarray  # (R, C)

    @property
    def shape(self):
        return self.col_pdf.shape


def build_distribution_2d(f: np.ndarray) -> Distribution2D:
    f = np.asarray(f, dtype=np.float64)
    rows, cols = f.shape
    col_cdf = np.cumsum(f / cols, axis=-1)
    row_sums = col_cdf[:, -1].copy()
    safe = np.where(row_sums == 0, 1.0, row_sums)[:, None]
    col_pdf = (f / cols) / safe
    col_cdf = col_cdf / safe
    row_cdf = np.cumsum(row_sums / rows)
    total = row_cdf[-1] if row_cdf[-1] != 0 else 1.0
    row_pdf = (row_sums / rows) / total
    row_cdf = row_cdf / total
    return Distribution2D(
        row_pdf=jnp.asarray(row_pdf, Float),
        row_cdf=jnp.asarray(row_cdf, Float),
        col_pdf=jnp.asarray(col_pdf, Float),
        col_cdf=jnp.asarray(col_cdf, Float),
    )


def sample_2d_continuous(dist: Distribution2D, u):
    """u: (..., 2) → (xy: (..., 2) in [0,1]², density: (...)).

    xy[0] is the ROW coordinate, xy[1] the column (reference returns
    Point2f(x=row, y=col) — distribution.rs:110-123)."""
    rows, cols = dist.shape
    r_idx = _searchsorted_rows(dist.row_cdf, u[..., 0])
    r_pdf = jnp.take(dist.row_pdf, r_idx)
    r_cdfv = jnp.take(dist.row_cdf, r_idx)
    r_remap = (r_cdfv - u[..., 0]) / jnp.where(r_pdf == 0, 1.0, r_pdf)
    x = (r_idx.astype(Float) + r_remap) / rows

    row_col_cdf = jnp.take(dist.col_cdf, r_idx, axis=0)  # (..., C)
    row_col_pdf = jnp.take(dist.col_pdf, r_idx, axis=0)
    c_idx = _searchsorted_rows(row_col_cdf, u[..., 1])
    c_pdf = jnp.take_along_axis(row_col_pdf, c_idx[..., None], axis=-1)[..., 0]
    c_cdfv = jnp.take_along_axis(row_col_cdf, c_idx[..., None], axis=-1)[..., 0]
    c_remap = (c_cdfv - u[..., 1]) / jnp.where(c_pdf == 0, 1.0, c_pdf)
    y = (c_idx.astype(Float) + c_remap) / cols

    density = (r_pdf * rows) * (c_pdf * cols)
    return jnp.stack([x, y], axis=-1), density


def pdf_2d_continuous(dist: Distribution2D, xy):
    rows, cols = dist.shape
    r = jnp.clip((xy[..., 0] * rows).astype(jnp.int32), 0, rows - 1)
    c = jnp.clip((xy[..., 1] * cols).astype(jnp.int32), 0, cols - 1)
    rp = jnp.take(dist.row_pdf, r)
    cp = dist.col_pdf[r, c]
    return rp * cp * rows * cols
