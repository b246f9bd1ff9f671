"""1D / 2D discrete CDF construction and sampling.

TPU-facing analog of the reference CDF library
(/root/reference/src/artic/core/cdf.art) used for environment-map importance
sampling, mesh area sampling and light selection. Construction happens
host-side (numpy-friendly jnp); sampling runs inside jit using
jnp.searchsorted (log-n gathers on VPU).

Layout convention matches the reference: a 1D CDF over n bins is an array of
n entries cdf[i] = sum(w[0..i]) / total, so cdf[n-1] == 1. Sampling draws
u in [0,1), finds the first bin with cdf >= u, and re-scales the residual for
reuse (stratification-preserving).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CDF1D(NamedTuple):
    cdf: jnp.ndarray  # [n] inclusive prefix sums, last == 1

    @property
    def size(self):
        return self.cdf.shape[-1]


def build_cdf_1d(weights) -> CDF1D:
    w = jnp.asarray(weights, jnp.float32)
    c = jnp.cumsum(w, axis=-1)
    total = c[..., -1:]
    # Degenerate (all-zero) rows fall back to uniform.
    n = w.shape[-1]
    uniform = (jnp.arange(1, n + 1, dtype=jnp.float32) / n)
    uniform = jnp.broadcast_to(uniform, c.shape)
    c = jnp.where(total > 0, c / jnp.where(total > 0, total, 1.0), uniform)
    return CDF1D(c)


def sample_cdf_1d(c: CDF1D, u):
    """Sample bin index ~ weights. Returns (index, remapped_u, pdf)."""
    cdf = c.cdf
    n = cdf.shape[-1]
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, n - 1)
    lo = jnp.where(idx > 0, cdf[jnp.maximum(idx - 1, 0)], 0.0)
    hi = cdf[idx]
    pdf = hi - lo
    rem = jnp.where(pdf > 0, (u - lo) / jnp.where(pdf > 0, pdf, 1.0), 0.0)
    return idx, jnp.clip(rem, 0.0, 1.0), pdf


def pdf_cdf_1d(c: CDF1D, idx):
    cdf = c.cdf
    lo = jnp.where(idx > 0, cdf[jnp.maximum(idx - 1, 0)], 0.0)
    return cdf[idx] - lo


class CDF2D(NamedTuple):
    """Row-marginal + per-row-conditional CDF over an (h, w) grid.

    sample() returns continuous (x, y) in [0,1)^2 with pdf w.r.t. the unit
    square (i.e. pdf integrates to 1 over the square; multiply by h*w to get
    the per-texel discrete pdf).
    """
    marginal: jnp.ndarray     # [h] CDF over rows
    conditional: jnp.ndarray  # [h, w] CDF along each row

    @property
    def height(self):
        return self.conditional.shape[0]

    @property
    def width(self):
        return self.conditional.shape[1]


def build_cdf_2d(weights) -> CDF2D:
    w = jnp.asarray(weights, jnp.float32)  # [h, w]
    h, n = w.shape
    row_sum = jnp.sum(w, axis=-1)
    cond = build_cdf_1d(w).cdf
    marg = build_cdf_1d(row_sum).cdf
    return CDF2D(marg, cond)


def sample_cdf_2d(c: CDF2D, u, v):
    """Continuous 2D sample. Returns (x, y, pdf) — unit-square pdf."""
    h, w = c.height, c.width
    # Row from marginal (using v)
    ri = jnp.clip(jnp.searchsorted(c.marginal, v, side="right"), 0, h - 1)
    rlo = jnp.where(ri > 0, c.marginal[jnp.maximum(ri - 1, 0)], 0.0)
    rhi = c.marginal[ri]
    rp = rhi - rlo
    rrem = jnp.where(rp > 0, (v - rlo) / jnp.where(rp > 0, rp, 1.0), 0.0)
    # Column from conditional row (using u); gather the row then search.
    row = c.conditional[ri]  # [..., w]
    ci = jnp.clip(_searchsorted_rows(row, u), 0, w - 1)
    clo = jnp.where(ci > 0, jnp.take_along_axis(
        row, jnp.maximum(ci - 1, 0)[..., None], axis=-1)[..., 0], 0.0)
    chi = jnp.take_along_axis(row, ci[..., None], axis=-1)[..., 0]
    cp = chi - clo
    crem = jnp.where(cp > 0, (u - clo) / jnp.where(cp > 0, cp, 1.0), 0.0)

    x = (ci.astype(jnp.float32) + jnp.clip(crem, 0.0, 1.0)) / w
    y = (ri.astype(jnp.float32) + jnp.clip(rrem, 0.0, 1.0)) / h
    pdf = (rp * h) * (cp * w)
    return x, y, pdf


def pdf_cdf_2d(c: CDF2D, x, y):
    """Unit-square pdf at continuous position (x, y)."""
    h, w = c.height, c.width
    ri = jnp.clip((y * h).astype(jnp.int32), 0, h - 1)
    ci = jnp.clip((x * w).astype(jnp.int32), 0, w - 1)
    rlo = jnp.where(ri > 0, c.marginal[jnp.maximum(ri - 1, 0)], 0.0)
    rp = c.marginal[ri] - rlo
    row = c.conditional[ri]
    clo = jnp.where(ci > 0, jnp.take_along_axis(
        row, jnp.maximum(ci - 1, 0)[..., None], axis=-1)[..., 0], 0.0)
    cp = jnp.take_along_axis(row, ci[..., None], axis=-1)[..., 0] - clo
    return (rp * h) * (cp * w)


def _searchsorted_rows(rows, u):
    """searchsorted along the last axis of `rows` for scalar-per-row `u`."""
    # rows: [..., w]; u: [...] -> index [...]
    return jnp.sum((rows < u[..., None]).astype(jnp.int32), axis=-1)
