"""Dupuy-Jakob measured BRDF runtime evaluation.

Operates on the tables baked by scene/djmeasured.py (reference:
src/artic/bsdf/djmeasured.art + measured/powitacq_rgb.inl). All maps are
static gathers: theta_i-node interpolation, half-vector unit-square lookup
for fr, baked product density + per-node CDFs for importance sampling.

Conventions: unlike the reference's djmeasured eval (which returns the raw
BRDF, djmeasured.art:511), eval here multiplies by |cos(in)| to match this
framework's shader convention. pdf/sample both condition on the known
(view) direction so MIS stays self-consistent.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vec import Color, Vec3, safe_div

TWO_PI_SQ = 2.0 * jnp.pi * jnp.pi


class DJData(NamedTuple):
    theta_nodes: jnp.ndarray  # [T]
    fr: jnp.ndarray           # [T, H, W, 3]
    g: jnp.ndarray            # [T, H, W]
    marg_cdf: jnp.ndarray     # [T, H]
    cond_cdf: jnp.ndarray     # [T, H, W]


def from_numpy(d) -> DJData:
    return DJData(jnp.asarray(d.theta_nodes), jnp.asarray(d.fr),
                  jnp.asarray(d.g), jnp.asarray(d.marg_cdf),
                  jnp.asarray(d.cond_cdf))


def _elevation(v: Vec3):
    """Numerically robust acos(z) (powitacq_rgb.inl:1075)."""
    dz = v.z - 1.0
    return 2.0 * jnp.arcsin(jnp.clip(
        0.5 * jnp.sqrt(v.x * v.x + v.y * v.y + dz * dz), 0.0, 1.0 - 1e-7))


def _theta2u(theta):
    return jnp.sqrt(jnp.maximum(theta, 0.0) * (2.0 / jnp.pi))


def _u2theta(u):
    return (u * u) * (jnp.pi / 2.0)


def _phi2u(phi):
    return phi * (0.5 / jnp.pi) + 0.5


def _u2phi(u):
    return (2.0 * u - 1.0) * jnp.pi


def _theta_bins(data: DJData, theta):
    """Surrounding theta nodes + lerp weight."""
    T = data.theta_nodes.shape[0]
    hi = jnp.clip(jnp.searchsorted(data.theta_nodes, theta), 1, T - 1)
    lo = hi - 1
    t_lo = data.theta_nodes[lo]
    t_hi = data.theta_nodes[hi]
    w = jnp.clip(safe_div(theta - t_lo, t_hi - t_lo), 0.0, 1.0)
    return lo, hi, w


def _uwm(known: Vec3, other: Vec3):
    """Half-vector unit-square coords, isotropic (phi relative to known)."""
    wm = Vec3(known.x + other.x, known.y + other.y, known.z + other.z)
    l = jnp.sqrt(jnp.maximum(wm.x ** 2 + wm.y ** 2 + wm.z ** 2, 1e-24))
    wm = Vec3(wm.x / l, wm.y / l, wm.z / l)
    theta_m = _elevation(wm)
    phi_m = jnp.arctan2(wm.y, wm.x)
    phi_k = jnp.arctan2(known.y, known.x)
    ux = _theta2u(theta_m)
    uy = _phi2u(phi_m - phi_k)
    uy = uy - jnp.floor(uy)
    return wm, theta_m, ux, uy


def _gather_fr(data: DJData, t, ux, uy):
    H, W = data.fr.shape[1], data.fr.shape[2]
    iy = jnp.clip((uy * H).astype(jnp.int32), 0, H - 1)
    ix = jnp.clip((ux * W).astype(jnp.int32), 0, W - 1)
    return (data.fr[t, iy, ix, 0], data.fr[t, iy, ix, 1],
            data.fr[t, iy, ix, 2]), data.g[t, iy, ix]


def dj_eval(data: DJData, tint: Color, wi: Vec3, wo: Vec3) -> Color:
    """eval with cos(in) included; wi = light, wo = view (both local)."""
    wm, theta_m, ux, uy = _uwm(wo, wi)
    lo, hi, w = _theta_bins(data, _elevation(wo))
    (r0, g0, b0), _ = _gather_fr(data, lo, ux, uy)
    (r1, g1, b1), _ = _gather_fr(data, hi, ux, uy)
    cos_i = jnp.maximum(wi.z, 0.0)
    ok = (wi.z > 1e-6) & (wo.z > 1e-6)
    f = jnp.where(ok, cos_i, 0.0)
    return Color(tint.r * (r0 + (r1 - r0) * w) * f,
                 tint.g * (g0 + (g1 - g0) * w) * f,
                 tint.b * (b0 + (b1 - b0) * w) * f)


def _pdf_from_g(data: DJData, g_val, ux, theta_m, wi: Vec3, wm: Vec3):
    sin_m = jnp.sin(theta_m)
    jac = jnp.maximum(TWO_PI_SQ * ux * sin_m, 1e-6) * 4.0 \
        * jnp.maximum(wi.x * wm.x + wi.y * wm.y + wi.z * wm.z, 1e-6)
    return safe_div(g_val, jac)


def dj_pdf(data: DJData, wi: Vec3, wo: Vec3):
    wm, theta_m, ux, uy = _uwm(wo, wi)
    lo, hi, w = _theta_bins(data, _elevation(wo))
    _, ga = _gather_fr(data, lo, ux, uy)
    _, gb = _gather_fr(data, hi, ux, uy)
    g_val = ga + (gb - ga) * w
    ok = (wi.z > 1e-6) & (wo.z > 1e-6)
    return jnp.where(ok, _pdf_from_g(data, g_val, ux, theta_m, wo, wm), 0.0)


def _sample_rows(cdf_rows, row_idx, u):
    """Inverse-CDF within each lane's row of an inclusive CDF table."""
    ncols = cdf_rows.shape[-1]
    rows = cdf_rows[row_idx]
    idx = jnp.clip(jnp.sum((rows < u[:, None]).astype(jnp.int32), axis=-1),
                   0, ncols - 1)
    lane = jnp.arange(row_idx.shape[0])
    hi = rows[lane, idx]
    lo = jnp.where(idx > 0, rows[lane, jnp.maximum(idx - 1, 0)], 0.0)
    p = jnp.maximum(hi - lo, 1e-12)
    frac = jnp.clip((u - lo) / p, 0.0, 1.0)
    return (idx.astype(jnp.float32) + frac) / ncols


def dj_sample(data: DJData, tint: Color, wo: Vec3, u0, u1, u2):
    """Sample the baked u_wm density conditioned on the view; returns
    (in_dir local, pdf, weight, valid)."""
    lo, hi, w = _theta_bins(data, _elevation(wo))
    t = jnp.where(u0 < w, hi, lo)  # stochastic node pick = linear interp
    uy = _sample_rows(data.marg_cdf, t, u1)
    H = data.marg_cdf.shape[-1]
    iy = jnp.clip((uy * H).astype(jnp.int32), 0, H - 1)
    ux = _sample_rows(data.cond_cdf.reshape(-1, data.cond_cdf.shape[-1]),
                      t * H + iy, u2)
    theta_m = _u2theta(ux)
    phi_m = _u2phi(uy) + jnp.arctan2(wo.y, wo.x)
    sin_m = jnp.sin(theta_m)
    wm = Vec3(jnp.cos(phi_m) * sin_m, jnp.sin(phi_m) * sin_m,
              jnp.cos(theta_m))
    d = 2.0 * (wo.x * wm.x + wo.y * wm.y + wo.z * wm.z)
    wi = Vec3(wm.x * d - wo.x, wm.y * d - wo.y, wm.z * d - wo.z)

    (r0, g0, b0), ga = _gather_fr(data, lo, ux, uy)
    (r1, g1, b1), gb = _gather_fr(data, hi, ux, uy)
    g_val = ga + (gb - ga) * w
    pdf = _pdf_from_g(data, g_val, ux, theta_m, wo, wm)
    valid = (wi.z > 1e-6) & (wo.z > 1e-6) & (pdf > 1e-9)
    cos_i = jnp.maximum(wi.z, 0.0)
    s = jnp.where(valid, safe_div(cos_i, pdf), 0.0)
    weight = Color(tint.r * (r0 + (r1 - r0) * w) * s,
                   tint.g * (g0 + (g1 - g0) * w) * s,
                   tint.b * (b0 + (b1 - b0) * w) * s)
    return wi, pdf, weight, valid
