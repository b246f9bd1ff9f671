"""Dupuy-Jakob measured BRDF runtime evaluation.

Operates on the tables baked by scene/djmeasured.py (reference:
src/artic/bsdf/djmeasured.art + measured/powitacq_rgb.inl). All maps are
static gathers: (phi_i, theta_i)-node interpolation, half-vector
unit-square lookup for fr, baked product density + per-node CDFs for
importance sampling. Isotropic tables (P == 1) use phi-relative u_wm
coordinates; anisotropic tables use absolute phi and interpolate over the
phi_i nodes as well (djmeasured.art:529 applies the phi shift only in the
isotropic case).

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
    phi_nodes: jnp.ndarray    # [P] (P == 1: isotropic)
    fr: jnp.ndarray           # [P, T, H, W, 3]
    g: jnp.ndarray            # [P, T, H, W]
    marg_cdf: jnp.ndarray     # [P, T, H]
    cond_cdf: jnp.ndarray     # [P, T, H, W]


def from_numpy(d) -> DJData:
    return DJData(jnp.asarray(d.theta_nodes), jnp.asarray(d.phi_nodes),
                  jnp.asarray(d.fr), jnp.asarray(d.g),
                  jnp.asarray(d.marg_cdf), jnp.asarray(d.cond_cdf))


def _isotropic(data: DJData) -> bool:
    return data.phi_nodes.shape[0] == 1


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


def _phi_bins(data: DJData, phi):
    """Surrounding phi nodes + lerp weight (non-periodic clamp, matching
    the reference warp's parameter interpolation, powitacq find_interval).
    Isotropic tables return the single slice with weight 0."""
    P = data.phi_nodes.shape[0]
    if P == 1:
        z = jnp.zeros_like(phi)
        zi = z.astype(jnp.int32)
        return zi, zi, z
    hi = jnp.clip(jnp.searchsorted(data.phi_nodes, phi), 1, P - 1)
    lo = hi - 1
    p_lo = data.phi_nodes[lo]
    p_hi = data.phi_nodes[hi]
    w = jnp.clip(safe_div(phi - p_lo, p_hi - p_lo), 0.0, 1.0)
    return lo, hi, w


def _uwm(data: DJData, known: Vec3, other: Vec3):
    """Half-vector unit-square coords; phi relative to `known` for
    isotropic tables, absolute otherwise (djmeasured.art:527-529)."""
    wm = Vec3(known.x + other.x, known.y + other.y, known.z + other.z)
    l = jnp.sqrt(jnp.maximum(wm.x ** 2 + wm.y ** 2 + wm.z ** 2, 1e-24))
    wm = Vec3(wm.x / l, wm.y / l, wm.z / l)
    theta_m = _elevation(wm)
    phi_m = jnp.arctan2(wm.y, wm.x)
    if _isotropic(data):
        phi_m = phi_m - jnp.arctan2(known.y, known.x)
    ux = _theta2u(theta_m)
    uy = _phi2u(phi_m)
    uy = uy - jnp.floor(uy)
    return wm, theta_m, ux, uy


def _gather_fr(data: DJData, p, t, ux, uy):
    H, W = data.fr.shape[2], data.fr.shape[3]
    iy = jnp.clip((uy * H).astype(jnp.int32), 0, H - 1)
    ix = jnp.clip((ux * W).astype(jnp.int32), 0, W - 1)
    return (data.fr[p, t, iy, ix, 0], data.fr[p, t, iy, ix, 1],
            data.fr[p, t, iy, ix, 2]), data.g[p, t, iy, ix]


def _interp_fr(data: DJData, wo: Vec3, ux, uy):
    """(phi_i, theta_i)-bilinear table interpolation at (ux, uy)."""
    lo, hi, w = _theta_bins(data, _elevation(wo))
    plo, phi_, pw = _phi_bins(data, jnp.arctan2(wo.y, wo.x))
    acc = None
    for p, wp in ((plo, 1.0 - pw), (phi_, pw)):
        for t, wt in ((lo, 1.0 - w), (hi, w)):
            (r, g, b), gg = _gather_fr(data, p, t, ux, uy)
            ww = wp * wt if not isinstance(wp, float) else wt * wp
            cur = (r * ww, g * ww, b * ww, gg * ww)
            acc = cur if acc is None else tuple(a + c
                                                for a, c in zip(acc, cur))
        if _isotropic(data):
            break  # single phi slice, weight (1-0) covers it
    return acc


def dj_eval(data: DJData, tint: Color, wi: Vec3, wo: Vec3) -> Color:
    """eval with cos(in) included; wi = light, wo = view (both local)."""
    wm, theta_m, ux, uy = _uwm(data, wo, wi)
    r, g, b, _ = _interp_fr(data, wo, ux, uy)
    cos_i = jnp.maximum(wi.z, 0.0)
    ok = (wi.z > 1e-6) & (wo.z > 1e-6)
    f = jnp.where(ok, cos_i, 0.0)
    return Color(tint.r * r * f, tint.g * g * f, tint.b * b * f)


def _pdf_from_g(data: DJData, g_val, ux, theta_m, wi: Vec3, wm: Vec3):
    sin_m = jnp.sin(theta_m)
    jac = jnp.maximum(TWO_PI_SQ * ux * sin_m, 1e-6) * 4.0 \
        * jnp.maximum(wi.x * wm.x + wi.y * wm.y + wi.z * wm.z, 1e-6)
    return safe_div(g_val, jac)


def dj_pdf(data: DJData, wi: Vec3, wo: Vec3):
    wm, theta_m, ux, uy = _uwm(data, wo, wi)
    _, _, _, g_val = _interp_fr(data, wo, ux, uy)
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
    plo, phi_, pw = _phi_bins(data, jnp.arctan2(wo.y, wo.x))
    # stochastic node pick = linear interpolation in expectation; reuse u0
    # for both axes (standard CDF-rescaling trick keeps them independent)
    t = jnp.where(u0 < w, hi, lo)
    u0b = jnp.where(u0 < w, safe_div(u0, jnp.maximum(w, 1e-9)),
                    safe_div(u0 - w, jnp.maximum(1.0 - w, 1e-9)))
    p = jnp.where(u0b < pw, phi_, plo)
    T = data.theta_nodes.shape[0]
    H = data.marg_cdf.shape[-1]
    uy = _sample_rows(data.marg_cdf.reshape(-1, H), p * T + t, u1)
    iy = jnp.clip((uy * H).astype(jnp.int32), 0, H - 1)
    ux = _sample_rows(data.cond_cdf.reshape(-1, data.cond_cdf.shape[-1]),
                      (p * T + t) * H + iy, u2)
    theta_m = _u2theta(ux)
    phi_m = _u2phi(uy)
    if _isotropic(data):
        phi_m = phi_m + jnp.arctan2(wo.y, wo.x)
    sin_m = jnp.sin(theta_m)
    wm = Vec3(jnp.cos(phi_m) * sin_m, jnp.sin(phi_m) * sin_m,
              jnp.cos(theta_m))
    d = 2.0 * (wo.x * wm.x + wo.y * wm.y + wo.z * wm.z)
    wi = Vec3(wm.x * d - wo.x, wm.y * d - wo.y, wm.z * d - wo.z)

    r, g, b, g_val = _interp_fr(data, wo, ux, uy)
    pdf = _pdf_from_g(data, g_val, ux, theta_m, wo, wm)
    valid = (wi.z > 1e-6) & (wo.z > 1e-6) & (pdf > 1e-9)
    cos_i = jnp.maximum(wi.z, 0.0)
    s = jnp.where(valid, safe_div(cos_i, pdf), 0.0)
    weight = Color(tint.r * r * s, tint.g * g * s, tint.b * b * s)
    return wi, pdf, weight, valid
