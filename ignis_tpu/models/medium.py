"""Participating media: homogeneous transmittance, distance sampling, phase.

Mirrors /root/reference/src/artic/medium/homogeneous.art and
phase/henyeygreenstein.art, including the reference's estimator choices
(min-channel exponential distance sampling; surface branch keeps full Tr).
Medium id -1 = vacuum.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.frame import make_frame
from ..core.vec import Color, Vec3, color, min_component, safe_div
from ..core.warp import INV_4PI, TWO_PI
from ..scenedata import Media


class MediumParams(NamedTuple):
    sigma_a: Color
    sigma_s: Color
    sigma_t: Color
    g: jnp.ndarray
    vacuum: jnp.ndarray  # bool
    scattering: jnp.ndarray  # bool: any sigma_s


def gather_medium(media: Media, idx) -> MediumParams:
    n_med = media.g.shape[0]
    safe = jnp.clip(idx, 0, max(n_med - 1, 0))
    g = lambda a: a[safe]
    sa = Color(g(media.sigma_a.r), g(media.sigma_a.g), g(media.sigma_a.b))
    ss = Color(g(media.sigma_s.r), g(media.sigma_s.g), g(media.sigma_s.b))
    vac = idx < 0
    zero = jnp.zeros_like(sa.r)
    sa = Color(jnp.where(vac, zero, sa.r), jnp.where(vac, zero, sa.g),
               jnp.where(vac, zero, sa.b))
    ss = Color(jnp.where(vac, zero, ss.r), jnp.where(vac, zero, ss.g),
               jnp.where(vac, zero, ss.b))
    st = sa + ss
    scat = (ss.r + ss.g + ss.b) > 1e-4
    return MediumParams(sa, ss, st, g(media.g), vac, scat)


def params_from_state(sa: Color, ss: Color, g, medium_id) -> MediumParams:
    """Per-lane medium params carried in the path state (sigma evaluated at
    the medium entry surface, supporting PExpr sigmas)."""
    vac = medium_id < 0
    zero = jnp.zeros_like(sa.r)
    sa = Color(jnp.where(vac, zero, sa.r), jnp.where(vac, zero, sa.g),
               jnp.where(vac, zero, sa.b))
    ss = Color(jnp.where(vac, zero, ss.r), jnp.where(vac, zero, ss.g),
               jnp.where(vac, zero, ss.b))
    st = sa + ss
    scat = (ss.r + ss.g + ss.b) > 1e-4
    return MediumParams(sa, ss, st, g, vac, scat)


def eval_medium_at(media: Media, settings, medium_id, sctx, n):
    """Evaluate per-medium sigma/g at a surface context: PExpr closures from
    settings.medium_exprs override the constant table."""
    base = gather_medium(media, medium_id)
    sa, ss, g = base.sigma_a, base.sigma_s, base.g
    exprs = getattr(settings, "medium_exprs", ())
    for mi, entry in enumerate(exprs):
        if entry is None:
            continue
        fn_a, fn_s = entry
        m = medium_id == mi
        if fn_a is not None:
            r, gg, b = fn_a(sctx)
            sa = Color(jnp.where(m, r, sa.r), jnp.where(m, gg, sa.g),
                       jnp.where(m, b, sa.b))
        if fn_s is not None:
            r, gg, b = fn_s(sctx)
            ss = Color(jnp.where(m, r, ss.r), jnp.where(m, gg, ss.g),
                       jnp.where(m, b, ss.b))
    return sa, ss, g


# Distances reaching transmittance can be FLT_MAX (infinite lights, miss
# lanes). exp(-sigma*d) is saturated long before d = 1e8, but the VJP
# d/dsigma = -d * exp(-sigma*d) carries the RAW distance: at 3.4e38 the
# sigma cotangents (the med_sa/med_ss carry of the differentiable scan)
# overflow to inf under fusion and poison the whole backward pass.
_TR_DIST_CAP = 1e8


def transmittance(med: MediumParams, dist) -> Color:
    d = jnp.minimum(dist, _TR_DIST_CAP)
    return Color(jnp.exp(-med.sigma_t.r * d),
                 jnp.exp(-med.sigma_t.g * d),
                 jnp.exp(-med.sigma_t.b * d))


def sigma_t_pivot(med: MediumParams):
    """Min-channel extinction used for distance sampling + its channel."""
    st = med.sigma_t
    p = jnp.minimum(st.r, jnp.minimum(st.g, st.b))
    return p


def tr_at_pivot(med: MediumParams, dist):
    return jnp.exp(-sigma_t_pivot(med) * jnp.minimum(dist, _TR_DIST_CAP))


class MediumSample(NamedTuple):
    valid: jnp.ndarray
    t: jnp.ndarray
    weight: Color  # Tr / pdf


def sample_distance(med: MediumParams, dist, u) -> MediumSample:
    """Distance sampling along a segment of length `dist`
    (homogeneous.art sample)."""
    eps = 1e-3
    stp = jnp.maximum(sigma_t_pivot(med), 1e-8)
    ndist = jnp.minimum(dist, -jnp.log(1.0 - u * 0.99999) / stp)
    reach_surface = jnp.abs(dist - ndist) <= eps
    tr = transmittance(med, ndist)
    trp = tr_at_pivot(med, ndist)
    pdf = trp * stp
    w = Color(safe_div(tr.r, pdf), safe_div(tr.g, pdf), safe_div(tr.b, pdf))
    valid = (~reach_surface) & med.scattering & (~med.vacuum)
    return MediumSample(valid, ndist, w)


# -- Henyey-Greenstein phase -------------------------------------------------

def hg_pdf(g, cos_theta):
    d = 1.0 + g * g - 2.0 * g * cos_theta
    return INV_4PI * safe_div(1.0 - g * g, d * jnp.sqrt(jnp.maximum(d, 1e-12)))


def sample_hg(g, out_dir: Vec3, u0, u1):
    """Sample incoming direction; weight == 1 (pdf == phase). Direction
    convention matches phase.art: cos relative to -out_dir (forward)."""
    small = jnp.abs(g) < 1e-3
    cos_uniform = 1.0 - 2.0 * u0
    sq = safe_div(1.0 - g * g, 1.0 + g - 2.0 * g * u0)
    cos_hg = safe_div(1.0 + g * g - sq * sq, 2.0 * g)
    cos_theta = jnp.where(small, cos_uniform, jnp.clip(cos_hg, -1.0, 1.0))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = TWO_PI * u1
    frame = make_frame(-out_dir)
    local = Vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
    d = frame.to_world(local)
    pdf = jnp.where(small, INV_4PI, hg_pdf(g, cos_theta))
    return d, pdf
