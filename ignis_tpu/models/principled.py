"""Disney-style principled BSDF.

Faithful re-implementation of the reference principled kernel
(/root/reference/src/artic/bsdf/principled.art): Burley diffuse + retro +
optional thin subsurface, sheen, GGX specular reflection with Disney fresnel
(dielectric/metallic lerp), GGX specular transmission, clearcoat; lobe
selection probabilities per calcLobeDistribution. alpha = roughness^2
(min 1e-3). All math in the local shading frame, batched per lane.

Material slots (scenedata.Materials for kind PRINCIPLED):
  base   = base_color
  extra2 = (flatness, diffuse_transmission, thin flag)
  p0=reflective_ior p1=refractive_ior p2=roughness_u p3=roughness_v
  q0=metallic q1=specular_transmission q2=specular_tint q3=sheen
  q4=sheen_tint q5=clearcoat q6=clearcoat_gloss q7=clearcoat_roughness
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import microfacet as mf
from ..core.fresnel import fresnel_dielectric
from ..core.vec import (Color, Vec3, black, clerp, cselect, dot, luminance,
                        normalize, reflect, safe_div, vselect)
from ..core.warp import INV_PI, cosine_hemisphere_pdf, sample_cosine_hemisphere

GRAZE = 1e-5
MICRO_EPS = 1e-5


class PrincipledParams(NamedTuple):
    base: Color
    refl_eta: jnp.ndarray   # n1/n2 along propagation (like reference _eta)
    refr_eta: jnp.ndarray
    refl_ior: jnp.ndarray
    refr_ior: jnp.ndarray
    au: jnp.ndarray
    av: jnp.ndarray
    metallic: jnp.ndarray
    spec_trans: jnp.ndarray
    spec_tint: jnp.ndarray
    sheen: jnp.ndarray
    sheen_tint: jnp.ndarray
    clearcoat: jnp.ndarray
    cc_gloss: jnp.ndarray
    cc_rough: jnp.ndarray
    flatness: jnp.ndarray
    diff_trans: jnp.ndarray
    thin: jnp.ndarray


def unpack(mat, is_entering) -> PrincipledParams:
    thin = mat.extra2.b > 0.5
    refl_ior = jnp.maximum(mat.p0, 1.01)
    refr_ior = jnp.maximum(mat.p1, 1.01)
    ent = is_entering | thin
    return PrincipledParams(
        base=mat.base,
        refl_eta=jnp.where(ent, 1.0 / refl_ior, refl_ior),
        refr_eta=jnp.where(ent, 1.0 / refr_ior, refr_ior),
        refl_ior=refl_ior, refr_ior=refr_ior,
        au=jnp.maximum(1e-3, jnp.maximum(mat.p2, 1e-3) ** 2),
        av=jnp.maximum(1e-3, jnp.maximum(mat.p3, 1e-3) ** 2),
        metallic=jnp.clip(mat.q0, 0.0, 1.0),
        spec_trans=jnp.clip(mat.q1, 0.0, 1.0),
        spec_tint=mat.q2, sheen=mat.q3, sheen_tint=mat.q4,
        clearcoat=mat.q5, cc_gloss=mat.q6, cc_rough=mat.q7,
        flatness=mat.extra2.r, diff_trans=jnp.clip(mat.extra2.g, 0.0, 1.0),
        thin=thin)


def _schlick_approx(c):
    m = jnp.clip(1.0 - c, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def _schlick_r0(eta):
    r = (1.0 - eta) / (1.0 + eta)
    return r * r


def _tint_color(c: Color) -> Color:
    lum = luminance(c)
    inv = jnp.where(lum > 1e-6, safe_div(1.0, lum), 1.0)
    one = jnp.ones_like(lum)
    return cselect(lum > 1e-6, c * inv, Color(one, one, one))


def _refr_alpha(p: PrincipledParams):
    """getRefractionMicro: thin remaps roughness."""
    scale = jnp.clip((0.65 * p.refr_ior - 0.35), 0.0, 1.0)
    au = jnp.where(p.thin, jnp.clip(scale * p.au, 1e-3, 1.0), p.au)
    av = jnp.where(p.thin, jnp.clip(scale * p.av, 1e-3, 1.0), p.av)
    return au, av


def _disney_fresnel(p: PrincipledParams, h: Vec3, wo: Vec3, wi: Vec3) -> Color:
    hdv = jnp.abs(dot(wo, h))
    hdl = jnp.abs(dot(wi, h))
    f1 = fresnel_dielectric(p.refl_eta, hdv).factor
    f1c = Color(f1, f1, f1)
    tint = _tint_color(p.base)
    one = jnp.ones_like(f1)
    a = clerp(Color(one, one, one), tint, p.spec_tint)
    r0 = clerp(a * _schlick_r0(p.refl_eta), p.base, p.metallic)
    s = _schlick_approx(hdl)
    f2 = Color(r0.r + (1.0 - r0.r) * s, r0.g + (1.0 - r0.g) * s,
               r0.b + (1.0 - r0.b) * s)
    out = clerp(f1c, f2, p.metallic)
    ok = (hdv * hdl) > 1e-6
    return cselect(ok, out, black(f1.shape))


def _eval_diffuse(p: PrincipledParams, wi: Vec3, wo: Vec3):
    andl = jnp.abs(wi.z)
    andv = jnp.abs(wo.z)
    lk = _schlick_approx(andl)
    vk = _schlick_approx(andv)
    diff = (1.0 - 0.5 * lk) * (1.0 - 0.5 * vk)
    vdl = jnp.abs(dot(wi, wo))
    rr = (vdl + 1.0) * (jnp.sqrt(p.au) + jnp.sqrt(p.av)) / 2.0
    retro = rr * (lk + vk + lk * vk * (rr - 1.0))
    # thin subsurface
    h = normalize(wi + wo)
    hdl = dot(wi, h)
    fss90 = hdl * hdl * jnp.sqrt(p.au * p.av)
    fss = (1.0 - lk + fss90 * lk) * (1.0 - vk + fss90 * vk)
    ss_term = 1.25 * (fss * (1.0 / (andl + andv + 1e-5) - 0.5) + 0.5)
    ss = jnp.where(p.thin, 1.0 - p.flatness + ss_term * p.flatness, 1.0)
    return INV_PI * (diff + retro) * ss * andl


def _eval_sheen(p: PrincipledParams, wi: Vec3) -> Color:
    lk = _schlick_approx(jnp.abs(wi.z))
    one = jnp.ones_like(lk)
    stc = clerp(Color(one, one, one), _tint_color(p.base), p.sheen_tint)
    return stc * (p.sheen * lk * jnp.abs(wi.z))


def _eval_reflection(p: PrincipledParams, wi: Vec3, wo: Vec3, h: Vec3) -> Color:
    F = _disney_fresnel(p, h, wo, wi)
    D = mf.ndf_ggx(h, p.au, p.av)
    G = mf.g_separable(wi, wo, p.au, p.av)
    jac = mf.reflective_jacobian(wo.z)
    return F * jnp.abs(D * G * jac)


def _eval_refraction(p: PrincipledParams, wi: Vec3, wo: Vec3, h: Vec3) -> Color:
    au, av = _refr_alpha(p)
    hdi = dot(wi, h)
    hdo = dot(wo, h)
    F = fresnel_dielectric(p.refr_eta, jnp.abs(hdo)).factor
    D = mf.ndf_ggx(h, au, av)
    G = mf.g_separable(wi, wo, au, av)
    jac = mf.refractive_jacobian(p.refr_eta, hdi, hdo)
    norm = jnp.abs(safe_div(hdo * jac, wo.z))
    # radiance-mode (eta_i/eta_t)^2 compression on transmission (see
    # models/bsdf.py dielectric; matches the Mitsuba/Radiance goldens)
    term = (1.0 - F) * D * G * norm * (p.refr_eta * p.refr_eta)
    # thin: simple fresnel-based pass-through
    ft = fresnel_dielectric(p.refr_eta, jnp.abs(wo.z)).factor
    ft = ft + (1.0 - ft) * ft / (ft + 1.0)
    term = jnp.where(p.thin, 1.0 - ft, term)
    col = cselect(p.thin,
                  Color(jnp.sqrt(jnp.maximum(p.base.r, 0.0)),
                        jnp.sqrt(jnp.maximum(p.base.g, 0.0)),
                        jnp.sqrt(jnp.maximum(p.base.b, 0.0))),
                  p.base)
    return col * term


def _eval_clearcoat(p: PrincipledParams, wi: Vec3, wo: Vec3, h: Vec3) -> Color:
    F0, R = 0.04, 0.25
    r2 = jnp.maximum(0.001, p.cc_rough * (1.0 - p.cc_gloss) + 0.01 * p.cc_gloss)
    ahdl = jnp.abs(dot(wi, h))
    d = mf.ndf_ggx(h, r2, r2)
    f = F0 + (1.0 - F0) * _schlick_approx(ahdl)
    g = mf.g1_smith(wi, R, R) * mf.g1_smith(wo, R, R)
    jac = mf.reflective_jacobian(wo.z)
    v = jnp.abs(R * d * f * g * jac * wi.z)
    return Color(v, v, v)


def _halfway(p: PrincipledParams, wi: Vec3, wo: Vec3):
    is_trans = (wi.z * wo.z) < 0.0
    h_r = normalize(wi + wo)
    h_t = normalize(wi + wo * p.refr_eta)
    h = vselect(is_trans, h_t, h_r)
    # make_same_hemisphere(wo, h)
    flip = jnp.sign(h.z * wo.z)
    flip = jnp.where(flip == 0, 1.0, flip)
    return Vec3(h.x * flip, h.y * flip, h.z * flip), is_trans


def eval_principled(mat, is_entering, wi: Vec3, wo: Vec3) -> Color:
    p = unpack(mat, is_entering)
    h, is_trans = _halfway(p, wi, wo)
    andl = jnp.abs(wi.z)

    diffuse_weight = jnp.where(p.thin, 1.0, 1.0 - p.metallic) * (1.0 - p.spec_trans)
    trans_weight = (1.0 - p.metallic) * p.spec_trans

    refl = (p.base * (_eval_diffuse(p, wi, wo) * diffuse_weight)
            + _eval_sheen(p, wi) * diffuse_weight
            + _eval_reflection(p, wi, wo, h)
            + _eval_clearcoat(p, wi, wo, h) * p.clearcoat)
    # translucency + refraction
    trans = (p.base * (jnp.where(p.thin, 1.0, 0.0) * p.diff_trans
                       * _eval_translucent(wi, wo))
             + _eval_refraction(p, wi, wo, h) * trans_weight)
    out = cselect(is_trans, trans, refl)
    return cselect(andl > GRAZE, out, black(andl.shape))


def _eval_translucent(wi: Vec3, wo: Vec3):
    lk = _schlick_approx(jnp.abs(wi.z))
    vk = _schlick_approx(jnp.abs(wo.z))
    return INV_PI * (1.0 - 0.5 * lk) * (1.0 - 0.5 * vk) * jnp.abs(wi.z)


def _lobe_distribution(p: PrincipledParams, wo: Vec3):
    abs_gen = luminance(p.base)
    abs_spec = 1.0 + (luminance(_tint_color(p.base)) - 1.0) * p.spec_tint
    diff_refl = jnp.clip(abs_gen * (1.0 - p.metallic) * (1.0 - p.spec_trans), 0, 1)
    F = fresnel_dielectric(p.refr_eta, jnp.abs(wo.z)).factor
    spec_refl = jnp.clip(abs_spec * (1.0 - F) + F, 0, 1)
    diff_trans = jnp.clip(abs_gen * p.diff_trans * diff_refl, 0, 1)
    spec_trans = jnp.clip((1.0 - F) * abs_gen * (1.0 - p.metallic) * p.spec_trans, 0, 1)
    has_t = (p.diff_trans > 0) | (p.spec_trans > 0)
    diff_trans = jnp.where(has_t, diff_trans, 0.0)
    spec_trans = jnp.where(has_t, spec_trans, 0.0)
    norm = diff_refl + spec_refl + diff_trans + spec_trans
    ok = norm > 1e-6
    inv = safe_div(1.0, norm)
    one = jnp.ones_like(norm)
    return (jnp.where(ok, diff_refl * inv, one),
            jnp.where(ok, diff_trans * inv, 0.0),
            jnp.where(ok, spec_refl * inv, 0.0),
            jnp.where(ok, spec_trans * inv, 0.0))


def _spec_refl_pdf(p: PrincipledParams, wi: Vec3, wo: Vec3):
    pwo = _pos_hemi(wo)
    pwi = _pos_hemi(wi)
    h = normalize(pwi + pwo)
    pdf_h = mf.pdf_vndf_ggx(pwo, h, p.au, p.av)
    pdf_h = jnp.where(pdf_h > MICRO_EPS, pdf_h, 0.0)
    return jnp.abs(pdf_h * mf.reflective_jacobian(dot(pwo, h)))


def _spec_trans_pdf(p: PrincipledParams, wi: Vec3, wo: Vec3):
    au, av = _refr_alpha(p)
    pwo = _pos_hemi(wo)
    pwi = -_pos_hemi(wi)
    h = normalize(pwi + pwo * p.refr_eta)
    pdf_h = mf.pdf_vndf_ggx(pwo, h, au, av)
    pdf_h = jnp.where(pdf_h > MICRO_EPS, pdf_h, 0.0)
    return jnp.abs(pdf_h * mf.refractive_jacobian(p.refr_eta, dot(pwi, h),
                                                  dot(pwo, h)))


def _pos_hemi(v: Vec3) -> Vec3:
    s = jnp.sign(v.z)
    s = jnp.where(s == 0, 1.0, s)
    return Vec3(v.x * s, v.y * s, v.z * s)


def pdf_principled(mat, is_entering, wi: Vec3, wo: Vec3):
    p = unpack(mat, is_entering)
    dr, dt, sr, st = _lobe_distribution(p, wo)
    diff_pdf = cosine_hemisphere_pdf(jnp.abs(wi.z))
    same = (wi.z * wo.z) >= 0.0
    pdf_same = dr * diff_pdf + sr * _spec_refl_pdf(p, wi, wo)
    pdf_thin = dt * diff_pdf + st
    pdf_trans = dt * diff_pdf + st * _spec_trans_pdf(p, wi, wo)
    out = jnp.where(same, pdf_same, jnp.where(p.thin, pdf_thin, pdf_trans))
    graze = (jnp.abs(wi.z) <= GRAZE) | (jnp.abs(wo.z) <= GRAZE)
    return jnp.where(graze, 0.0, out)


def sample_principled(mat, is_entering, wo: Vec3, u0, u1, u2):
    """Returns (wi_local, pdf, eta, valid). Weight is eval/pdf (caller)."""
    p = unpack(mat, is_entering)
    dr, dt, sr, st = _lobe_distribution(p, wo)
    pwo = _pos_hemi(wo)

    # All candidates are built in pwo (positive-hemisphere) space and mapped
    # back by full-vector flip, matching make_same_hemisphere semantics.
    flip = jnp.sign(wo.z)
    flip = jnp.where(flip == 0, 1.0, flip)

    # candidate: cosine hemisphere (diffuse refl/trans)
    cdir, cpdf = sample_cosine_hemisphere(u1, u2)
    wi_dr = cdir * flip           # same hemisphere as wo
    wi_dt = cdir * (-flip)        # opposite hemisphere

    # candidate: GGX reflection
    h_r = mf.sample_vndf_ggx(pwo, p.au, p.av, u1, u2)
    pwi_r = reflect(pwo, h_r)
    wi_sr = pwi_r * flip
    # candidate: GGX transmission
    au_t, av_t = _refr_alpha(p)
    h_t = mf.sample_vndf_ggx(pwo, au_t, av_t, u1, u2)
    cos_h_o = dot(h_t, pwo)
    frt = fresnel_dielectric(p.refr_eta, jnp.abs(cos_h_o))
    refr = Vec3(h_t.x * (p.refr_eta * cos_h_o - frt.cos_t) - pwo.x * p.refr_eta,
                h_t.y * (p.refr_eta * cos_h_o - frt.cos_t) - pwo.y * p.refr_eta,
                h_t.z * (p.refr_eta * cos_h_o - frt.cos_t) - pwo.z * p.refr_eta)
    refr = normalize(refr)
    # TIR -> reflect instead
    tir_dir = reflect(pwo, h_t)
    pwi_t = vselect(frt.total, tir_dir, refr)
    wi_st = vselect(p.thin, -wo, pwi_t * flip)

    # lobe pick
    c1 = dr
    c2 = dr + dt
    c3 = dr + dt + st
    pick_dr = u0 < c1
    pick_dt = (~pick_dr) & (u0 < c2)
    pick_st = (~pick_dr) & (~pick_dt) & (u0 < c3)
    pick_sr = (~pick_dr) & (~pick_dt) & (~pick_st)

    wi = vselect(pick_dr, wi_dr,
                 vselect(pick_dt, wi_dt,
                         vselect(pick_st, wi_st, wi_sr)))
    pdf = pdf_principled(mat, is_entering, wi, wo)
    same = (wi.z * wo.z) >= 0.0
    eta = jnp.where(p.thin | same, 1.0, p.refr_eta)
    valid = (pdf > 1e-7) & (jnp.abs(wo.z) > GRAZE) & jnp.isfinite(pdf)
    return wi, pdf, eta, valid
