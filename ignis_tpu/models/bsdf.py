"""BSDF evaluation / sampling / pdf with masked type dispatch.

The reference JIT-compiles one specialized hit-shader per material
(/root/reference/src/runtime/shader/HitShader.cpp:16) and sorts rays by
material. On TPU we instead evaluate every BSDF *kind* present in the scene
for every lane with VPU masks and select — uniform control flow, no sorting,
no divergence; XLA fuses the whole dispatch into one kernel.

Semantics mirror /root/reference/src/artic/bsdf/*.art:
  - eval(in_dir, out_dir) includes the cosine term
  - sample() returns weight = eval/pdf (cosine included), eta ratio, delta flag
  - delta BSDFs have eval = 0, pdf = 0
"""
from __future__ import annotations

from enum import IntEnum
from typing import NamedTuple

import jax.numpy as jnp

from ..core import fresnel as fr
from ..core.frame import Frame
from ..core.vec import (Color, Vec3, Vec2, black, cselect, dot, gray, normalize,
                        reflect, vselect)
from ..core.warp import (INV_PI, cosine_hemisphere_pdf, sample_cosine_hemisphere,
                         sample_cosine_power_hemisphere, cosine_power_hemisphere_pdf)

EPS = 1e-6


class BsdfKind(IntEnum):
    DIFFUSE = 0        # base=reflectance, p1=roughness (Oren-Nayar alpha)
    DIELECTRIC = 1     # base=spec_reflectance, extra=spec_transmittance,
                       # p0=ext_ior, p1=int_ior, p2=roughness, p3=thin
    CONDUCTOR = 2      # base=spec_reflectance, extra=eta, extra2=k, p2=roughness
    PASSTHROUGH = 3
    PHONG = 4          # base=spec_reflectance, p0=exponent
    PLASTIC = 5        # base=diffuse_reflectance, extra=spec_reflectance, p0/p1 ior
    PRINCIPLED = 6
    NULL_ERROR = 7     # error BSDF: renders pink (reference ErrorBSDF)


class MatParams(NamedTuple):
    """Per-lane material parameters (gathered from the Materials table,
    possibly overridden by texture lookups)."""
    kind: jnp.ndarray
    base: Color
    extra: Color
    extra2: Color
    p0: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    p3: jnp.ndarray


class BsdfSample(NamedTuple):
    in_dir: Vec3
    pdf: jnp.ndarray
    weight: Color      # eval/pdf with cosine (reference: "color")
    eta: jnp.ndarray
    is_delta: jnp.ndarray
    valid: jnp.ndarray


def _oren_nayar_eval(kd: Color, alpha, n: Vec3, in_dir: Vec3, out_dir: Vec3):
    a2 = alpha * alpha
    p1 = jnp.maximum(dot(in_dir, n), 0.0)
    p2 = jnp.maximum(dot(out_dir, n), 0.0)
    s = -p1 * p2 + jnp.maximum(dot(out_dir, in_dir), 0.0)
    t = jnp.where(s <= EPS, 1.0, jnp.maximum(EPS, jnp.maximum(p1, p2)))
    A = 1.0 - 0.5 * a2 / (a2 + 0.33)
    B = 0.45 * a2 / (a2 + 0.09)
    C = 0.17 * a2 / (a2 + 0.13)
    fac = (A + B * s / t) * INV_PI
    return Color(kd.r * fac + kd.r * kd.r * C * INV_PI,
                 kd.g * fac + kd.g * kd.g * C * INV_PI,
                 kd.b * fac + kd.b * kd.b * C * INV_PI) * p1


def _diffuse_eval(mat: MatParams, frame: Frame, in_dir: Vec3, out_dir: Vec3) -> Color:
    n = frame.n
    cos_i = jnp.maximum(dot(in_dir, n), 0.0)
    lam = mat.base * (cos_i * INV_PI)
    use_on = mat.p1 > EPS
    on = _oren_nayar_eval(mat.base, mat.p1, n, in_dir, out_dir)
    return cselect(use_on, on, lam)


def _phong_eval(mat: MatParams, frame: Frame, in_dir: Vec3, out_dir: Vec3) -> Color:
    # reference bsdf/phong.art: ks * (n+2)/(2pi) * cos(refl,in)^n * cos_i
    n = frame.n
    cos_i = jnp.maximum(dot(in_dir, n), 0.0)
    r = reflect(out_dir, n)
    c = jnp.maximum(dot(r, in_dir), 0.0)
    k = mat.p0
    f = jnp.power(c, k) * (k + 2.0) * (0.5 * INV_PI) * cos_i
    return mat.base * f


def eval_bsdf(mat: MatParams, frame: Frame, is_entering, in_dir: Vec3,
              out_dir: Vec3) -> Color:
    """f(in, out) * cos(in, n). Delta kinds evaluate to 0."""
    res = black(mat.p0.shape)
    kinds = mat.kind
    res = cselect(kinds == BsdfKind.DIFFUSE,
                  _diffuse_eval(mat, frame, in_dir, out_dir), res)
    res = cselect(kinds == BsdfKind.PHONG,
                  _phong_eval(mat, frame, in_dir, out_dir), res)
    res = cselect(kinds == BsdfKind.PLASTIC,
                  _plastic_eval(mat, frame, in_dir, out_dir), res)
    res = cselect(kinds == BsdfKind.NULL_ERROR,
                  Color(jnp.maximum(dot(in_dir, frame.n), 0.0) * INV_PI,
                        jnp.zeros_like(mat.p0),
                        jnp.maximum(dot(in_dir, frame.n), 0.0) * INV_PI), res)
    return res


def pdf_bsdf(mat: MatParams, frame: Frame, is_entering, in_dir: Vec3,
             out_dir: Vec3) -> jnp.ndarray:
    pdf = jnp.zeros(mat.p0.shape, jnp.float32)
    cos_i = jnp.maximum(dot(in_dir, frame.n), 0.0)
    kinds = mat.kind
    cos_pdf = cosine_hemisphere_pdf(cos_i)
    pdf = jnp.where(kinds == BsdfKind.DIFFUSE, cos_pdf, pdf)
    pdf = jnp.where(kinds == BsdfKind.NULL_ERROR, cos_pdf, pdf)
    pdf = jnp.where(kinds == BsdfKind.PLASTIC, _plastic_pdf(mat, frame, in_dir, out_dir), pdf)
    r = reflect(out_dir, frame.n)
    c = jnp.maximum(dot(r, in_dir), 0.0)
    pdf = jnp.where(kinds == BsdfKind.PHONG,
                    cosine_power_hemisphere_pdf(c, mat.p0), pdf)
    return pdf


def is_all_delta(mat: MatParams) -> jnp.ndarray:
    k = mat.kind
    delta = (k == BsdfKind.PASSTHROUGH)
    smooth_diel = (k == BsdfKind.DIELECTRIC) & (mat.p2 <= EPS)
    smooth_cond = (k == BsdfKind.CONDUCTOR) & (mat.p2 <= EPS)
    return delta | smooth_diel | smooth_cond


# ---------------------------------------------------------------------------
# Plastic: diffuse base + smooth dielectric coating
# (reference bsdf/plastic.art simplified: fresnel-weighted lobes)
# ---------------------------------------------------------------------------

def _plastic_fresnel(mat: MatParams, cos_o):
    k = mat.p0 / jnp.maximum(mat.p1, 1e-6)  # ext/int
    return fr.fresnel_dielectric(k, jnp.maximum(cos_o, 0.0)).factor


def _plastic_eval(mat: MatParams, frame: Frame, in_dir: Vec3, out_dir: Vec3) -> Color:
    n = frame.n
    cos_i = jnp.maximum(dot(in_dir, n), 0.0)
    cos_o = jnp.maximum(dot(out_dir, n), 0.0)
    fi = _plastic_fresnel(mat, cos_i)
    fo = _plastic_fresnel(mat, cos_o)
    return mat.base * ((1.0 - fi) * (1.0 - fo) * cos_i * INV_PI)


def _plastic_pdf(mat: MatParams, frame: Frame, in_dir: Vec3, out_dir: Vec3):
    cos_i = jnp.maximum(dot(in_dir, frame.n), 0.0)
    cos_o = jnp.maximum(dot(out_dir, frame.n), 0.0)
    fo = _plastic_fresnel(mat, cos_o)
    return (1.0 - fo) * cosine_hemisphere_pdf(cos_i)


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def sample_bsdf(mat: MatParams, frame: Frame, is_entering, out_dir: Vec3,
                u0, u1, u2) -> BsdfSample:
    """Masked-dispatch sample. u0..u2: uniforms in [0,1)."""
    shape = mat.p0.shape
    n = frame.n
    kinds = mat.kind
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)

    # --- diffuse-like cosine lobe (diffuse, error) -------------------------
    ldir, cpdf = sample_cosine_hemisphere(u1, u2)
    gdir = frame.to_world(ldir)
    diff_sample = BsdfSample(gdir, cpdf, mat.base, one, zero > 1, cpdf > 0)

    # --- phong -------------------------------------------------------------
    pk = mat.p0
    pdir_l, ppdf = sample_cosine_power_hemisphere(pk, u1, u2)
    r = reflect(out_dir, n)
    rframe = Frame(*_frame_cols(r))
    pdir = rframe.to_world(pdir_l)
    p_cos = jnp.maximum(dot(pdir, n), 0.0)
    p_eval = _phong_eval(mat, frame, pdir, out_dir)
    p_w = cselect(ppdf > EPS, p_eval * (1.0 / jnp.maximum(ppdf, EPS)), black(shape))
    phong_sample = BsdfSample(pdir, ppdf, p_w, one, zero > 1,
                              (ppdf > EPS) & (p_cos > 0))

    # --- smooth dielectric -------------------------------------------------
    k_ratio = jnp.where(is_entering, mat.p0 / jnp.maximum(mat.p1, 1e-6),
                        mat.p1 / jnp.maximum(mat.p0, 1e-6))
    cos_o = dot(out_dir, n)
    f = fr.fresnel_dielectric(k_ratio, jnp.maximum(cos_o, 0.0))
    refr_dir = n * (k_ratio * cos_o - f.cos_t) - out_dir * k_ratio
    refl_dir = reflect(out_dir, n)
    choose_refl = (u0 <= f.factor)
    d_dir = vselect(choose_refl, refl_dir, refr_dir)
    d_w = cselect(choose_refl, mat.base, mat.extra)
    d_eta = jnp.where(choose_refl, one, k_ratio)
    # Thin approximation (p3 != 0): refraction = passthrough
    thin = mat.p3 > 0.5
    kt = mat.p0 / jnp.maximum(mat.p1, 1e-6)
    ft = fr.fresnel_dielectric(kt, jnp.abs(cos_o)).factor
    ft = ft + (1.0 - ft) * ft / (ft + 1.0)
    thin_refl = (u0 <= ft)
    d_dir = vselect(thin, vselect(thin_refl, refl_dir, -out_dir), d_dir)
    d_w = cselect(thin, cselect(thin_refl, mat.base, mat.extra), d_w)
    d_eta = jnp.where(thin, one, d_eta)
    diel_sample = BsdfSample(d_dir, one, d_w, d_eta, zero < 1, one > 0)

    # --- smooth conductor / mirror ----------------------------------------
    c_cos = jnp.maximum(cos_o, 0.0)
    c_f = fr.fresnel_conductor(mat.extra, mat.extra2, c_cos)
    cond_w = mat.base.cmul(c_f)
    cond_sample = BsdfSample(refl_dir, one, cond_w, one, zero < 1, cos_o > 0)

    # --- passthrough -------------------------------------------------------
    pass_sample = BsdfSample(-out_dir, one, Color(one, one, one), one,
                             zero < 1, one > 0)

    # --- plastic -----------------------------------------------------------
    fo = _plastic_fresnel(mat, jnp.maximum(cos_o, 0.0))
    pl_refl = u0 <= fo
    pl_dir = vselect(pl_refl, refl_dir, gdir)
    pl_pdf = jnp.where(pl_refl, fo, (1.0 - fo) * cpdf)
    pl_w = cselect(pl_refl, Color(one, one, one), mat.base)
    plastic_sample = BsdfSample(pl_dir, pl_pdf, pl_w, one, pl_refl,
                                pl_pdf > 0)

    def sel(kind_val, s: BsdfSample, cur: BsdfSample) -> BsdfSample:
        m = kinds == kind_val
        return BsdfSample(vselect(m, s.in_dir, cur.in_dir),
                          jnp.where(m, s.pdf, cur.pdf),
                          cselect(m, s.weight, cur.weight),
                          jnp.where(m, s.eta, cur.eta),
                          jnp.where(m, s.is_delta, cur.is_delta),
                          jnp.where(m, s.valid, cur.valid))

    out = diff_sample
    out = sel(BsdfKind.PHONG, phong_sample, out)
    out = sel(BsdfKind.DIELECTRIC, diel_sample, out)
    out = sel(BsdfKind.CONDUCTOR, cond_sample, out)
    out = sel(BsdfKind.PASSTHROUGH, pass_sample, out)
    out = sel(BsdfKind.PLASTIC, plastic_sample, out)
    out = sel(BsdfKind.NULL_ERROR,
              BsdfSample(diff_sample.in_dir, diff_sample.pdf,
                         Color(one, zero, one), one, zero > 1,
                         diff_sample.valid), out)
    return out


def _frame_cols(n: Vec3):
    from ..core.frame import make_frame
    f = make_frame(n)
    return f.t, f.b, f.n
