"""Klems measured BSDF evaluation (reference: src/artic/bsdf/klems.art).

The model is four patch-to-patch scattering matrices (front/back x
reflection/transmission) over the Klems hemisphere bases. Directions map to
basis entries by theta-ring search + phi arithmetic; eval is one matrix
gather. Sampling follows the reference's shipped sampler: cosine hemisphere
with a side pick by the components' relative totals (klems.art:252 — its
CDF importance sampler is disabled upstream as well).

The model operates in the Radiance-style frame built from the UNFLIPPED
surface normal and the user "up" vector (klems.art:207); unlike the
reference we normalize the tangent axes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vec import Color, Vec3, cross, dot, normalize, safe_div, vselect
from ..core.warp import (cosine_hemisphere_pdf, sample_cosine_hemisphere,
                         spherical_from_dir)


class KlemsBasisData(NamedTuple):
    lower: jnp.ndarray      # [T]
    phi_count: jnp.ndarray  # [T] f32
    lin_off: jnp.ndarray    # [T] f32


class KlemsComponentData(NamedTuple):
    row: KlemsBasisData
    col: KlemsBasisData
    matrix: jnp.ndarray     # [R, C]
    total: jnp.ndarray      # scalar


class KlemsData(NamedTuple):
    front_reflection: KlemsComponentData
    back_reflection: KlemsComponentData
    front_transmission: KlemsComponentData
    back_transmission: KlemsComponentData


def from_numpy(k) -> KlemsData:
    """scene/klems.py KlemsNp -> jnp pytree."""
    def basis(b):
        return KlemsBasisData(jnp.asarray(b.lower),
                              jnp.asarray(b.phi_count.astype("float32")),
                              jnp.asarray(b.lin_off.astype("float32")))

    def comp(c):
        return KlemsComponentData(basis(c.row), basis(c.col),
                                  jnp.asarray(c.matrix),
                                  jnp.float32(c.total))
    return KlemsData(comp(k.front_reflection), comp(k.back_reflection),
                     comp(k.front_transmission), comp(k.back_transmission))


def _basis_index(basis: KlemsBasisData, theta, phi):
    """k_index_of: theta ring by comparison count, phi by rounding."""
    t_idx = jnp.sum(basis.lower[None, :] < theta[:, None], axis=1) - 1
    t_idx = jnp.clip(t_idx, 0, basis.lower.shape[0] - 1)
    nphi = basis.phi_count[t_idx]
    p_idx = jnp.maximum(0, (phi * nphi / (2.0 * jnp.pi) + 0.5)
                        .astype(jnp.int32))
    p_idx = jnp.where(p_idx >= nphi.astype(jnp.int32), 0, p_idx)
    return basis.lin_off[t_idx].astype(jnp.int32) + p_idx


def _eval_component(comp: KlemsComponentData, in_dir: Vec3, out_dir: Vec3):
    ti, pi = spherical_from_dir(in_dir)
    to, po = spherical_from_dir(out_dir)
    ci = _basis_index(comp.col, ti, pi)
    ro = _basis_index(comp.row, to, po)
    return comp.matrix[ro, ci]


class KlemsFrame(NamedTuple):
    right: Vec3
    nup: Vec3
    n: Vec3

    def to_local(self, v: Vec3) -> Vec3:
        return Vec3(dot(self.right, v), dot(self.nup, v), dot(self.n, v))

    def to_world(self, v: Vec3) -> Vec3:
        return Vec3(self.right.x * v.x + self.nup.x * v.y + self.n.x * v.z,
                    self.right.y * v.x + self.nup.y * v.y + self.n.y * v.z,
                    self.right.z * v.x + self.nup.z * v.y + self.n.z * v.z)


def make_klems_frame(frame_n: Vec3, is_entering, up: Vec3) -> KlemsFrame:
    n = vselect(jnp.broadcast_to(is_entering, frame_n.x.shape), frame_n,
                -frame_n)
    right = cross(up, n)
    deg = (right.x * right.x + right.y * right.y
           + right.z * right.z) <= 1e-12
    # degenerate up||n -> identity frame (tt_transform_matrix)
    right = vselect(deg, Vec3(jnp.ones_like(n.x), jnp.zeros_like(n.x),
                              jnp.zeros_like(n.x)), normalize(right))
    nup = vselect(deg, Vec3(jnp.zeros_like(n.x), jnp.ones_like(n.x),
                            jnp.zeros_like(n.x)), normalize(cross(n, right)))
    nn = vselect(deg, Vec3(jnp.zeros_like(n.x), jnp.zeros_like(n.x),
                           jnp.ones_like(n.x)), n)
    return KlemsFrame(right, nup, nn)


def _k_fi(v: Vec3) -> Vec3:
    return Vec3(-v.x, -v.y, v.z)


def _k_bo(v: Vec3) -> Vec3:
    return Vec3(v.x, v.y, -v.z)


def _local_eval_factor(kd: KlemsData, wi: Vec3, wo: Vec3):
    """klems.art local_eval quadrant dispatch; returns scalar factor."""
    in_front = wi.z > 0
    out_front = wo.z > 0
    f_rr = _eval_component(kd.front_reflection, _k_fi(wo), wi)
    f_tt = _eval_component(kd.front_transmission, wi, -wo)
    f_bt = _eval_component(kd.back_transmission, -wi, wo)
    f_br = _eval_component(kd.back_reflection, -wo, _k_bo(wi))
    return jnp.where(in_front,
                     jnp.where(out_front, f_rr, f_tt),
                     jnp.where(out_front, f_bt, f_br))


def _refl_prob(kd: KlemsData, wo_z):
    fp = safe_div(kd.front_reflection.total,
                  kd.front_reflection.total + kd.back_transmission.total)
    bp = safe_div(kd.back_reflection.total,
                  kd.back_reflection.total + kd.front_transmission.total)
    return jnp.where(wo_z > 0, fp, bp)


def klems_eval(kd: KlemsData, base_color: Color, kframe: KlemsFrame,
               in_dir: Vec3, out_dir: Vec3) -> Color:
    wi = kframe.to_local(in_dir)
    wo = kframe.to_local(out_dir)
    f = _local_eval_factor(kd, wi, wo) * jnp.abs(wi.z)
    return Color(base_color.r * f, base_color.g * f, base_color.b * f)


def klems_pdf(kd: KlemsData, kframe: KlemsFrame, in_dir: Vec3,
              out_dir: Vec3):
    wi = kframe.to_local(in_dir)
    wo = kframe.to_local(out_dir)
    rp = _refl_prob(kd, wo.z)
    same = (wi.z * wo.z) > 0
    prob = jnp.where(same, rp, 1.0 - rp)
    return prob * cosine_hemisphere_pdf(jnp.abs(wi.z))


def klems_sample(kd: KlemsData, base_color: Color, kframe: KlemsFrame,
                 out_dir: Vec3, u0, u1, u2):
    """Returns (in_dir world, pdf, weight Color, valid)."""
    wo = kframe.to_local(out_dir)
    cdir, cpdf = sample_cosine_hemisphere(u1, u2)
    rp = _refl_prob(kd, wo.z)
    pick_refl = (rp > 0) & (u0 < rp)
    same_side = Vec3(cdir.x, cdir.y,
                     jnp.where(wo.z >= 0, cdir.z, -cdir.z))
    wi = vselect(pick_refl, same_side, -same_side)
    prob = jnp.where(pick_refl, rp, 1.0 - rp)
    pdf = prob * cpdf
    f = _local_eval_factor(kd, wi, wo) * jnp.abs(wi.z)
    w = safe_div(f, pdf)
    weight = Color(base_color.r * w, base_color.g * w, base_color.b * w)
    return kframe.to_world(wi), pdf, weight, pdf > 1e-9
