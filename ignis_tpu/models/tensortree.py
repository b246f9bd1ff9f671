"""TensorTree measured BSDF evaluation (reference: bsdf/tensortree.art).

The variable-depth tensor tree was baked to dense grids at load time
(scene/tensortree.py); eval is a nearest-cell gather over the Shirley-Chiu
parameter square (3D isotropic / 4D anisotropic). Frame and sampling follow
the Klems model (cosine hemisphere + side pick by component totals), which
is also what the reference ships (tensortree.art:308, "TODO: Add proper
sampling!"). Peak extraction (use_peakextraction) is not implemented.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vec import Color, Vec2, Vec3, safe_div, vselect
from ..core.warp import cosine_hemisphere_pdf, sample_cosine_hemisphere


class TTComponentData(NamedTuple):
    grid: jnp.ndarray    # res^ndim dense bake
    total: jnp.ndarray   # scalar


class TensorTreeData(NamedTuple):
    front_reflection: TTComponentData
    back_reflection: TTComponentData
    front_transmission: TTComponentData
    back_transmission: TTComponentData


def from_numpy(t) -> TensorTreeData:
    def comp(c):
        return TTComponentData(jnp.asarray(c.grid), jnp.float32(c.total))
    return TensorTreeData(comp(t.front_reflection),
                          comp(t.back_reflection),
                          comp(t.front_transmission),
                          comp(t.back_transmission))


def _disk_to_square(x, y):
    """concentric_disk_to_square (warp.art:24) -> [0,1]^2."""
    quadrant = jnp.abs(x) > jnp.abs(y)
    r_sign = jnp.where(quadrant, x, y)
    r = jnp.copysign(jnp.sqrt(x * x + y * y), r_sign)
    phi = jnp.arctan2(y * jnp.sign(r_sign), x * jnp.sign(r_sign))
    c = 4.0 * phi / jnp.pi
    t = jnp.where(quadrant, c, 2.0 - c) * r
    a = jnp.where(quadrant, r, t)
    b = jnp.where(quadrant, t, r)
    return (a + 1.0) * 0.5, (b + 1.0) * 0.5


def _positive(v: Vec3) -> Vec3:
    flip = jnp.where(v.z >= 0, 1.0, -1.0)
    return Vec3(v.x * flip, v.y * flip, v.z * flip)


def _negative(v: Vec3) -> Vec3:
    p = _positive(v)
    return Vec3(-p.x, -p.y, -p.z)


def _eval_component(comp: TTComponentData, ndim: int, wi: Vec3, wo: Vec3):
    """tt_eval_component: grid gather at the mapped parameter point;
    includes |cos wi|."""
    ox, oy = _disk_to_square(wo.x, wo.y)
    if ndim == 3:
        in_t = (0.5 - 1e-6) - 0.5 * jnp.sqrt(wi.x * wi.x + wi.y * wi.y)
        coords = (in_t, ox, oy)
    else:
        ix, iy = _disk_to_square(-wi.x, -wi.y)
        coords = (ix, iy, ox, oy)
    idx = []
    for ax, c in enumerate(coords):
        res = comp.grid.shape[ax]
        idx.append(jnp.clip((c * res).astype(jnp.int32), 0, res - 1))
    return comp.grid[tuple(idx)] * jnp.abs(wi.z)


def _eval_factor(tt: TensorTreeData, wi: Vec3, wo: Vec3):
    """Quadrant dispatch (tensortree.art:246) with hemisphere remaps."""
    # ndim is static via the baked grid's rank
    nd = tt.front_reflection.grid.ndim
    f_rr = _eval_component(tt.front_reflection, nd, _positive(wi),
                           _positive(wo))
    f_ft = _eval_component(tt.front_transmission, nd, _negative(wi),
                           _positive(wo))
    f_bt = _eval_component(tt.back_transmission, nd, _negative(wi),
                           _positive(wo))
    f_br = _eval_component(tt.back_reflection, nd, _negative(wi),
                           _negative(wo))
    in_front = wi.z > 0
    out_front = wo.z > 0
    ok = (jnp.abs(wi.z) > 1e-6) & (jnp.abs(wo.z) > 1e-6)
    f = jnp.where(in_front,
                  jnp.where(out_front, f_rr, f_ft),
                  jnp.where(out_front, f_bt, f_br))
    return jnp.where(ok, f, 0.0)


def _refl_prob(tt: TensorTreeData, wo_z):
    fp = safe_div(tt.front_reflection.total,
                  tt.front_reflection.total + tt.back_transmission.total)
    bp = safe_div(tt.back_reflection.total,
                  tt.back_reflection.total + tt.front_transmission.total)
    return jnp.where(wo_z > 0, fp, bp)


def tt_eval(tt: TensorTreeData, base_color: Color, kframe, in_dir: Vec3,
            out_dir: Vec3) -> Color:
    wi = kframe.to_local(in_dir)
    wo = kframe.to_local(out_dir)
    f = _eval_factor(tt, wi, wo)
    return Color(base_color.r * f, base_color.g * f, base_color.b * f)


def tt_pdf(tt: TensorTreeData, kframe, in_dir: Vec3, out_dir: Vec3):
    wi = kframe.to_local(in_dir)
    wo = kframe.to_local(out_dir)
    rp = _refl_prob(tt, wo.z)
    same = (wi.z * wo.z) > 0
    prob = jnp.where(same, rp, 1.0 - rp)
    return prob * cosine_hemisphere_pdf(jnp.abs(wi.z))


def tt_sample(tt: TensorTreeData, base_color: Color, kframe, out_dir: Vec3,
              u0, u1, u2):
    wo = kframe.to_local(out_dir)
    cdir, cpdf = sample_cosine_hemisphere(u1, u2)
    rp = _refl_prob(tt, wo.z)
    pick_refl = (rp > 0) & (u0 < rp)
    same_side = Vec3(cdir.x, cdir.y,
                     jnp.where(wo.z >= 0, cdir.z, -cdir.z))
    wi = vselect(pick_refl, same_side, -same_side)
    prob = jnp.where(pick_refl, rp, 1.0 - rp)
    pdf = prob * cpdf
    f = _eval_factor(tt, wi, wo)
    w = safe_div(f, pdf)
    weight = Color(base_color.r * w, base_color.g * w, base_color.b * w)
    return kframe.to_world(wi), pdf, weight, pdf > 1e-9
