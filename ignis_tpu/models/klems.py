"""Klems measured BSDF evaluation (reference: src/artic/bsdf/klems.art).

The model is four patch-to-patch scattering matrices (front/back x
reflection/transmission) over the Klems hemisphere bases. Directions map to
basis entries by theta-ring search + phi arithmetic; eval is one matrix
gather.

Sampling importance-samples the scattering matrices: pick the patch of the
unknown direction from the solid-angle-weighted CDF of the matrix slice
fixed by the known direction (the CDF build the reference prepares in
KlemsLoader.h:126-179 buildCDF_Rowwise/Colwise but leaves disabled in
klems.art:224 behind a FIXME, falling back to cosine sampling), then a
uniform solid-angle point inside the patch. For the near-specular "through"
matrices this collapses the variance by orders of magnitude. The patch
solid angle cancels in the pdf: pdf(dir) = pick_prob * M[r,c] / sum_slice.

The model operates in the Radiance-style frame built from the UNFLIPPED
surface normal and the user "up" vector (klems.art:207); unlike the
reference we normalize the tangent axes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vec import Color, Vec3, cross, dot, normalize, safe_div, vselect
from ..core.warp import TWO_PI, spherical_from_dir


class KlemsBasisData(NamedTuple):
    lower: jnp.ndarray      # [T]
    upper: jnp.ndarray      # [T]
    phi_count: jnp.ndarray  # [T] f32
    lin_off: jnp.ndarray    # [T] f32
    entry_ring: jnp.ndarray  # [E] int32: theta-ring index of each entry


class KlemsComponentData(NamedTuple):
    row: KlemsBasisData
    col: KlemsBasisData
    matrix: jnp.ndarray     # [R, C]
    total: jnp.ndarray      # scalar
    # Patch-CDF tables (KlemsLoader.h buildCDF_Colwise/Rowwise): entries
    # weighted by the sampled patch's solid angle, normalized per slice
    cdf_rows: jnp.ndarray   # [C, R] cumulative over rows r for fixed col
    sum_rows: jnp.ndarray   # [C] slice magnitudes (0 = empty slice)
    cdf_cols: jnp.ndarray   # [R, C] cumulative over cols c for fixed row
    sum_cols: jnp.ndarray   # [R]


class KlemsData(NamedTuple):
    front_reflection: KlemsComponentData
    back_reflection: KlemsComponentData
    front_transmission: KlemsComponentData
    back_transmission: KlemsComponentData


def _basis_np(b):
    import numpy as np
    ring = np.repeat(np.arange(len(b.phi_count), dtype=np.int32),
                     b.phi_count.astype(np.int64))
    return KlemsBasisData(jnp.asarray(b.lower), jnp.asarray(b.upper),
                          jnp.asarray(b.phi_count.astype("float32")),
                          jnp.asarray(b.lin_off.astype("float32")),
                          jnp.asarray(ring))


def _entry_solid_angles(b):
    import numpy as np
    sa_ring = ((np.cos(b.lower) - np.cos(b.upper)) * 2.0 * np.pi
               / np.maximum(b.phi_count.astype(np.float64), 1))
    ring = np.repeat(np.arange(len(b.phi_count)),
                     b.phi_count.astype(np.int64))
    return sa_ring[ring].astype(np.float32)


def from_numpy(k) -> KlemsData:
    """scene/klems.py KlemsNp -> jnp pytree."""
    import numpy as np

    def comp(c):
        m = np.asarray(c.matrix, np.float64)
        sa_row = _entry_solid_angles(c.row)   # [R]
        sa_col = _entry_solid_angles(c.col)   # [C]
        # sample ROW given fixed column: weight by the row patch solid angle
        w_rows = m * sa_row[:, None]                       # [R, C]
        sum_rows = w_rows.sum(axis=0)                      # [C]
        cdf_rows = np.cumsum(w_rows, axis=0) / np.maximum(
            sum_rows[None, :], 1e-30)
        cdf_rows[-1, :] = 1.0
        # sample COLUMN given fixed row
        w_cols = m * sa_col[None, :]
        sum_cols = w_cols.sum(axis=1)                      # [R]
        cdf_cols = np.cumsum(w_cols, axis=1) / np.maximum(
            sum_cols[:, None], 1e-30)
        cdf_cols[:, -1] = 1.0
        return KlemsComponentData(
            _basis_np(c.row), _basis_np(c.col),
            jnp.asarray(c.matrix), jnp.float32(c.total),
            jnp.asarray(cdf_rows.T.astype(np.float32)),
            jnp.asarray(sum_rows.astype(np.float32)),
            jnp.asarray(cdf_cols.astype(np.float32)),
            jnp.asarray(sum_cols.astype(np.float32)))
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


def _slice_pick(cdf_table, fixed_idx, u):
    """Sample an entry index from one row of a per-slice CDF table."""
    cdf = cdf_table[fixed_idx]                       # [N, E]
    e = jnp.sum(cdf < u[:, None], axis=1)
    return jnp.clip(e, 0, cdf_table.shape[1] - 1)


def _patch_dir(basis: KlemsBasisData, e, xi1, xi2) -> Vec3:
    """Uniform solid-angle point inside patch ``e`` (upper hemisphere).

    Phi segments are centered on p * 2pi/nphi, matching the rounding in
    _basis_index (Klems convention, k_index_of in klems.art)."""
    t = basis.entry_ring[e]
    lo = basis.lower[t]
    up = basis.upper[t]
    nphi = basis.phi_count[t]
    off = basis.lin_off[t]
    p = e.astype(jnp.float32) - off
    phi = (p + xi1 - 0.5) * (TWO_PI / nphi)
    cz = jnp.cos(up) + xi2 * (jnp.cos(lo) - jnp.cos(up))
    sz = jnp.sqrt(jnp.maximum(1.0 - cz * cz, 0.0))
    return Vec3(sz * jnp.cos(phi), sz * jnp.sin(phi), cz)


def _dir_pdf(kd: KlemsData, wi: Vec3, wo: Vec3):
    """Solid-angle pdf of the patch-CDF sampler for direction wi given wo
    (both local). The patch solid angle cancels: density inside patch
    (r, c) = (M[r,c] * sa / sum_slice) / sa = M[r,c] / sum_slice."""
    rp = _refl_prob(kd, wo.z)
    in_f = wi.z > 0
    out_f = wo.z > 0

    fr, bt = kd.front_reflection, kd.back_transmission
    br, ft = kd.back_reflection, kd.front_transmission
    # RR: sampled patch = row(wi), fixed col = k_fi(wo)
    ci = _basis_index(fr.col, *spherical_from_dir(_k_fi(wo)))
    r = _basis_index(fr.row, *spherical_from_dir(wi))
    p_rr = rp * safe_div(fr.matrix[r, ci], fr.sum_rows[ci])
    # BT (wo front, wi back): fixed row = wo, sampled col = -wi
    ro = _basis_index(bt.row, *spherical_from_dir(wo))
    c = _basis_index(bt.col, *spherical_from_dir(-wi))
    p_bt = (1.0 - rp) * safe_div(bt.matrix[ro, c], bt.sum_cols[ro])
    # BR (both back): fixed col = -wo, sampled row = k_bo(wi)
    ci2 = _basis_index(br.col, *spherical_from_dir(-wo))
    r2 = _basis_index(br.row, *spherical_from_dir(_k_bo(wi)))
    p_br = rp * safe_div(br.matrix[r2, ci2], br.sum_rows[ci2])
    # FT (wo back, wi front): fixed row = -wo, sampled col = wi
    ro2 = _basis_index(ft.row, *spherical_from_dir(-wo))
    c2 = _basis_index(ft.col, *spherical_from_dir(wi))
    p_ft = (1.0 - rp) * safe_div(ft.matrix[ro2, c2], ft.sum_cols[ro2])

    return jnp.where(out_f, jnp.where(in_f, p_rr, p_bt),
                     jnp.where(in_f, p_ft, p_br))


def klems_pdf(kd: KlemsData, kframe: KlemsFrame, in_dir: Vec3,
              out_dir: Vec3):
    wi = kframe.to_local(in_dir)
    wo = kframe.to_local(out_dir)
    return _dir_pdf(kd, wi, wo)


def klems_sample(kd: KlemsData, base_color: Color, kframe: KlemsFrame,
                 out_dir: Vec3, u0, u1, u2):
    """Returns (in_dir world, pdf, weight Color, valid).

    Component pick by relative totals (klems.art get_refl_prob), then the
    unknown-direction patch from the matrix slice CDF, then a uniform
    point in the patch. u0 is rescaled after the component pick."""
    wo = kframe.to_local(out_dir)
    rp = _refl_prob(kd, wo.z)
    pick_refl = (rp > 0) & (u0 < rp)
    upick = jnp.clip(jnp.where(pick_refl, safe_div(u0, rp),
                               safe_div(u0 - rp, 1.0 - rp)),
                     0.0, 1.0 - 1e-7)
    out_f = wo.z > 0

    fr, bt = kd.front_reflection, kd.back_transmission
    br, ft = kd.back_reflection, kd.front_transmission
    # RR (wo front, reflect): fixed col k_fi(wo), sample row -> wi upper
    ci_rr = _basis_index(fr.col, *spherical_from_dir(_k_fi(wo)))
    e_rr = _slice_pick(fr.cdf_rows, ci_rr, upick)
    d_rr = _patch_dir(fr.row, e_rr, u1, u2)
    # BT (wo front, transmit): fixed row wo, sample col -> wi = -dir
    ro_bt = _basis_index(bt.row, *spherical_from_dir(wo))
    e_bt = _slice_pick(bt.cdf_cols, ro_bt, upick)
    d_bt = _patch_dir(bt.col, e_bt, u1, u2)
    # BR (wo back, reflect): fixed col -wo, sample row -> wi = k_bo(dir)
    ci_br = _basis_index(br.col, *spherical_from_dir(-wo))
    e_br = _slice_pick(br.cdf_rows, ci_br, upick)
    d_br = _patch_dir(br.row, e_br, u1, u2)
    # FT (wo back, transmit): fixed row -wo, sample col -> wi = dir
    ro_ft = _basis_index(ft.row, *spherical_from_dir(-wo))
    e_ft = _slice_pick(ft.cdf_cols, ro_ft, upick)
    d_ft = _patch_dir(ft.col, e_ft, u1, u2)

    wi = vselect(out_f,
                 vselect(pick_refl, d_rr, -d_bt),
                 vselect(pick_refl, _k_bo(d_br), d_ft))
    pdf = _dir_pdf(kd, wi, wo)
    f = _local_eval_factor(kd, wi, wo) * jnp.abs(wi.z)
    w = safe_div(f, pdf)
    weight = Color(base_color.r * w, base_color.g * w, base_color.b * w)
    return kframe.to_world(wi), pdf, weight, pdf > 1e-9
