"""Adaptive environment path tracer ("aept").

Implements "Adaptive Environment Sampling on CPU and GPU" (Atanasov et al.,
SIGGRAPH Talks 2018) following the reference
/root/reference/src/artic/technique/adaptive_env_pathtracer.art and
src/runtime/technique/AdaptiveEnvPathTechnique.cpp:

1. Learning pass (first `learning_iterations`, framebuffer locked): a plain
   path tracer records, for each env-map hit reached through at least one
   "smooth" bounce, the path luminance into a 4D histogram
   [grid(dir from camera to last rough vertex) x tile(outgoing dir)].
2. The histogram becomes per-grid-cell 2D CDFs — here one vectorized
   cumsum/normalize instead of the reference's hand-rolled GPU loops.
3. Sampling pass: at each non-delta vertex with enough learned samples the
   bounce direction is drawn from the guiding CDF with probability 0.75,
   otherwise from the BSDF; both are combined by the one-sample MIS mix pdf.

NEE defaults to OFF for this technique (AdaptiveEnvPathTechnique.cpp:18).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng as rnglib
from ..core.frame import make_frame
from ..core.vec import (Color, Vec3, black, color_max_component, cselect, dot,
                        normalize, safe_div, vselect, white)
from ..core.warp import dir_from_spherical, spherical_from_dir
from ..models import bsdf as bsdflib
from ..models import light as lightlib
from ..ops.intersect import FLT_MAX, Rays
from ..scenedata import RenderSettings, SceneData
from .path import (OFFSET, _cadd_where, _handle_color, _infinite_rows,
                   apply_normal_map, compute_surface, gather_material,
                   make_surface_ctx, trace_scene)

GRID_X, GRID_Y = 50, 100    # adaptive_env_pathtracer.art:16-17
TILE_X, TILE_Y = 32, 16     # :18-19
AE_PROB = 0.75              # :462
MIN_COUNT = 100             # guiding enabled once a cell saw >100 samples
SMOOTH_PDF = jnp.pi         # is_smooth(pdf) = pdf < pi (:233)

N_GRID = GRID_X * GRID_Y
N_TILE = TILE_X * TILE_Y


class Guiding(NamedTuple):
    cond_cdf: jnp.ndarray   # [N_GRID*TILE_Y, TILE_X] inclusive row CDF
    marg_cdf: jnp.ndarray   # [N_GRID, TILE_Y] inclusive CDF
    count: jnp.ndarray      # [N_GRID] learning sample count


def _grid_cell(pos: Vec3, cam_pos: Vec3):
    d = Vec3(pos.x - cam_pos.x, pos.y - cam_pos.y, pos.z - cam_pos.z)
    dn = normalize(d)
    theta, phi = spherical_from_dir(dn)
    gx = jnp.clip((GRID_X * phi / (2.0 * jnp.pi)).astype(jnp.int32),
                  0, GRID_X - 1)
    gy = jnp.clip((GRID_Y * theta / jnp.pi).astype(jnp.int32), 0, GRID_Y - 1)
    return gy * GRID_X + gx


def _tile_cell(d: Vec3):
    theta, phi = spherical_from_dir(d)
    tx = jnp.clip((TILE_X * phi / (2.0 * jnp.pi)).astype(jnp.int32),
                  0, TILE_X - 1)
    ty = jnp.clip((TILE_Y * theta / jnp.pi).astype(jnp.int32), 0, TILE_Y - 1)
    return ty * TILE_X + tx


def _tile_uv(d: Vec3):
    theta, phi = spherical_from_dir(d)
    return phi / (2.0 * jnp.pi), theta / jnp.pi


# --------------------------------------------------------------------------
# Learning pass
# --------------------------------------------------------------------------

class _LearnState(NamedTuple):
    org: Vec3
    dir: Vec3
    tmin: jnp.ndarray
    tmax: jnp.ndarray
    rng: jnp.ndarray
    contrib: Color
    eta: jnp.ndarray
    last_pos: Vec3
    last_dir: Vec3
    has_rough: jnp.ndarray
    alive: jnp.ndarray
    depth: jnp.ndarray
    sample: jnp.ndarray
    hist_sum: jnp.ndarray   # [N_GRID * N_TILE]
    hist_cnt: jnp.ndarray   # [N_GRID * N_TILE] (f32 counts)


def learn_trace(scene: SceneData, settings: RenderSettings, x, y, iteration,
                frame, eval_texture=None):
    """One learning iteration; returns (hist_sum, hist_cnt) increments."""
    from ..core.sampler import sample_pixel_offsets
    from ..models import camera as cameralib
    n = x.shape
    cam_pos = scene.camera.eye

    def fresh(sample):
        st = rnglib.seed(sample.astype(jnp.uint32),
                         iteration.astype(jnp.uint32),
                         frame.astype(jnp.uint32), x.astype(jnp.uint32),
                         y.astype(jnp.uint32), jnp.uint32(settings.seed))
        sample_idx = iteration.astype(jnp.uint32) \
            * jnp.uint32(settings.spi) + sample.astype(jnp.uint32)
        st, (rx, ry) = sample_pixel_offsets(settings.pixel_sampler, st,
                                            sample_idx, x, y)
        return st, cameralib.generate_rays(scene.camera, settings, x, y,
                                           rx, ry, rng_state=st)

    rng0, rays0 = fresh(jnp.zeros(n, jnp.uint32))
    zv = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
    init = _LearnState(org=rays0.org, dir=rays0.dir, tmin=rays0.tmin,
                       tmax=rays0.tmax, rng=rng0, contrib=white(n),
                       eta=jnp.ones(n), last_pos=zv, last_dir=zv,
                       has_rough=jnp.zeros(n, bool),
                       alive=jnp.ones(n, bool),
                       depth=jnp.ones(n, jnp.int32),
                       sample=jnp.zeros(n, jnp.int32),
                       hist_sum=jnp.zeros(N_GRID * N_TILE),
                       hist_cnt=jnp.zeros(N_GRID * N_TILE))

    def bounce(state: _LearnState) -> _LearnState:
        rays_b = Rays(state.org, state.dir, state.tmin, state.tmax)
        hit = trace_scene(scene, rays_b)
        found = hit.prim >= 0

        # env miss: record into the histogram (:246)
        miss = state.alive & ~found
        lum = jnp.zeros(n)
        any_inf = False
        for lid in _infinite_rows(scene, settings):
            lp = lightlib.gather_light(scene.lights,
                                       jnp.full(n, lid, jnp.int32))
            emit = lightlib.env_emission(scene, lp, state.dir, eval_texture)
            c = _handle_color(state.contrib.cmul(emit), settings)
            lum = lum + jnp.where(miss & ~lp.delta,
                                  (c.r + c.g + c.b) / 3.0, 0.0)
            any_inf = True
        hist_sum, hist_cnt = state.hist_sum, state.hist_cnt
        if any_inf:
            record = miss & state.has_rough & (state.depth > 1)
            cell = (_grid_cell(state.last_pos, cam_pos) * N_TILE
                    + _tile_cell(state.last_dir))
            cell = jnp.where(record, cell, 0)
            hist_sum = hist_sum.at[cell].add(
                jnp.where(record, lum / settings.spi, 0.0))
            hist_cnt = hist_cnt.at[cell].add(
                jnp.where(record, 1.0, 0.0))

        # surface bounce (plain PT, no NEE in learning: :231)
        active = state.alive & found
        surf = compute_surface(scene, rays_b, hit)
        sctx = (make_surface_ctx(scene, rays_b, surf, eval_texture)
                if eval_texture is not None else None)
        mat = gather_material(scene, surf, eval_texture, sctx)
        out_dir = -state.dir
        mid = scene.entities.mat[jnp.clip(surf.ent, 0, None)]
        surf = apply_normal_map(scene, settings, surf, sctx, eval_texture,
                                mid)
        frame_l = make_frame(surf.ns)
        shader = bsdflib.make_lane_shader(scene.materials, mid, mat, frame_l,
                                          surf.is_entering,
                                          settings.has_blend, None,
                                          settings.bsdf_kinds,
                                          measured=scene.measured)
        rng, (b_pick, b0, b1, b2, b_rr) = rnglib.next_f32_n(state.rng, 5)
        bs = shader.sample(out_dir, b_pick, b0, b1, b2)
        new_contrib = state.contrib.cmul(bs.weight)
        rr_c = color_max_component(new_contrib) * state.eta * state.eta
        rr_prob = jnp.clip(rr_c, 0.05, 0.95)
        rr_prob = jnp.where(state.depth + 1 > settings.min_depth, rr_prob, 1.0)
        cont = (active & bs.valid & (b_rr < rr_prob) & (bs.pdf > 1e-9)
                & (state.depth + 1 <= settings.max_depth))
        new_contrib = new_contrib * (1.0 / rr_prob)
        smooth = ~bs.is_delta & (bs.pdf < SMOOTH_PDF)

        st = _LearnState(
            org=surf.point, dir=bs.in_dir,
            tmin=jnp.broadcast_to(OFFSET, n), tmax=jnp.full(n, FLT_MAX),
            rng=rng,
            contrib=cselect(cont, new_contrib, state.contrib),
            eta=jnp.where(cont, state.eta * bs.eta, state.eta),
            last_pos=vselect(smooth, surf.point, state.last_pos),
            last_dir=vselect(smooth, bs.in_dir, state.last_dir),
            has_rough=state.has_rough | (cont & smooth),
            alive=cont, depth=state.depth + 1, sample=state.sample,
            hist_sum=hist_sum, hist_cnt=hist_cnt)

        died = state.alive & ~cont
        do_regen = died & (state.sample + 1 < settings.spi)
        new_sample = jnp.where(do_regen, state.sample + 1, state.sample)
        rng2, cam_rays = fresh(new_sample.astype(jnp.uint32))
        return _LearnState(
            org=vselect(do_regen, cam_rays.org, st.org),
            dir=vselect(do_regen, cam_rays.dir, st.dir),
            tmin=jnp.where(do_regen, cam_rays.tmin, st.tmin),
            tmax=jnp.where(do_regen, cam_rays.tmax, st.tmax),
            rng=jnp.where(do_regen, rng2, st.rng),
            contrib=cselect(do_regen, white(n), st.contrib),
            eta=jnp.where(do_regen, 1.0, st.eta),
            last_pos=st.last_pos, last_dir=st.last_dir,
            has_rough=jnp.where(do_regen, False, st.has_rough),
            alive=st.alive | do_regen,
            depth=jnp.where(do_regen, 1, st.depth),
            sample=new_sample,
            hist_sum=st.hist_sum, hist_cnt=st.hist_cnt)

    max_iters = settings.spi * settings.max_depth

    def cond(carry):
        it, s = carry
        return (it < max_iters) & jnp.any(s.alive)

    def body(carry):
        it, s = carry
        return (it + 1, bounce(s))

    _, final = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    return final.hist_sum, final.hist_cnt


def build_guiding(hist_sum: jnp.ndarray, hist_cnt: jnp.ndarray) -> Guiding:
    """CDF construction (aept_handle_after_iteration_learning), vectorized."""
    mean = jnp.where(hist_cnt > 0, hist_sum / jnp.maximum(hist_cnt, 1.0), 0.0)
    w = mean.reshape(N_GRID, TILE_Y, TILE_X)
    cond_sum = jnp.cumsum(w, axis=-1)
    row_tot = cond_sum[..., -1:]
    uniform_x = (jnp.arange(1, TILE_X + 1, dtype=jnp.float32) / TILE_X)
    cond_cdf = jnp.where(row_tot > 1e-9, cond_sum / jnp.maximum(row_tot, 1e-30),
                         uniform_x[None, None, :])
    cond_cdf = cond_cdf.at[..., -1].set(1.0)

    marg_sum = jnp.cumsum(row_tot[..., 0], axis=-1)
    tot = marg_sum[..., -1:]
    uniform_y = (jnp.arange(1, TILE_Y + 1, dtype=jnp.float32) / TILE_Y)
    marg_cdf = jnp.where(tot > 1e-9, marg_sum / jnp.maximum(tot, 1e-30),
                         uniform_y[None, :])
    marg_cdf = marg_cdf.at[..., -1].set(1.0)

    count = hist_cnt.reshape(N_GRID, N_TILE).sum(axis=-1)
    return Guiding(cond_cdf=cond_cdf.reshape(N_GRID * TILE_Y, TILE_X),
                   marg_cdf=marg_cdf, count=count)


# --------------------------------------------------------------------------
# Guided sampling helpers
# --------------------------------------------------------------------------

def _row_pdf_gather(cdf_rows, row_idx, col_idx):
    prev = jnp.where(col_idx > 0,
                     cdf_rows[row_idx, jnp.maximum(col_idx - 1, 0)], 0.0)
    return cdf_rows[row_idx, col_idx] - prev


def guiding_pdf(g: Guiding, cell, d: Vec3):
    """Solid-angle pdf of the guided distribution at direction d."""
    u, v = _tile_uv(d)
    tx = jnp.clip((u * TILE_X).astype(jnp.int32), 0, TILE_X - 1)
    ty = jnp.clip((v * TILE_Y).astype(jnp.int32), 0, TILE_Y - 1)
    p_y = _row_pdf_gather(g.marg_cdf, cell, ty) * TILE_Y
    p_x = _row_pdf_gather(g.cond_cdf, cell * TILE_Y + ty, tx) * TILE_X
    p_sq = p_y * p_x
    sin_t = jnp.sin(v * jnp.pi)
    return safe_div(p_sq, sin_t * jnp.pi * jnp.pi * 2.0)


def _sample_row(cdf_rows, row_idx, u):
    """Inverse-CDF sample within each lane's row; returns (idx, cont_u, pdf)."""
    ncols = cdf_rows.shape[-1]
    rows = cdf_rows[row_idx]                            # [n, ncols]
    idx = jnp.sum((rows < u[:, None]).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 0, ncols - 1)
    lane = jnp.arange(row_idx.shape[0])
    hi = rows[lane, idx]
    lo = jnp.where(idx > 0, rows[lane, jnp.maximum(idx - 1, 0)], 0.0)
    p = jnp.maximum(hi - lo, 1e-12)
    frac = jnp.clip((u - lo) / p, 0.0, 1.0)
    cont = (idx.astype(jnp.float32) + frac) / ncols
    return idx, cont, p * ncols


def guiding_sample(g: Guiding, cell, u0, u1):
    """Draw a direction from the per-cell CDF; returns (dir, solid pdf)."""
    ty, vy, py = _sample_row(g.marg_cdf, cell, u0)
    tx, vx, px = _sample_row(g.cond_cdf, cell * TILE_Y + ty, u1)
    theta = vy * jnp.pi
    phi = vx * 2.0 * jnp.pi
    d = dir_from_spherical(theta, phi)
    sin_t = jnp.sin(theta)
    pdf = safe_div(py * px, sin_t * jnp.pi * jnp.pi * 2.0)
    return d, pdf


# --------------------------------------------------------------------------
# Sampling pass
# --------------------------------------------------------------------------

class _SampState(NamedTuple):
    org: Vec3
    dir: Vec3
    tmin: jnp.ndarray
    tmax: jnp.ndarray
    rng: jnp.ndarray
    contrib: Color
    inv_pdf: jnp.ndarray
    eta: jnp.ndarray
    alive: jnp.ndarray
    result: Color
    depth: jnp.ndarray
    sample: jnp.ndarray


def sample_trace(scene: SceneData, settings: RenderSettings, x, y, iteration,
                 frame, guiding: Guiding, eval_texture=None) -> Color:
    """Guided path tracing pass (make_adaptive_env_sampling_path_renderer),
    persistent-lane progressive."""
    from ..core.sampler import sample_pixel_offsets
    from ..models import camera as cameralib
    n = x.shape
    cam_pos = scene.camera.eye

    def fresh(sample):
        st = rnglib.seed(sample.astype(jnp.uint32),
                         iteration.astype(jnp.uint32),
                         frame.astype(jnp.uint32), x.astype(jnp.uint32),
                         y.astype(jnp.uint32), jnp.uint32(settings.seed))
        sample_idx = iteration.astype(jnp.uint32) \
            * jnp.uint32(settings.spi) + sample.astype(jnp.uint32)
        st, (rx, ry) = sample_pixel_offsets(settings.pixel_sampler, st,
                                            sample_idx, x, y)
        return st, cameralib.generate_rays(scene.camera, settings, x, y,
                                           rx, ry, rng_state=st)

    rng0, rays0 = fresh(jnp.zeros(n, jnp.uint32))
    init = _SampState(org=rays0.org, dir=rays0.dir, tmin=rays0.tmin,
                      tmax=rays0.tmax, rng=rng0, contrib=white(n),
                      inv_pdf=jnp.zeros(n), eta=jnp.ones(n),
                      alive=jnp.ones(n, bool), result=black(n),
                      depth=jnp.ones(n, jnp.int32),
                      sample=jnp.zeros(n, jnp.int32))

    def bounce(state: _SampState) -> _SampState:
        rays_b = Rays(state.org, state.dir, state.tmin, state.tmax)
        hit = trace_scene(scene, rays_b)
        found = hit.prim >= 0
        result = state.result

        # miss: env at FULL weight — AEPT has no NEE (reference
        # adaptive_env_pathtracer.art:237 "TODO: NEE"; its on_miss adds
        # contrib*emit undiscounted), and the guided-vs-BSDF mixture pdf is
        # already folded into the bounce weight, so an env-pdf MIS factor
        # here would double-count a strategy that never runs
        miss = state.alive & ~found
        for lid in _infinite_rows(scene, settings):
            lp = lightlib.gather_light(scene.lights,
                                       jnp.full(n, lid, jnp.int32))
            emit = lightlib.env_emission(scene, lp, state.dir, eval_texture)
            c = _handle_color(state.contrib.cmul(emit), settings)
            result = _cadd_where(miss & ~lp.delta, result, c)

        active = state.alive & found
        surf = compute_surface(scene, rays_b, hit)
        sctx = (make_surface_ctx(scene, rays_b, surf, eval_texture)
                if eval_texture is not None else None)
        mat = gather_material(scene, surf, eval_texture, sctx)
        out_dir = -state.dir
        mid = scene.entities.mat[jnp.clip(surf.ent, 0, None)]
        surf = apply_normal_map(scene, settings, surf, sctx, eval_texture,
                                mid)
        frame_l = make_frame(surf.ns)
        shader = bsdflib.make_lane_shader(scene.materials, mid, mat, frame_l,
                                          surf.is_entering,
                                          settings.has_blend, None,
                                          settings.bsdf_kinds,
                                          measured=scene.measured)
        all_delta = shader.is_all_delta()

        # emission on hit
        light_row = scene.entities.light[jnp.clip(surf.ent, 0, None)]
        is_emissive = light_row >= 0
        lp_hit = lightlib.gather_light(scene.lights,
                                       jnp.clip(light_row, 0, None))
        cos_l = -dot(state.dir, frame_l.n)
        emit_ok = active & is_emissive & surf.is_entering & (cos_l > 1e-6)
        # full weight: BSDF/guided sampling is the only strategy hitting
        # emitters (no NEE in this technique), so no MIS discount applies
        c_emit = _handle_color(state.contrib.cmul(lp_hit.intensity),
                               settings)
        result = _cadd_where(emit_ok, result, c_emit)

        cell = _grid_cell(surf.point, cam_pos)
        ae_prob = jnp.where(all_delta | (guiding.count[cell] <= MIN_COUNT),
                            0.0, AE_PROB)

        rng, (u_sel, b_pick, b0, b1, b2, b_rr) = rnglib.next_f32_n(state.rng,
                                                                  6)
        use_guide = u_sel < ae_prob

        # branch A: guided direction
        gdir, gpdf = guiding_sample(guiding, cell, b0, b1)
        f_g = shader.eval(gdir, out_dir)
        p_bsdf_g = shader.pdf(gdir, out_dir)
        mix_g = (1.0 - ae_prob) * p_bsdf_g + ae_prob * gpdf
        w_g = Color(safe_div(f_g.r, mix_g), safe_div(f_g.g, mix_g),
                    safe_div(f_g.b, mix_g))
        ok_g = p_bsdf_g > 1e-9

        # branch B: BSDF sample, reweighted by the mix pdf
        bs = shader.sample(out_dir, b_pick, b0, b1, b2)
        gpdf_b = guiding_pdf(guiding, cell, bs.in_dir)
        mix_b = (1.0 - ae_prob) * bs.pdf + ae_prob * gpdf_b
        scale_b = jnp.where(bs.is_delta, 1.0, safe_div(bs.pdf, mix_b))
        w_b = Color(bs.weight.r * scale_b, bs.weight.g * scale_b,
                    bs.weight.b * scale_b)

        new_dir = vselect(use_guide, gdir, bs.in_dir)
        weight = cselect(use_guide, w_g, w_b)
        mix_pdf = jnp.where(use_guide, mix_g, mix_b)
        valid = jnp.where(use_guide, ok_g, bs.valid)
        new_eta = jnp.where(use_guide, 1.0, bs.eta)
        is_delta = jnp.where(use_guide, False, bs.is_delta)

        new_contrib = state.contrib.cmul(weight)
        rr_c = color_max_component(new_contrib) * state.eta * state.eta
        rr_prob = jnp.clip(rr_c, 0.05, 0.95)
        rr_prob = jnp.where(state.depth + 1 > settings.min_depth, rr_prob, 1.0)
        cont = (active & valid & (b_rr < rr_prob) & (mix_pdf > 1e-9)
                & (state.depth + 1 <= settings.max_depth))
        new_contrib = new_contrib * (1.0 / rr_prob)
        new_inv_pdf = jnp.where(is_delta, 0.0,
                                safe_div(1.0, rr_prob * mix_pdf))

        st = _SampState(
            org=surf.point, dir=new_dir,
            tmin=jnp.broadcast_to(OFFSET, n), tmax=jnp.full(n, FLT_MAX),
            rng=rng,
            contrib=cselect(cont, new_contrib, state.contrib),
            inv_pdf=jnp.where(cont, new_inv_pdf, state.inv_pdf),
            eta=jnp.where(cont, state.eta * new_eta, state.eta),
            alive=cont, result=result, depth=state.depth + 1,
            sample=state.sample)

        died = state.alive & ~cont
        do_regen = died & (state.sample + 1 < settings.spi)
        new_sample = jnp.where(do_regen, state.sample + 1, state.sample)
        rng2, cam_rays = fresh(new_sample.astype(jnp.uint32))
        return _SampState(
            org=vselect(do_regen, cam_rays.org, st.org),
            dir=vselect(do_regen, cam_rays.dir, st.dir),
            tmin=jnp.where(do_regen, cam_rays.tmin, st.tmin),
            tmax=jnp.where(do_regen, cam_rays.tmax, st.tmax),
            rng=jnp.where(do_regen, rng2, st.rng),
            contrib=cselect(do_regen, white(n), st.contrib),
            inv_pdf=jnp.where(do_regen, 0.0, st.inv_pdf),
            eta=jnp.where(do_regen, 1.0, st.eta),
            alive=st.alive | do_regen, result=st.result,
            depth=jnp.where(do_regen, 1, st.depth),
            sample=new_sample)

    max_iters = settings.spi * settings.max_depth

    def cond(carry):
        it, s = carry
        return (it < max_iters) & jnp.any(s.alive)

    def body(carry):
        it, s = carry
        return (it + 1, bounce(s))

    _, final = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    return final.result
