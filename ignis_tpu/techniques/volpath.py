"""Volumetric path tracer (homogeneous media).

Mirrors /root/reference/src/artic/technique/volpathtracer.art, including its
estimator choices:
  - per-bounce distance sampling with the min-channel exponential; a medium
    event replaces the surface continuation, surface branch keeps full Tr
  - surface emission/NEE always contribute, weighted by segment transmittance
  - medium interactions scatter by Henyey-Greenstein (weight 1) and flag
    inv_pdf = -1 so the next hit's MIS treats them as non-MIS-able
  - crossing a transmissive surface switches the lane's medium to the
    entity's inner/outer medium
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng as rnglib
from ..core.frame import make_frame
from ..core.vec import (Color, Vec3, black, color_max_component, cselect, dot,
                        safe_div, vselect, white)
from ..models import bsdf as bsdflib
from ..models import light as lightlib
from ..models import medium as medlib
from ..ops.intersect import FLT_MAX, Rays
from ..scenedata import RenderSettings, SceneData
from .path import (OFFSET, _cadd_where, _handle_color, _infinite_rows,
                   apply_normal_map,
                   compute_surface, gather_material, make_surface_ctx,
                   occluded_scene, trace_scene)


class VolPathState(NamedTuple):
    org: Vec3
    dir: Vec3
    tmin: jnp.ndarray
    tmax: jnp.ndarray
    rng: jnp.ndarray
    contrib: Color
    inv_pdf: jnp.ndarray   # < 0 flags a medium interaction
    eta: jnp.ndarray
    medium: jnp.ndarray    # i32 current medium id (-1 vacuum)
    med_sa: Color          # current medium sigma_a (evaluated at entry,
    med_ss: Color          # reference: medium closures see the entry ctx)
    med_g: jnp.ndarray
    alive: jnp.ndarray
    result: Color
    depth: jnp.ndarray     # per-lane path depth (camera segment = 1)
    sample: jnp.ndarray    # per-lane sample counter (regeneration)


def vol_initial_state(rays: Rays, rng_state) -> VolPathState:
    n = rays.tmin.shape
    return VolPathState(
        org=rays.org, dir=rays.dir, tmin=rays.tmin, tmax=rays.tmax,
        rng=rng_state, contrib=white(n), inv_pdf=jnp.zeros(n),
        eta=jnp.ones(n), medium=jnp.full(n, -1, jnp.int32),
        med_sa=black(n), med_ss=black(n), med_g=jnp.zeros(n),
        alive=jnp.ones(n, bool), result=black(n),
        depth=jnp.ones(n, jnp.int32), sample=jnp.zeros(n, jnp.int32))


def make_vol_bounce(scene: SceneData, settings: RenderSettings, n,
                    eval_texture=None, regen=None):
    """Per-bounce volumetric wavefront step; with `regen` dead lanes
    restart their pixel's next sample immediately (persistent-lane
    wavefront, same contract as path.make_bounce)."""
    n_lights = settings.n_lights
    sel_pdf_const = 1.0 / max(n_lights, 1)

    def bounce(state: VolPathState, b):
        # Dead lanes: tmax < tmin culls their traversal at block level
        rays_b = Rays(state.org, state.dir, state.tmin,
                      jnp.where(state.alive, state.tmax, -1.0))
        hit = trace_scene(scene, rays_b)
        found = hit.prim >= 0
        result = state.result
        med = medlib.params_from_state(state.med_sa, state.med_ss,
                                       state.med_g, state.medium)

        mis_inv_pdf = jnp.maximum(state.inv_pdf, 0.0)

        # ---- miss: infinite lights (with eval_inf transmittance) ----------
        miss = state.alive & ~found
        # eval_inf: white only if sigma_t ~ 0 (vacuum), else black
        inf_tr = (med.sigma_t.r + med.sigma_t.g + med.sigma_t.b) <= 1e-4
        for lid in _infinite_rows(scene, settings):
            lp = lightlib.gather_light(scene.lights,
                                       jnp.full(n, lid, jnp.int32))
            emit = lightlib.env_emission(scene, lp, state.dir, eval_texture)
            pdf_s = lightlib.env_pdf_direct(scene, lp, state.dir)
            lsel_pdf = lightlib.selector_pdf(settings, scene.lights,
                                             jnp.full(n, lid, jnp.int32),
                                             state.org)
            mis = (1.0 / (1.0 + mis_inv_pdf * lsel_pdf * pdf_s)
                   if settings.enable_nee else jnp.ones(n))
            c = _handle_color(state.contrib.cmul(emit) * mis, settings)
            result = _cadd_where(miss & ~lp.delta & inf_tr, result, c)

        # ---- hit shading --------------------------------------------------
        active = state.alive & found
        surf = compute_surface(scene, rays_b, hit)
        sctx = make_surface_ctx(scene, rays_b, surf, eval_texture)
        mat = gather_material(scene, surf, eval_texture, sctx)
        out_dir = -state.dir
        mid = scene.entities.mat[jnp.clip(surf.ent, 0, None)]
        surf = apply_normal_map(scene, settings, surf, sctx, eval_texture, mid)
        frame = make_frame(surf.ns)
        w_override = None
        if settings.has_blend and eval_texture is not None:
            p0t = scene.materials.p0_tex[mid]
            wtex = eval_texture(p0t, sctx)
            w_override = jnp.where(p0t >= 0, wtex.r, mat.p0)
        shader = bsdflib.make_lane_shader(scene.materials, mid, mat, frame,
                                          surf.is_entering,
                                          settings.has_blend, w_override,
                                          settings.bsdf_kinds,
                                          measured=scene.measured)
        all_delta = shader.is_all_delta()
        seg_tr = medlib.transmittance(med, jnp.where(found, hit.t, 0.0))

        # Emission on hit
        light_row = scene.entities.light[jnp.clip(surf.ent, 0, None)]
        is_emissive = light_row >= 0
        lp_hit = lightlib.gather_light(scene.lights, jnp.clip(light_row, 0, None))
        cos_l = -dot(state.dir, frame.n)
        emit_ok = active & is_emissive & surf.is_entering & (cos_l > 1e-6)
        pdf_area = safe_div(1.0, lp_hit.p0)
        # Sanitize inputs: hit.t is FLT_MAX on miss lanes and cos_l can be
        # <= 0; inf/nan intermediates poison reverse-mode AD even when the
        # contribution is masked out downstream.
        t_safe = jnp.where(emit_ok, hit.t, 1.0)
        cos_safe = jnp.where(emit_ok, cos_l, 1.0)
        pdf_s = pdf_area * t_safe * t_safe / cos_safe
        esel_pdf = lightlib.selector_pdf(settings, scene.lights,
                                         jnp.clip(light_row, 0, None),
                                         state.org)
        mis_e = (1.0 / (1.0 + mis_inv_pdf * esel_pdf * pdf_s)
                 if settings.enable_nee else jnp.ones(n))
        c_emit = _handle_color(
            state.contrib.cmul(lp_hit.intensity.cmul(seg_tr)) * mis_e, settings)
        result = _cadd_where(emit_ok, result, c_emit)

        rng = state.rng
        depth = state.depth
        was_medium = state.inv_pdf < 0.0

        # ---- NEE from the surface -----------------------------------------
        if settings.enable_nee and n_lights > 0:
            rng, (ul, u0, u1) = rnglib.next_f32_n(rng, 3)
            lsel, sel_pdf = lightlib.select_light(settings, scene.lights,
                                                  ul, surf.point)
            lp = lightlib.gather_light(scene.lights, lsel)
            ls = lightlib.sample_direct(scene, lp, surf.point,
                                        surf.is_entering, u0, u1, eval_texture,
                                        kinds=settings.light_kinds)
            pdf_l_s = lightlib.pdf_as_solid(ls.pdf_value, ls.pdf_is_area,
                                            ls.cos, ls.dist * ls.dist) * sel_pdf
            bsdf_f = shader.eval(ls.dir, out_dir)
            bsdf_p = shader.pdf(ls.dir, out_dir)
            mis = jnp.where(lp.delta | was_medium, 1.0,
                            1.0 / (1.0 + safe_div(bsdf_p, pdf_l_s)))
            factor = safe_div(ls.pdf_value, pdf_l_s)
            if settings.transparent_shadows:
                contrib_nee = _handle_color(
                    ls.intensity.cmul(state.contrib.cmul(bsdf_f))
                    * (mis * factor), settings).cmul(seg_tr)
            else:
                # Transmittance: camera segment + shadow segment (same
                # medium approximation, reference TODO comment)
                shadow_tr = medlib.transmittance(med, ls.dist)
                contrib_nee = _handle_color(
                    ls.intensity.cmul(state.contrib.cmul(bsdf_f))
                    * (mis * factor), settings).cmul(seg_tr.cmul(shadow_tr))
            want = (active & ~all_delta & (depth + 1 <= settings.max_depth)
                    & (pdf_l_s > 1e-9) & (ls.cos > 1e-6)
                    & (color_max_component(contrib_nee) > 0))
            svec_fin = ls.pos - surf.point
            sdir = vselect(lp.infinite, ls.dir, svec_fin)
            stmax = jnp.where(lp.infinite, FLT_MAX, 1.0 - OFFSET)
            shadow_rays = Rays(surf.point, sdir,
                               jnp.broadcast_to(OFFSET, n), stmax)
            # Pay the crossing walk only for GLASSY transmitters (thin
            # dielectric / BRTDfunc): passthrough-only media scenes (the
            # participating_media benchmark) keep the reference's cheap
            # current-medium approximation — the walk's 4 extra closest
            # hits per NEE cost it 2.7x (BENCH round 5).
            from ..models.bsdf import BsdfKind, THIN_FLAG
            glassy = settings.transparent_shadows and (
                settings.bsdf_kinds is None
                or (THIN_FLAG + int(BsdfKind.DIELECTRIC))
                in settings.bsdf_kinds
                or int(BsdfKind.RAD_BRTDF) in settings.bsdf_kinds
                or int(BsdfKind.RAD_ROOS) in settings.bsdf_kinds)
            if glassy:
                # crossing walk with per-segment medium attenuation,
                # starting in the path's CURRENT medium
                from .path import shadow_transmittance
                s_tint = shadow_transmittance(scene, settings, shadow_rays,
                                              init_medium=state.medium)
                result = _cadd_where(
                    want & (color_max_component(s_tint) > 0.0), result,
                    contrib_nee.cmul(s_tint))
            else:
                occ = occluded_scene(scene, shadow_rays)
                result = _cadd_where(want & ~occ, result, contrib_nee)

        # ---- continuation: medium event or surface bounce -----------------
        rng, (um, up0, up1, b_pick, b0, b1, b2, b_rr) = rnglib.next_f32_n(rng, 8)
        # Medium sampling happens over REAL segments only (the reference's
        # sample(p_start, p_end) has finite endpoints by construction,
        # homogeneous.art:41-55); miss/dead lanes carry hit.t = FLT_MAX,
        # and with PExpr sigmas that can go negative (this scene's
        # 4*norm(Np.xyzz)) exp(-sigma*FLT_MAX) overflows and NaNs the
        # backward pass. dist = 0 -> reach_surface -> invalid sample.
        ms = medlib.sample_distance(med, jnp.where(found, hit.t, 0.0), um)
        # Medium branch
        phase_dir, _ = medlib.sample_hg(med.g, out_dir, up0, up1)
        med_contrib = state.contrib.cmul(ms.weight)
        med_org = state.org + state.dir * ms.t
        # Surface branch
        bs = shader.sample(out_dir, b_pick, b0, b1, b2)
        surf_contrib = state.contrib.cmul(seg_tr).cmul(bs.weight)

        take_med = active & ms.valid
        new_contrib = cselect(take_med, med_contrib, surf_contrib)
        rr_c = color_max_component(new_contrib) * state.eta * state.eta
        rr_prob = jnp.clip(rr_c, 0.05, 0.95)
        rr_prob = jnp.where(depth + 1 > settings.min_depth, rr_prob, 1.0)
        survive = b_rr < rr_prob
        surf_ok = bs.valid & (bs.pdf > 1e-9)
        cont = (active & survive & (depth + 1 <= settings.max_depth)
                & (take_med | surf_ok))
        new_contrib = new_contrib * (1.0 / rr_prob)

        # Medium transition on transmission through the surface
        is_trans = dot(frame.n, bs.in_dir) < 0.0
        ent = jnp.clip(surf.ent, 0, None)
        inner = scene.entities.med_inner[ent]
        outer = scene.entities.med_outer[ent]
        new_med_surface = jnp.where(
            is_trans, jnp.where(surf.is_entering, inner, outer), state.medium)
        # Evaluate the new medium's properties at the entry surface context
        # (the reference evaluates medium closures at the shading ctx where
        # the medium is constructed; PExpr sigmas see Np/P/... of the entry)
        new_sa, new_ss, new_g = medlib.eval_medium_at(
            scene.media, settings, new_med_surface, sctx, n)

        new_inv_pdf = jnp.where(take_med, -1.0,
                                jnp.where(bs.is_delta, 0.0,
                                          safe_div(1.0, bs.pdf)))
        if settings.transparent_shadows:
            # straight-through delta transmission preserves the direction
            # measure: keep inv_pdf so the transparent-shadow NEE and the
            # through-chain light-hit MIS weights stay complementary
            # (see techniques/path.py shadow_transmittance)
            is_through = bs.is_delta & (dot(bs.in_dir, -out_dir)
                                        > 1.0 - 1e-6)
            new_inv_pdf = jnp.where(is_through & ~take_med, state.inv_pdf,
                                    new_inv_pdf)
        new_state = VolPathState(
            org=vselect(take_med, med_org, surf.point),
            dir=vselect(take_med, phase_dir, bs.in_dir),
            tmin=jnp.where(take_med, 0.0, OFFSET),
            tmax=jnp.full(n, FLT_MAX),
            rng=rng,
            contrib=cselect(cont, new_contrib, state.contrib),
            inv_pdf=jnp.where(cont, new_inv_pdf, state.inv_pdf),
            eta=jnp.where(cont & ~take_med, state.eta * bs.eta, state.eta),
            medium=jnp.where(cont & ~take_med, new_med_surface, state.medium),
            med_sa=cselect(cont & ~take_med, new_sa, state.med_sa),
            med_ss=cselect(cont & ~take_med, new_ss, state.med_ss),
            med_g=jnp.where(cont & ~take_med, new_g, state.med_g),
            alive=cont,
            result=result,
            depth=state.depth + 1,
            sample=state.sample)

        if regen is not None:
            x, y, iteration, frame = regen
            died = state.alive & ~cont
            has_more = state.sample + 1 < settings.spi
            do_regen = died & has_more
            new_sample = jnp.where(do_regen, state.sample + 1, state.sample)
            fresh = rnglib.seed(new_sample.astype(jnp.uint32),
                                iteration.astype(jnp.uint32),
                                frame.astype(jnp.uint32),
                                x.astype(jnp.uint32), y.astype(jnp.uint32),
                                jnp.uint32(settings.seed))
            from ..core.sampler import sample_pixel_offsets
            sample_idx = iteration.astype(jnp.uint32) \
                * jnp.uint32(settings.spi) + new_sample.astype(jnp.uint32)
            fresh2, (rx, ry) = sample_pixel_offsets(settings.pixel_sampler,
                                                    fresh, sample_idx, x, y)
            from ..models import camera as cameralib
            cam_rays = cameralib.generate_rays(scene.camera, settings, x, y,
                                               rx, ry, rng_state=fresh2)
            zero = jnp.zeros(n)
            new_state = VolPathState(
                org=vselect(do_regen, cam_rays.org, new_state.org),
                dir=vselect(do_regen, cam_rays.dir, new_state.dir),
                tmin=jnp.where(do_regen, cam_rays.tmin, new_state.tmin),
                tmax=jnp.where(do_regen, cam_rays.tmax, new_state.tmax),
                rng=jnp.where(do_regen, fresh2, new_state.rng),
                contrib=cselect(do_regen, white(n), new_state.contrib),
                inv_pdf=jnp.where(do_regen, 0.0, new_state.inv_pdf),
                eta=jnp.where(do_regen, 1.0, new_state.eta),
                medium=jnp.where(do_regen, -1, new_state.medium),
                med_sa=cselect(do_regen, Color(zero, zero, zero),
                               new_state.med_sa),
                med_ss=cselect(do_regen, Color(zero, zero, zero),
                               new_state.med_ss),
                med_g=jnp.where(do_regen, 0.0, new_state.med_g),
                alive=cont | do_regen,
                result=result,
                depth=jnp.where(do_regen, 1, new_state.depth),
                sample=new_sample)
        return new_state, None

    return bounce


def volpath_trace(scene: SceneData, settings: RenderSettings, rays: Rays,
                  rng_state, eval_texture=None) -> Color:
    n = rays.tmin.shape
    init = vol_initial_state(rays, rng_state)
    bounce = make_vol_bounce(scene, settings, n, eval_texture)

    if settings.remat:
        bounce_ckpt = jax.checkpoint(bounce, prevent_cse=False)
        final, _ = jax.lax.scan(bounce_ckpt, init,
                                jnp.arange(settings.max_depth))
        return final.result

    def cond(carry):
        b, state = carry
        return (b < settings.max_depth) & jnp.any(state.alive)

    def body(carry):
        b, state = carry
        state, _ = bounce(state, b)
        return (b + 1, state)

    _, final = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    return final.result
