"""Light tracer (adjoint transport): light paths splat to the camera.

Mirrors /root/reference/src/artic/technique/lighttracer.art: light emission
sampling, per-vertex connection to the camera (visibility-tested), adjoint
BSDF bounces with Russian roulette. The camera splat — a scatter in the
reference's advanced-shadow handler — becomes a masked scatter-add into the
flat film; film is normalized by iteration count like the reference
(one light path per pixel-slot per iteration).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng as rnglib
from ..core.frame import make_frame
from ..core.vec import (Color, Vec3, black, color_max_component, cselect, dot,
                        length, normalize, safe_div, vselect, white)
from ..models import bsdf as bsdflib
from ..models import camera as cameralib
from ..models import light as lightlib
from ..ops.intersect import FLT_MAX, Rays
from ..scenedata import RenderSettings, SceneData
from .path import (OFFSET, _handle_color, apply_normal_map,
                   compute_surface, gather_material,
                   make_surface_ctx, occluded_scene, trace_scene)


class LTState(NamedTuple):
    org: Vec3
    dir: Vec3
    tmin: jnp.ndarray
    tmax: jnp.ndarray
    rng: jnp.ndarray
    contrib: Color
    eta: jnp.ndarray
    depth: jnp.ndarray
    sample: jnp.ndarray
    alive: jnp.ndarray
    film_r: jnp.ndarray  # [n_pixels]
    film_g: jnp.ndarray
    film_b: jnp.ndarray


def _emit(scene, settings, x, y, sample, iteration, frame):
    """Start light paths (make_lt_emitter)."""
    n = x.shape
    state = rnglib.seed(sample.astype(jnp.uint32), iteration.astype(jnp.uint32),
                        frame.astype(jnp.uint32), x.astype(jnp.uint32),
                        y.astype(jnp.uint32), jnp.uint32(settings.seed))
    state, (ul, u0, u1, u2, u3) = rnglib.next_f32_n(state, 5)
    lsel, sel_pdf = lightlib.select_light(settings, scene.lights, ul)
    lp = lightlib.gather_light(scene.lights, lsel)
    es = lightlib.sample_emission(scene, lp, u0, u1, u2, u3)
    radiance = es.intensity * safe_div(jnp.abs(es.cos), sel_pdf)
    tmin = jnp.where(lp.infinite, 0.0, float(OFFSET))
    return state, es.pos, es.dir, tmin, radiance


def lt_trace_film(scene: SceneData, settings: RenderSettings, x, y,
                  iteration, frame, eval_texture=None):
    """Returns the accumulated film [n_pixels] per channel for one iteration
    (settings.spi light paths per pixel-slot)."""
    n = x.shape
    n_pix = settings.width * settings.height
    cam = scene.camera

    rng0, pos0, dir0, tmin0, rad0 = _emit(scene, settings, x, y,
                                          jnp.zeros(n, jnp.uint32),
                                          iteration, frame)
    init = LTState(org=pos0, dir=dir0, tmin=tmin0, tmax=jnp.full(n, FLT_MAX),
                   rng=rng0, contrib=rad0, eta=jnp.ones(n),
                   depth=jnp.ones(n, jnp.int32), sample=jnp.zeros(n, jnp.int32),
                   alive=jnp.ones(n, bool),
                   film_r=jnp.zeros(n_pix), film_g=jnp.zeros(n_pix),
                   film_b=jnp.zeros(n_pix))

    def bounce(state: LTState):
        rays_b = Rays(state.org, state.dir, state.tmin, state.tmax)
        hit = trace_scene(scene, rays_b)
        found = hit.prim >= 0
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
        rng = state.rng

        # ---- connect to camera (on_shadow, lighttracer.art:72) ------------
        valid_p, pix, cam_dir, cam_w = cameralib.sample_pixel(cam, settings,
                                                              surf.point)
        in_dir = normalize(cam_dir)
        cos_o = dot(out_dir, frame_l.n)
        cos_i = dot(in_dir, frame_l.n)
        d2 = jnp.maximum(dot(cam_dir, cam_dir), 1e-12)
        # shader.eval already includes |cos(in_dir, n)| = cos toward camera;
        # remaining geometry term is 1/d^2 (camera importance is in cam_w).
        factor = 1.0 / d2
        f = shader.eval(in_dir, out_dir)
        contrib = _handle_color(
            state.contrib.cmul(f) * (cam_w * factor), settings)
        want = (active & ~all_delta & valid_p & ((cos_o * cos_i) > 1e-6)
                & (state.depth + 1 <= settings.max_depth))
        srays = Rays(surf.point, cam_dir, jnp.broadcast_to(OFFSET, n),
                     jnp.full(n, 1.0 - float(OFFSET)))
        occ = occluded_scene(scene, srays)
        ok = want & ~occ
        pix_safe = jnp.where(ok, pix, 0)
        film_r = state.film_r.at[pix_safe].add(jnp.where(ok, contrib.r, 0.0))
        film_g = state.film_g.at[pix_safe].add(jnp.where(ok, contrib.g, 0.0))
        film_b = state.film_b.at[pix_safe].add(jnp.where(ok, contrib.b, 0.0))

        # ---- adjoint bounce ------------------------------------------------
        rng, (b_pick, b0, b1, b2, b_rr) = rnglib.next_f32_n(rng, 5)
        bs = shader.sample(out_dir, b_pick, b0, b1, b2, adjoint=True)
        new_contrib = state.contrib.cmul(bs.weight)
        rr_c = color_max_component(new_contrib) * state.eta * state.eta
        rr_prob = jnp.clip(rr_c, 0.05, 0.95)
        rr_prob = jnp.where(state.depth + 1 > settings.min_depth, rr_prob, 1.0)
        survive = b_rr < rr_prob
        cont = (active & bs.valid & survive & (bs.pdf > 1e-9)
                & (state.depth + 1 <= settings.max_depth))
        new_contrib = new_contrib * (1.0 / rr_prob)

        st = LTState(
            org=surf.point, dir=bs.in_dir,
            tmin=jnp.broadcast_to(OFFSET, n), tmax=jnp.full(n, FLT_MAX),
            rng=rng,
            contrib=cselect(cont, new_contrib, state.contrib),
            eta=jnp.where(cont, state.eta * bs.eta, state.eta),
            depth=state.depth + 1, sample=state.sample,
            alive=cont,
            film_r=film_r, film_g=film_g, film_b=film_b)

        # ---- regenerate finished paths -------------------------------------
        died = state.alive & ~cont
        has_more = state.sample + 1 < settings.spi
        do_regen = died & has_more
        new_sample = jnp.where(do_regen, state.sample + 1, state.sample)
        rng2, pos, dirn, tmin, rad = _emit(scene, settings, x, y,
                                           new_sample.astype(jnp.uint32),
                                           iteration, frame)
        st = LTState(
            org=vselect(do_regen, pos, st.org),
            dir=vselect(do_regen, dirn, st.dir),
            tmin=jnp.where(do_regen, tmin, st.tmin),
            tmax=st.tmax,
            rng=jnp.where(do_regen, rng2, st.rng),
            contrib=cselect(do_regen, rad, st.contrib),
            eta=jnp.where(do_regen, 1.0, st.eta),
            depth=jnp.where(do_regen, 1, st.depth),
            sample=new_sample,
            alive=st.alive | do_regen,
            film_r=st.film_r, film_g=st.film_g, film_b=st.film_b)
        return st

    max_iters = settings.spi * settings.max_depth

    def cond(carry):
        it, s = carry
        return (it < max_iters) & jnp.any(s.alive)

    def body(carry):
        it, s = carry
        return (it + 1, bounce(s))

    _, final = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    return final.film_r, final.film_g, final.film_b
