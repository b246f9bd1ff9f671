"""Simple techniques: AO, debug views, wireframe, light visibility.

Mirrors /root/reference/src/artic/technique/{aotracer,debugtracer,
wireframe,lightvisibility}.art in vectorized single-pass form.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import rng as rnglib
from ..core.frame import make_frame
from ..core.vec import Color, Vec3, black, cselect, dot
from ..core.warp import sample_cosine_hemisphere
from ..models import bsdf as bsdflib
from ..ops.intersect import FLT_MAX, Rays
from ..scenedata import RenderSettings, SceneData
from .path import OFFSET, compute_surface, gather_material, occluded_scene, \
    trace_scene


def ao_trace(scene: SceneData, settings: RenderSettings, rays: Rays,
             rng_state, eval_texture=None) -> Color:
    """Ambient occlusion: white where the cosine-sampled hemisphere ray
    escapes (aotracer.art)."""
    hit = trace_scene(scene, rays)
    found = hit.prim >= 0
    surf = compute_surface(scene, rays, hit)
    frame = make_frame(surf.ns)
    rng, (u0, u1) = rnglib.next_f32_n(rng_state, 2)
    ldir, pdf = sample_cosine_hemisphere(u0, u1)
    d = frame.to_world(ldir)
    n = rays.tmin.shape
    srays = Rays(surf.point, d, jnp.broadcast_to(OFFSET, n),
                 jnp.full(n, FLT_MAX))
    occ = occluded_scene(scene, srays)
    lit = found & ~occ
    v = jnp.where(lit, 1.0, 0.0)
    return Color(v, v, v)


def _abs_color(v: Vec3) -> Color:
    return Color(jnp.abs(v.x), jnp.abs(v.y), jnp.abs(v.z))


def _palette(i):
    """Reference colormap::palette-style distinct colors from an id."""
    h = (i.astype(jnp.uint32) * jnp.uint32(2654435761)) & jnp.uint32(0xFFFFFF)
    r = ((h >> jnp.uint32(16)) & jnp.uint32(0xFF)).astype(jnp.float32) / 255.0
    g = ((h >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.float32) / 255.0
    b = (h & jnp.uint32(0xFF)).astype(jnp.float32) / 255.0
    return Color(r, g, b)


def debug_trace(scene: SceneData, settings: RenderSettings, rays: Rays,
                rng_state, eval_texture=None) -> Color:
    """Debug views (debugtracer.art modes; settings.debug_mode)."""
    hit = trace_scene(scene, rays)
    found = hit.prim >= 0
    surf = compute_surface(scene, rays, hit)
    frame = make_frame(surf.ns)
    mode = getattr(settings, "debug_mode", 0)

    mid = scene.entities.mat[jnp.clip(surf.ent, 0, None)]
    if mode == 1:
        c = _abs_color(frame.t)
    elif mode == 2:
        c = _abs_color(frame.b)
    elif mode == 3:
        c = _abs_color(surf.face_n)
    elif mode in (4, 5, 6, 7):
        # local-frame views: our frames are already ray-facing world frames
        v = {4: surf.ns, 5: frame.t, 6: frame.b, 7: surf.face_n}[mode]
        c = _abs_color(v)
    elif mode == 8:
        c = Color(jnp.abs(surf.uv.x), jnp.abs(surf.uv.y),
                  jnp.zeros_like(surf.uv.x))
    elif mode == 9:
        c = Color(jnp.abs(hit.u), jnp.abs(hit.v), jnp.zeros_like(hit.u))
    elif mode in (10, 11, 12):
        # Point / LocalPoint / GeneratedCoords: normalized hit position
        inv = 1.0 / jnp.maximum(scene.scene_radius, 1e-6)
        c = Color(jnp.abs(surf.point.x - scene.scene_center.x) * inv,
                  jnp.abs(surf.point.y - scene.scene_center.y) * inv,
                  jnp.abs(surf.point.z - scene.scene_center.z) * inv)
    elif mode == 13:
        c = Color(hit.t, hit.t, hit.t)
    elif mode == 14:
        # Area: world-space area of the hit triangle
        a = scene.tri_attr.area[jnp.clip(hit.prim, 0, None)]
        c = Color(a, a, a)
    elif mode in (16, 15):
        c = _palette(hit.prim)
    elif mode in (17, 18):
        c = _palette(surf.ent)
    elif mode in (19, 20):
        c = _palette(mid)
    elif mode == 21:
        e = (scene.entities.light[jnp.clip(surf.ent, 0, None)] >= 0) \
            .astype(jnp.float32)
        c = Color(e, e, jnp.zeros_like(e))
    elif mode in (22, 24):
        # IsSpecular / CheckBSDF: all-delta flag of the hit material
        d = bsdflib.is_all_delta(gather_material(scene, surf)) \
            .astype(jnp.float32)
        c = Color(d, jnp.zeros_like(d), d)
    elif mode == 23:
        e = surf.is_entering.astype(jnp.float32)
        c = Color(jnp.zeros_like(e), e, 1.0 - e)
    elif mode == 25:
        mat = gather_material(scene, surf)
        c = mat.base
    elif mode in (26, 27):
        med = (scene.entities.med_inner if mode == 26
               else scene.entities.med_outer)[jnp.clip(surf.ent, 0, None)]
        c = _palette(jnp.clip(med, 0, None))
    else:  # 0 / default: shading normal
        c = _abs_color(frame.n)
    return cselect(found, c, black(rays.tmin.shape))


def wireframe_trace(scene: SceneData, settings: RenderSettings, rays: Rays,
                    rng_state, eval_texture=None) -> Color:
    """Edge highlight: barycentric proximity to a triangle edge
    (wireframe.art uses hit distance to edges; this is the same visual)."""
    hit = trace_scene(scene, rays)
    found = hit.prim >= 0
    w = 1.0 - hit.u - hit.v
    edge_dist = jnp.minimum(jnp.minimum(hit.u, hit.v), w)
    on_edge = found & (edge_dist < 0.02)
    v = jnp.where(on_edge, 1.0, 0.0)
    return Color(v, v, v)


def light_visibility_trace(scene: SceneData, settings: RenderSettings,
                           rays: Rays, rng_state, eval_texture=None) -> Color:
    """Binary visibility of any light by NEE from the first hit
    (lightvisibility.art simplification)."""
    from ..models import light as lightlib
    hit = trace_scene(scene, rays)
    found = hit.prim >= 0
    surf = compute_surface(scene, rays, hit)
    n = rays.tmin.shape
    if settings.n_lights == 0:
        z = jnp.zeros(n)
        return Color(z, z, z)
    rng, (ul, u0, u1) = rnglib.next_f32_n(rng_state, 3)
    lsel, _ = lightlib.select_uniform(settings.n_lights, ul)
    lp = lightlib.gather_light(scene.lights, lsel)
    ls = lightlib.sample_direct(scene, lp, surf.point, surf.is_entering,
                                u0, u1, eval_texture,
                                kinds=settings.light_kinds)
    from ..core.vec import vselect
    sdir = vselect(lp.infinite, ls.dir, ls.pos - surf.point)
    stmax = jnp.where(lp.infinite, FLT_MAX, 1.0 - OFFSET)
    srays = Rays(surf.point, sdir, jnp.broadcast_to(OFFSET, n), stmax)
    occ = occluded_scene(scene, srays)
    v = jnp.where(found & ~occ & (ls.cos > 0), 1.0, 0.0)
    return Color(v, v, v)


def env_check_trace(scene: SceneData, settings: RenderSettings, rays: Rays,
                    rng_state, eval_texture=None) -> Color:
    """Render the environment only: camera-ray misses show the summed
    emission of all infinite non-delta lights (internal/env_check.art)."""
    from ..models import light as lightlib
    from .path import _infinite_rows
    hit = trace_scene(scene, rays)
    miss = hit.prim < 0
    n = rays.tmin.shape
    out = black(n)
    for lid in _infinite_rows(scene, settings):
        lp = lightlib.gather_light(scene.lights,
                                   jnp.full(n, lid, jnp.int32))
        emit = lightlib.env_emission(scene, lp, rays.dir, eval_texture)
        out = cselect(miss & ~lp.delta, Color(out.r + emit.r, out.g + emit.g,
                                              out.b + emit.b), out)
    return out


def camera_check_trace(scene: SceneData, settings: RenderSettings,
                       rays: Rays, rng_state, eval_texture=None) -> Color:
    """Reproject the primary hit through the camera: green where the point
    projects back onto its own pixel and the camera is visible, shading to
    red with reprojection error (internal/camera_check.art)."""
    from ..models import camera as cameralib
    hit = trace_scene(scene, rays)
    found = hit.prim >= 0
    surf = compute_surface(scene, rays, hit)
    n = rays.tmin.shape
    valid_p, pix, cam_dir, _w = cameralib.sample_pixel(scene.camera, settings,
                                                       surf.point)
    w = settings.width
    px = pix % w
    py = pix // w
    # this lane's own pixel coordinates come from its linear lane index
    lane = jnp.arange(px.shape[0], dtype=jnp.int32)
    ox = lane % w
    oy = lane // w
    fac = ((1.0 - jnp.abs(ox - px).astype(jnp.float32) / w)
           * (1.0 - jnp.abs(oy - py).astype(jnp.float32) / settings.height))
    fac = jnp.clip(fac, 0.0, 1.0)
    srays = Rays(surf.point, cam_dir, jnp.broadcast_to(OFFSET, n),
                 jnp.full(n, 1.0 - float(OFFSET)))
    occ = occluded_scene(scene, srays)
    ok = found & valid_p & ~occ
    red = Color(jnp.ones(n), jnp.zeros(n), jnp.zeros(n))
    green = Color(jnp.zeros(n), jnp.ones(n), jnp.zeros(n))
    mixed = Color(red.r + (green.r - red.r) * fac,
                  red.g + (green.g - red.g) * fac,
                  red.b + (green.b - red.b) * fac)
    return cselect(ok, mixed, black(n))


def info_buffer(scene: SceneData, settings: RenderSettings, rays: Rays,
                rng_state, eval_texture=None):
    """Normals / Albedo / Depth AOVs in one traversal (the reference
    `infobuffer` internal technique feeding the denoiser, OIDN.cpp)."""
    from .path import gather_material, make_surface_ctx
    hit = trace_scene(scene, rays)
    found = hit.prim >= 0
    surf = compute_surface(scene, rays, hit)
    sctx = (make_surface_ctx(scene, rays, surf, eval_texture)
            if eval_texture is not None else None)
    mat = gather_material(scene, surf, eval_texture, sctx)
    z = jnp.zeros(rays.tmin.shape, jnp.float32)
    normals = Color(jnp.where(found, surf.ns.x, 0.0),
                    jnp.where(found, surf.ns.y, 0.0),
                    jnp.where(found, surf.ns.z, 0.0))
    albedo = Color(jnp.where(found, mat.base.r, 1.0),
                   jnp.where(found, mat.base.g, 1.0),
                   jnp.where(found, mat.base.b, 1.0))
    depth = jnp.where(found, hit.t, 0.0)
    return normals, albedo, Color(depth, depth, z)
