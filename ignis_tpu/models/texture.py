"""Texture nodes: image lookup + procedural patterns.

Parity target: reference patterns (/root/reference/src/runtime/pattern/ and
src/artic/texture/): image (nearest/bilinear/bicubic filters; repeat/mirror/
clamp wrap), checkerboard, brick, noise family.

Split representation (jit-friendly):
  - TexDesc: static python ints (kind/wrap/filter) — part of RenderSettings,
    so they specialize the compiled program like the reference's shader JIT.
  - TexData: jnp arrays (image, uv transform, colors, params) — pytree leaves.
Evaluation is a static unrolled masked select over the scene's textures.
"""
from __future__ import annotations

from enum import IntEnum
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.vec import Color, Vec2, cselect


class TexKind(IntEnum):
    IMAGE = 0
    CHECKERBOARD = 1
    BRICK = 2
    NOISE = 3       # value noise
    PERLIN = 4
    FBM = 5
    VORONOI = 6
    CELLNOISE = 7
    CONSTANT = 8
    PEXPR = 9       # compiled PExpr closure (desc.fn)
    TRANSFORM = 10  # uv-transform wrapper around desc.inner


class WrapMode(IntEnum):
    REPEAT = 0
    MIRROR = 1
    CLAMP = 2


class FilterMode(IntEnum):
    NEAREST = 0
    BILINEAR = 1
    BICUBIC = 2


class TexDesc(NamedTuple):
    """Static per-texture descriptor (hashable; lives in RenderSettings).

    `fn` holds a compiled PExpr closure for PEXPR textures (hashable by
    object identity — scene rebuilds produce new settings, as intended)."""
    kind: int
    wrap_u: int
    wrap_v: int
    filter: int
    fn: object = None
    inner: int = -1  # wrapped texture id (TRANSFORM)


class TexData(NamedTuple):
    """Array data per texture (SceneData pytree)."""
    image: jnp.ndarray        # [h, w, 3] for IMAGE, [1,1,3] otherwise
    transform: jnp.ndarray    # [2, 3] uv affine transform
    color0: jnp.ndarray       # [3]
    color1: jnp.ndarray       # [3]
    p0: jnp.ndarray           # scalar param (scale_x / octaves / ...)
    p1: jnp.ndarray
    p2: jnp.ndarray = jnp.float32(0.0)  # brick gap_x / ...
    p3: jnp.ndarray = jnp.float32(0.0)  # brick gap_y / ...


def make_image_texture(img: np.ndarray, wrap_u=WrapMode.REPEAT,
                       wrap_v=WrapMode.REPEAT, filt=FilterMode.BICUBIC,
                       transform=None):
    t = np.eye(2, 3, dtype=np.float32) if transform is None else \
        np.asarray(transform, np.float32)
    desc = TexDesc(int(TexKind.IMAGE), int(wrap_u), int(wrap_v), int(filt))
    data = TexData(image=jnp.asarray(img, jnp.float32), transform=jnp.asarray(t),
                   color0=jnp.zeros(3), color1=jnp.ones(3),
                   p0=jnp.float32(0), p1=jnp.float32(0))
    return desc, data


def make_procedural(kind: TexKind, color0, color1, p0=0.0, p1=0.0,
                    transform=None, p2=0.0, p3=0.0, inner=-1):
    t = np.eye(2, 3, dtype=np.float32) if transform is None else \
        np.asarray(transform, np.float32)
    desc = TexDesc(int(kind), 0, 0, 0, inner=int(inner))
    data = TexData(image=jnp.zeros((1, 1, 3), jnp.float32),
                   transform=jnp.asarray(t),
                   color0=jnp.asarray(color0, jnp.float32),
                   color1=jnp.asarray(color1, jnp.float32),
                   p0=jnp.float32(p0), p1=jnp.float32(p1),
                   p2=jnp.float32(p2), p3=jnp.float32(p3))
    return desc, data


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

def _wrap(x, mode: int):
    if mode == WrapMode.REPEAT:
        return jnp.mod(x, 1.0)
    if mode == WrapMode.MIRROR:
        t = jnp.mod(x, 2.0)
        return jnp.where(t > 1.0, 2.0 - t, t)
    return jnp.clip(x, 0.0, 1.0)


def _fetch(img, xi, yi):
    h, w = img.shape[0], img.shape[1]
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    flat = img.reshape(-1, 3)
    idx = yi * w + xi
    return Color(flat[idx, 0], flat[idx, 1], flat[idx, 2])


def _eval_image(desc: TexDesc, tex: TexData, u, v) -> Color:
    img = tex.image
    h, w = img.shape[0], img.shape[1]
    tu = tex.transform[0, 0] * u + tex.transform[0, 1] * v + tex.transform[0, 2]
    tv = tex.transform[1, 0] * u + tex.transform[1, 1] * v + tex.transform[1, 2]
    uu = _wrap(tu, desc.wrap_u)
    vv = _wrap(tv, desc.wrap_v)
    # Image row 0 is the top; uv v=0 is the bottom.
    x = uu * w - 0.5
    y = (1.0 - vv) * h - 0.5
    if desc.filter == FilterMode.NEAREST:
        return _fetch(img, jnp.round(x).astype(jnp.int32),
                      jnp.round(y).astype(jnp.int32))
    # Bilinear (bicubic maps here too for now; refine later for parity)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    c00 = _fetch(img, x0, y0)
    c10 = _fetch(img, x0 + 1, y0)
    c01 = _fetch(img, x0, y0 + 1)
    c11 = _fetch(img, x0 + 1, y0 + 1)

    def mix(a, b, t):
        return Color(a.r + (b.r - a.r) * t, a.g + (b.g - a.g) * t,
                     a.b + (b.b - a.b) * t)
    return mix(mix(c00, c10, fx), mix(c01, c11, fx), fy)


def _eval_checkerboard(tex: TexData, u, v) -> Color:
    iu = jnp.floor(u * tex.p0).astype(jnp.int32)
    iv = jnp.floor(v * tex.p1).astype(jnp.int32)
    even = ((iu + iv) % 2) == 0
    c0 = Color(*[jnp.broadcast_to(tex.color0[i], u.shape) for i in range(3)])
    c1 = Color(*[jnp.broadcast_to(tex.color1[i], u.shape) for i in range(3)])
    return cselect(even, c0, c1)


def _hash2(ix, iy):
    h = (ix.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         ^ iy.astype(jnp.uint32) * jnp.uint32(0x85EBCA77))
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return (h >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / 16777216.0)


def _value_noise(u, v):
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    fx = u - x0
    fy = v - y0
    sx = fx * fx * (3.0 - 2.0 * fx)
    sy = fy * fy * (3.0 - 2.0 * fy)
    n00 = _hash2(x0, y0)
    n10 = _hash2(x0 + 1, y0)
    n01 = _hash2(x0, y0 + 1)
    n11 = _hash2(x0 + 1, y0 + 1)
    return ((n00 * (1 - sx) + n10 * sx) * (1 - sy)
            + (n01 * (1 - sx) + n11 * sx) * sy)


def _eval_noiselike(desc: TexDesc, tex: TexData, u, v) -> Color:
    scale = jnp.maximum(tex.p0, 1e-6)
    x = u * scale
    y = v * scale
    if desc.kind == TexKind.FBM:
        amp, val, tot = 1.0, 0.0, 0.0
        for o in range(4):
            val = val + amp * _value_noise(x * (2 ** o), y * (2 ** o))
            tot += amp
            amp *= 0.5
        n = val / tot
    elif desc.kind == TexKind.CELLNOISE:
        n = _hash2(jnp.floor(x).astype(jnp.int32), jnp.floor(y).astype(jnp.int32))
    elif desc.kind == TexKind.VORONOI:
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        best = jnp.full(u.shape, 1e9, jnp.float32)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cx = x0 + dx
                cy = y0 + dy
                px = cx.astype(jnp.float32) + _hash2(cx, cy)
                py = cy.astype(jnp.float32) + _hash2(cy, cx)
                d = (px - x) ** 2 + (py - y) ** 2
                best = jnp.minimum(best, d)
        n = jnp.sqrt(best)
    else:  # NOISE / PERLIN / BRICK placeholder
        n = _value_noise(x, y)
    return Color(*[tex.color0[i] + (tex.color1[i] - tex.color0[i]) * n
                   for i in range(3)])


def _eval_brick(tex: TexData, u, v) -> Color:
    """brick.art node_brick: color0 = mortar, color1 = brick interior;
    odd rows shifted by half a brick."""
    tu = tex.transform[0, 0] * u + tex.transform[0, 1] * v + tex.transform[0, 2]
    tv = tex.transform[1, 0] * u + tex.transform[1, 1] * v + tex.transform[1, 2]
    su = tu * tex.p0
    sv = tv * tex.p1
    odd = jnp.mod(sv * 0.5, 1.0) > 0.5
    x = jnp.mod(jnp.where(odd, su + 0.5, su), 1.0)
    y = jnp.mod(sv, 1.0)
    inside = ((x <= 1.0 - tex.p2) & (y <= 1.0 - tex.p3)).astype(jnp.float32)
    return Color(*[tex.color0[i] + (tex.color1[i] - tex.color0[i]) * inside
                   for i in range(3)])


def _eval_one(desc: TexDesc, tex: TexData, ctx) -> Color:
    u, v = ctx.uv
    if desc.kind == TexKind.IMAGE:
        return _eval_image(desc, tex, u, v)
    if desc.kind == TexKind.CHECKERBOARD:
        return _eval_checkerboard(tex, u, v)
    if desc.kind == TexKind.BRICK:
        return _eval_brick(tex, u, v)
    if desc.kind == TexKind.CONSTANT:
        return Color(*[jnp.broadcast_to(tex.color0[i], u.shape) for i in range(3)])
    if desc.kind == TexKind.PEXPR:
        r, g, b = desc.fn(ctx)
        return Color(r, g, b)
    return _eval_noiselike(desc, tex, u, v)


def _eval_resolved(descs, datas, i: int, ctx) -> Color:
    """Evaluate texture i, following TRANSFORM wrappers (TransformPattern)."""
    desc, tex = descs[i], datas[i]
    hops = 0
    while desc.kind == TexKind.TRANSFORM and desc.inner >= 0 and hops < 8:
        u, v = ctx.uv
        tu = (tex.transform[0, 0] * u + tex.transform[0, 1] * v
              + tex.transform[0, 2])
        tv = (tex.transform[1, 0] * u + tex.transform[1, 1] * v
              + tex.transform[1, 2])
        ctx = ctx._replace(uv=(tu, tv))
        desc, tex = descs[desc.inner], datas[desc.inner]
        hops += 1
    return _eval_one(desc, tex, ctx)


def make_shade_ctx(uv: Vec2, point=None, normal=None, face_normal=None,
                   ray_dir=None, ray_org=None, prim_coords=None,
                   entity_id=None, pixel=None, frontside=None,
                   tangent=None, bitangent=None, scene_center=None,
                   scene_radius=None, textures=None, registry=None,
                   dpdu=None, dpdv=None):
    """Build a PExpr ShadeCtx; missing pieces default to zeros."""
    from ..scene.pexpr import ShadeCtx
    z = jnp.zeros_like(uv.x)
    zv = (z, z, z)
    npos = zv
    if point is not None and scene_center is not None:
        # Np: position normalized to the scene bounds (reference shading ctx)
        inv = 1.0 / jnp.maximum(scene_radius, 1e-6)
        npos = ((point[0] - scene_center[0]) * inv,
                (point[1] - scene_center[1]) * inv,
                (point[2] - scene_center[2]) * inv)
    return ShadeCtx(
        uv=(uv.x, uv.y),
        point=point or zv, np_=npos,
        normal=normal or zv, face_normal=face_normal or zv,
        tangent=tangent or zv, bitangent=bitangent or zv,
        ray_dir=ray_dir or zv, ray_org=ray_org or zv,
        prim_coords=prim_coords or (z, z),
        entity_id=entity_id if entity_id is not None else z.astype(jnp.int32),
        pixel=pixel or (z.astype(jnp.int32), z.astype(jnp.int32)),
        frontside=frontside if frontside is not None else z < 1,
        textures=textures, registry=registry, dpdu=dpdu, dpdv=dpdv)


def make_texture_evaluator(descs: Tuple[TexDesc, ...], datas):
    """eval_texture(tex_id[N] int32, ctx_or_uv) -> Color[N]; unrolled masked
    select over the scene's textures (uniform control flow).

    Accepts either a full pexpr.ShadeCtx or a bare Vec2 uv (non-PExpr uses).
    """
    if not descs:
        return None

    def eval_texture(tex_id, ctx) -> Color:
        if isinstance(ctx, Vec2):
            ctx = make_shade_ctx(ctx)
        if ctx.textures is None:
            # allow nested texture references from PExpr closures
            ctx = ctx._replace(textures=lambda tid, uv: _nested(tid, uv))

        def _nested(tid, uvt):
            c = _eval_resolved(descs, datas, tid, ctx._replace(uv=uvt))
            return (c.r, c.g, c.b)

        z = jnp.zeros(tex_id.shape, jnp.float32)
        out = Color(z, z, z)
        for i in range(len(descs)):
            c = _eval_resolved(descs, datas, i, ctx)
            out = cselect(tex_id == i, c, out)
        return out

    return eval_texture
