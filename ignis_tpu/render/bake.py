"""PExpr bake-to-texture entry point.

Reference: BakeShader::setupTexture2d (src/runtime/shader/BakeShader.h:13)
compiles a tiny kernel that evaluates a shading expression over a uv grid
(entrypoints/bake.art:1-31); ShadingTree::bakeTexture (ShadingTree.cpp:457)
uses it to discretize PExpr properties (e.g. for env CDF construction), and
bakeTextureAverage reduces it to a single color. Here the expression is
compiled by the PExpr->JAX Compiler and evaluated in one jitted pass over
the pixel-center uv lattice.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _grid_ctx(w: int, h: int, textures=None, registry=None):
    from ..scene.pexpr import ShadeCtx
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    uu = jnp.broadcast_to(u[None, :], (h, w)).reshape(-1)
    vv = jnp.broadcast_to(v[:, None], (h, w)).reshape(-1)
    zero = jnp.zeros_like(uu)
    one = jnp.ones_like(uu)
    zv = (zero, zero, zero)
    return ShadeCtx(
        uv=(uu, vv), point=(uu, vv, zero), np_=(uu, vv, zero),
        normal=(zero, zero, one), face_normal=(zero, zero, one),
        tangent=(one, zero, zero), bitangent=(zero, one, zero),
        ray_dir=(zero, zero, one), ray_org=zv, prim_coords=(uu, vv),
        entity_id=jnp.zeros(uu.shape, jnp.int32),
        pixel=(uu * w, vv * h), frontside=one > 0,
        textures=textures, registry=registry)


def bake_texture2d(expr: str, width: int, height: int,
                   texture_ids: Optional[Dict[str, int]] = None,
                   textures=None, parameters=None,
                   registry=None) -> np.ndarray:
    """Evaluate a PExpr color expression over a [height, width] uv lattice;
    returns float32 [h, w, 3] (bake.art bake_texture2d)."""
    from ..scene.pexpr import Compiler

    comp = Compiler(texture_ids or {}, parameters)
    fn = comp.compile_color(expr)

    @jax.jit
    def run():
        ctx = _grid_ctx(width, height, textures=textures, registry=registry)
        r, g, b = fn(ctx)
        return jnp.stack([r.reshape(height, width), g.reshape(height, width),
                          b.reshape(height, width)], axis=-1)
    return np.asarray(run(), np.float32)


def bake_texture_average(expr: str, res: int = 64, **kw) -> np.ndarray:
    """Mean color of a PExpr expression (ShadingTree bakeTextureAverage
    analog — used where a property needs one representative value)."""
    img = bake_texture2d(expr, res, res, **kw)
    return img.reshape(-1, 3).mean(axis=0)
