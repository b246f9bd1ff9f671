"""Fresnel terms (dielectric + conductor).

Semantics mirror /root/reference/src/artic/core/fresnel.art.
Conventions: `k` (or eta) is the ratio n1/n2 crossing the interface along the
incident direction; cos_i is the absolute cosine on the incident side.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .vec import Color


class FresnelResult(NamedTuple):
    factor: jnp.ndarray   # reflection probability (1 on TIR)
    cos_t: jnp.ndarray    # transmitted cosine (0 on TIR)
    total: jnp.ndarray    # bool: total internal reflection


def fresnel_dielectric(k, cos_i) -> FresnelResult:
    """Exact dielectric Fresnel; k = n1/n2, cos_i >= 0."""
    sin_t2 = k * k * (1.0 - cos_i * cos_i)
    total = sin_t2 > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t2, 0.0))
    r_par = (k * cos_i - cos_t) / jnp.maximum(k * cos_i + cos_t, 1e-20)
    r_per = (cos_i - k * cos_t) / jnp.maximum(cos_i + k * cos_t, 1e-20)
    f = 0.5 * (r_par * r_par + r_per * r_per)
    return FresnelResult(jnp.where(total, 1.0, f),
                         jnp.where(total, 0.0, cos_t), total)


def fresnel_conductor(eta: Color, k: Color, cos_i) -> Color:
    """Conductor Fresnel per channel; eta/k relative IOR (n2/n1) and
    absorption."""
    c2 = cos_i * cos_i
    s2 = 1.0 - c2

    def chan(n, kk):
        n2k2 = n * n + kk * kk
        t0 = n2k2 - s2
        a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * n * n * kk * kk, 0.0))
        t1 = a2b2 + c2
        a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
        t2 = 2.0 * a * cos_i
        rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
        t3 = c2 * a2b2 + s2 * s2
        t4 = t2 * s2
        rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
        return 0.5 * (rs + rp)

    return Color(chan(eta.r, k.r), chan(eta.g, k.g), chan(eta.b, k.b))


def schlick(f0, cos_i):
    m = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    m2 = m * m
    return f0 + (1.0 - f0) * m2 * m2 * m
