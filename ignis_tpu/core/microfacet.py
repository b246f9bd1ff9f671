"""GGX microfacet distribution: NDF, Smith G1, vNDF sampling.

Semantics mirror /root/reference/src/artic/core/microfacet.art:
  - alpha = roughness directly (no Disney remap at this layer)
  - separable Smith shadowing G = G1(wi) G1(wo)
  - visible-normal sampling via Dupuy & Benyoub spherical caps
  - alpha <= 1e-4 counts as a delta distribution (check_if_delta_distribution)

All functions operate on *local-frame* directions (z = shading normal),
batched over lanes.
"""
from __future__ import annotations

import jax.numpy as jnp

from .vec import Vec3, dot, normalize, safe_div
from .warp import PI, TWO_PI

DELTA_ALPHA = 1e-4


def ndf_ggx(m: Vec3, au, av):
    """Anisotropic GGX NDF; m in local frame."""
    kx = m.x / au
    ky = m.y / av
    k = kx * kx + ky * ky + m.z * m.z
    return safe_div(1.0, PI * au * av * k * k)


def g1_smith(w: Vec3, au, av):
    kx = au * w.x
    ky = av * w.y
    a2 = safe_div(kx * kx + ky * ky, w.z * w.z)
    return 2.0 / (1.0 + jnp.sqrt(1.0 + a2))


def g_separable(wi: Vec3, wo: Vec3, au, av):
    return g1_smith(wi, au, av) * g1_smith(wo, au, av)


def sample_vndf_ggx(wo: Vec3, au, av, u0, u1) -> Vec3:
    """Visible-normal sample around local view wo (z-up frame).

    Spherical-caps method (microfacet.art:372). Returns local half-vector."""
    s = normalize(Vec3(au * wo.x, av * wo.y, wo.z))
    phi = TWO_PI * u0
    z = (1.0 - u1) * (1.0 + s.z) - s.z
    sin_t = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    x = sin_t * jnp.cos(phi)
    y = sin_t * jnp.sin(phi)
    h = Vec3(x + s.x, y + s.y, z + s.z)
    return normalize(Vec3(h.x * au, h.y * av, h.z))


def pdf_vndf_ggx(wo: Vec3, h: Vec3, au, av):
    """Half-vector pdf of vNDF sampling (microfacet.art:398)."""
    cos_z = jnp.abs(wo.z)
    return safe_div(g1_smith(wo, au, av) * jnp.abs(dot(wo, h))
                    * ndf_ggx(h, au, av), cos_z)


def compute_explicit(roughness, anisotropic):
    """(roughness, anisotropic) -> (alpha_u, alpha_v) (microfacet.art:427)."""
    aspect = jnp.sqrt(1.0 - jnp.clip(anisotropic, 0.0, 1.0) * 0.99)
    return roughness / aspect, roughness * aspect


def reflective_jacobian(cos_h):
    """dwh -> dwi for reflection (shading.art:69)."""
    return safe_div(1.0, 4.0 * cos_h)


def refractive_jacobian(eta, cos_h_i, cos_h_o):
    """dwh -> dwi for refraction (shading.art:71)."""
    d = cos_h_i + cos_h_o * eta
    return safe_div(eta * eta * cos_h_i, d * d)
