"""BSDF consistency tests: sample/eval/pdf agreement + energy checks.

Analog of the reference's artic microfacet/warp unit tests plus furnace-style
checks. For each kind: weight == eval(sampled)/pdf(sampled) and the sampled
pdf matches pdf() at the sampled direction (self-consistency needed for MIS).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ignis_tpu.core.frame import make_frame
from ignis_tpu.core.vec import Vec3, color, dot, normalize, to_array
from ignis_tpu.models import bsdf as B


def make_mat(kind, n, **kw):
    z = jnp.zeros(n)
    o = jnp.ones(n)
    d = dict(kind=jnp.full(n, int(kind), jnp.int32),
             base=color(o * 0.8, o * 0.6, o * 0.4),
             extra=color(o, o, o), extra2=color(o, o, o),
             p0=z, p1=z, p2=z, p3=z)
    for k, v in kw.items():
        if k in ("base", "extra", "extra2"):
            d[k] = v
        else:
            d[k] = jnp.full(n, v, jnp.float32)
    return B.MatParams(**d)


def rand_dirs(n, seed, up=True):
    rs = np.random.RandomState(seed)
    v = rs.randn(n, 3)
    if up:
        v[:, 2] = np.abs(v[:, 2]) + 0.05
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return Vec3(jnp.asarray(v[:, 0], jnp.float32),
                jnp.asarray(v[:, 1], jnp.float32),
                jnp.asarray(v[:, 2], jnp.float32))


def uniforms(n, seed):
    rs = np.random.RandomState(seed)
    return [jnp.asarray(rs.rand(n).astype(np.float32)) for _ in range(3)]


N = 2048


def frame_z(n):
    return make_frame(Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n)))


def check_consistency(mat, seed=0, atol=2e-2, entering=True):
    f = frame_z(N)
    wo = rand_dirs(N, seed + 1)
    ent = jnp.full(N, entering)
    u0, u1, u2 = uniforms(N, seed + 2)
    s = B.sample_bsdf(mat, f, ent, wo, u0, u1, u2)
    valid = np.asarray(s.valid & ~s.is_delta & (s.pdf > 1e-4))
    if valid.sum() == 0:
        return
    ev = B.eval_bsdf(mat, f, ent, s.in_dir, wo)
    pdf = B.pdf_bsdf(mat, f, ent, s.in_dir, wo)
    # pdf at sampled direction must match the sample's own pdf
    sp = np.asarray(s.pdf)[valid]
    pp = np.asarray(pdf)[valid]
    np.testing.assert_allclose(pp, sp, rtol=5e-2, atol=1e-3)
    # weight must equal eval/pdf
    for wch, ech in zip(s.weight, ev):
        w = np.asarray(wch)[valid]
        e = np.asarray(ech)[valid] / sp
        np.testing.assert_allclose(w, e, rtol=5e-2, atol=atol)


def test_diffuse_consistency():
    check_consistency(make_mat(B.BsdfKind.DIFFUSE, N))


def test_orennayar_consistency():
    check_consistency(make_mat(B.BsdfKind.DIFFUSE, N, p1=0.4))


def test_phong_consistency():
    check_consistency(make_mat(B.BsdfKind.PHONG, N, p0=25.0))


def test_rough_conductor_consistency():
    check_consistency(make_mat(B.BsdfKind.CONDUCTOR, N, p2=0.3, p3=0.3))


def test_rough_conductor_aniso_consistency():
    check_consistency(make_mat(B.BsdfKind.CONDUCTOR, N, p2=0.4, p3=0.15))


def test_rough_dielectric_consistency():
    mat = make_mat(B.BsdfKind.DIELECTRIC, N, p0=1.0, p1=1.5, p2=0.3)
    check_consistency(mat)
    check_consistency(mat, entering=False)


def test_plastic_consistency():
    check_consistency(make_mat(B.BsdfKind.PLASTIC, N, p0=1.0, p1=1.49, p2=0.25))


def test_diffuse_energy():
    """MC integral of eval over the hemisphere == albedo * avg."""
    mat = make_mat(B.BsdfKind.DIFFUSE, N)
    f = frame_z(N)
    wo = rand_dirs(N, 5)
    wi = rand_dirs(N, 6)
    ev = B.eval_bsdf(mat, f, jnp.full(N, True), wi, wo)
    # E_uniform-hemisphere[f*cos / (1/2pi)] = reflectance
    est = float(jnp.mean(ev.r)) * 2 * np.pi
    assert abs(est - 0.8) < 0.05


def test_smooth_dielectric_energy():
    """White dielectric weights: reflection carries 1; radiance-mode
    refraction carries the (eta_i/eta_t)^2 compression (PBRT convention,
    matches the Mitsuba/Radiance golden images); adjoint carries 1."""
    o = jnp.ones(N)
    mat = make_mat(B.BsdfKind.DIELECTRIC, N, p0=1.0, p1=1.5,
                   base=color(o, o, o))
    f = frame_z(N)
    wo = rand_dirs(N, 7)
    u0, u1, u2 = uniforms(N, 8)
    s = B.sample_bsdf(mat, f, jnp.full(N, True), wo, u0, u1, u2)
    assert bool(jnp.all(s.is_delta))
    refr = np.asarray(s.in_dir.z) < 0
    w = np.asarray(s.weight.r)
    np.testing.assert_allclose(w[~refr], 1.0, atol=1e-5)
    np.testing.assert_allclose(w[refr], (1.0 / 1.5) ** 2, atol=1e-5)
    # importance (adjoint) transport: no factor
    sa = B.sample_bsdf(mat, f, jnp.full(N, True), wo, u0, u1, u2,
                       adjoint=True)
    wa = np.asarray(sa.weight.r)
    refa = np.asarray(sa.in_dir.z) < 0
    np.testing.assert_allclose(wa[refa], 1.0, atol=1e-5)


def test_refraction_direction_snell():
    """Sampled refraction obeys Snell's law."""
    n = 256
    mat = make_mat(B.BsdfKind.DIELECTRIC, n, p0=1.0, p1=1.5)
    f = frame_z(n)
    wo = rand_dirs(n, 9)
    u0 = jnp.ones(n) * 0.999  # force refraction branch (u0 > F)
    u1, u2 = uniforms(n, 10)[:2]
    s = B.sample_bsdf(mat, f, jnp.full(n, True), wo, u0, u1, u2)
    refr = np.asarray(s.in_dir.z) < 0
    if refr.sum() == 0:
        pytest.skip("no refraction samples")
    sin_o = np.sqrt(np.maximum(0, 1 - np.asarray(wo.z) ** 2))
    sin_i = np.sqrt(np.maximum(
        0, np.asarray(s.in_dir.x) ** 2 + np.asarray(s.in_dir.y) ** 2))
    np.testing.assert_allclose(sin_i[refr], (sin_o / 1.5)[refr], atol=1e-4)
