"""Core math unit tests (mirror of reference src/tests/artic/test_*.art:
warp, CDF, RNG, frames, intersection)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ignis_tpu.core import rng as rnglib
from ignis_tpu.core import warp
from ignis_tpu.core.cdf import (build_cdf_1d, build_cdf_2d, pdf_cdf_2d,
                                sample_cdf_1d, sample_cdf_2d)
from ignis_tpu.core.frame import make_frame
from ignis_tpu.core.vec import Vec3, dot, length, normalize, to_array


def rand_uniform(n, seed=0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(n).astype(np.float32))


class TestWarp:
    def test_uniform_sphere(self):
        u, v = rand_uniform(4096, 1), rand_uniform(4096, 2)
        d, pdf = warp.sample_uniform_sphere(u, v)
        np.testing.assert_allclose(np.asarray(dot(d, d)), 1.0, atol=1e-5)
        np.testing.assert_allclose(pdf, 1 / (4 * np.pi), rtol=1e-6)
        # Mean of z should be ~0 for a uniform sphere
        assert abs(float(jnp.mean(d.z))) < 0.05

    def test_cosine_hemisphere(self):
        u, v = rand_uniform(8192, 3), rand_uniform(8192, 4)
        d, pdf = warp.sample_cosine_hemisphere(u, v)
        assert float(jnp.min(d.z)) >= 0
        np.testing.assert_allclose(np.asarray(pdf),
                                   np.asarray(d.z) / np.pi, atol=1e-5)
        # E[cos] for cosine-weighted = 2/3
        assert abs(float(jnp.mean(d.z)) - 2 / 3) < 0.01

    def test_cone(self):
        cos_a = 0.8
        u, v = rand_uniform(4096, 5), rand_uniform(4096, 6)
        d, pdf = warp.sample_uniform_cone(u, v, cos_a)
        assert float(jnp.min(d.z)) >= cos_a - 1e-5
        np.testing.assert_allclose(pdf, 1 / (2 * np.pi * (1 - cos_a)), rtol=1e-5)

    def test_concentric_disk(self):
        u, v = rand_uniform(4096, 7), rand_uniform(4096, 8)
        p = warp.square_to_concentric_disk(u, v)
        r2 = np.asarray(p.x) ** 2 + np.asarray(p.y) ** 2
        assert r2.max() <= 1.0 + 1e-6

    def test_spherical_roundtrip(self):
        u, v = rand_uniform(128, 9), rand_uniform(128, 10)
        d, _ = warp.sample_uniform_sphere(u, v)
        th, ph = warp.spherical_from_dir(d)
        d2 = warp.dir_from_spherical(th, ph)
        np.testing.assert_allclose(to_array(d), to_array(d2), atol=1e-5)


class TestFrame:
    def test_orthonormal(self):
        u, v = rand_uniform(512, 11), rand_uniform(512, 12)
        n, _ = warp.sample_uniform_sphere(u, v)
        f = make_frame(n)
        np.testing.assert_allclose(np.asarray(dot(f.t, f.b)), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot(f.t, f.n)), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(length(f.t)), 1, atol=1e-5)
        # to_world/to_local roundtrip
        w = f.to_world(Vec3(jnp.float32(0.3), jnp.float32(-0.2), jnp.float32(0.5)))
        l = f.to_local(w)
        np.testing.assert_allclose(np.asarray(l.x), 0.3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(l.z), 0.5, atol=1e-5)


class TestCDF:
    def test_cdf1d(self):
        w = jnp.asarray([1.0, 3.0, 0.0, 4.0])
        c = build_cdf_1d(w)
        np.testing.assert_allclose(c.cdf, [0.125, 0.5, 0.5, 1.0], atol=1e-6)
        u = rand_uniform(8192, 13)
        idx, rem, pdf = sample_cdf_1d(c, u)
        counts = np.bincount(np.asarray(idx), minlength=4) / 8192
        np.testing.assert_allclose(counts, [0.125, 0.375, 0.0, 0.5], atol=0.02)

    def test_cdf2d_pdf_integrates(self):
        rs = np.random.RandomState(14)
        w = jnp.asarray(rs.rand(16, 32).astype(np.float32))
        c = build_cdf_2d(w)
        u, v = rand_uniform(4096, 15), rand_uniform(4096, 16)
        x, y, pdf = sample_cdf_2d(c, u, v)
        # pdf at sampled location should match pdf_cdf_2d
        pdf2 = pdf_cdf_2d(c, x, y)
        np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-3)
        # Monte-Carlo estimate of integral of 1 == E[1/pdf] over samples
        est = float(jnp.mean(1.0 / pdf))
        assert abs(est - 1.0) < 0.05


class TestRng:
    def test_deterministic(self):
        s = rnglib.seed(1, 2, 3, jnp.uint32(5), jnp.uint32(7), 42)
        s1, f1 = rnglib.next_f32(s)
        s2, f2 = rnglib.next_f32(s)
        np.testing.assert_array_equal(f1, f2)

    def test_uniformity(self):
        x = jnp.arange(65536, dtype=jnp.uint32)
        s = rnglib.seed(0, 0, 0, x, x * 7, 0)
        _, f = rnglib.next_f32(s)
        f = np.asarray(f)
        assert 0 <= f.min() and f.max() < 1.0
        assert abs(f.mean() - 0.5) < 0.005
        h, _ = np.histogram(f, bins=16, range=(0, 1))
        assert h.min() > 65536 / 16 * 0.9

    def test_seed_decorrelation(self):
        x = jnp.arange(4096, dtype=jnp.uint32)
        _, a = rnglib.next_f32(rnglib.seed(0, 0, 0, x, x, 0))
        _, b = rnglib.next_f32(rnglib.seed(1, 0, 0, x, x, 0))
        assert abs(np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]) < 0.05
