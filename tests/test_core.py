"""Unit tests for the core math layer.

Mirrors the reference's inline test strategy (SURVEY.md §4): analytic values
(src/math.rs:87-102 2x2 solver, src/sampling.rs:187-208), property tests for
warps and transforms.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fountain_tpu.core import rng, sampling, spectrum, transform as tf
from fountain_tpu.core import vecmath as vm


class TestVecmath:
    def test_dot_cross(self):
        a = vm.vec(1.0, 0.0, 0.0)
        b = vm.vec(0.0, 1.0, 0.0)
        assert float(vm.dot(a, b)) == 0.0
        np.testing.assert_allclose(vm.cross(a, b), [0.0, 0.0, 1.0])

    def test_normalize_batched(self):
        v = jnp.array([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
        n = vm.normalize(v)
        np.testing.assert_allclose(n[0], [0.6, 0.0, 0.8], rtol=1e-6)
        np.testing.assert_allclose(n[1], [0.0, 0.0, 0.0])

    def test_coordinate_system_orthonormal(self):
        key = jax.random.PRNGKey(0)
        v1 = vm.normalize(jax.random.normal(key, (100, 3)))
        b1, b2, b3 = vm.coordinate_system(v1)
        np.testing.assert_allclose(vm.dot(b1, b2), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.dot(b1, b3), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.dot(b2, b3), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.length(b2), 1.0, rtol=1e-5)
        np.testing.assert_allclose(vm.length(b3), 1.0, rtol=1e-5)

    def test_quadratic(self):
        # x^2 - 3x + 2 = 0 -> 1, 2
        lo, hi, valid = vm.quadratic(jnp.float32(1.0), jnp.float32(-3.0),
                                     jnp.float32(2.0))
        assert bool(valid)
        np.testing.assert_allclose([lo, hi], [1.0, 2.0], rtol=1e-6)
        # no real roots
        _, _, valid = vm.quadratic(jnp.float32(1.0), jnp.float32(0.0),
                                   jnp.float32(1.0))
        assert not bool(valid)

    def test_solve_2x2(self):
        # mirrors reference src/math.rs:87-102
        x0, x1, ok = vm.solve_linear_system_2x2(
            jnp.float32(2.0), jnp.float32(1.0),
            jnp.float32(1.0), jnp.float32(3.0),
            jnp.float32(5.0), jnp.float32(10.0))
        assert bool(ok)
        np.testing.assert_allclose([x0, x1], [1.0, 3.0], rtol=1e-5)

    def test_reflect(self):
        wo = vm.normalize(vm.vec(1.0, 0.0, 1.0))
        n = vm.vec(0.0, 0.0, 1.0)
        r = vm.reflect(wo, n)
        np.testing.assert_allclose(r, vm.normalize(vm.vec(-1.0, 0.0, 1.0)),
                                   atol=1e-6)

    def test_refract_tir(self):
        # glass->air beyond critical angle: total internal reflection
        n = vm.vec(0.0, 0.0, 1.0)
        wi = vm.normalize(vm.vec(0.9, 0.0, 0.2))
        _, valid = vm.refract(wi, n, jnp.float32(1.5))
        assert not bool(valid)

    def test_offset_ray_origin_moves_off_surface(self):
        p = vm.vec(1.0, 2.0, 3.0)
        p_err = jnp.full((3,), 1e-4, jnp.float32)
        n = vm.vec(0.0, 0.0, 1.0)
        w_up = vm.vec(0.0, 0.0, 1.0)
        po = vm.offset_ray_origin(p, p_err, n, w_up)
        assert float(po[2]) > 3.0
        w_dn = vm.vec(0.0, 0.0, -1.0)
        po = vm.offset_ray_origin(p, p_err, n, w_dn)
        assert float(po[2]) < 3.0


class TestTransform:
    def test_translate_point_vs_vector(self):
        t = tf.translate([1.0, 2.0, 3.0])
        p = vm.vec(0.0, 0.0, 0.0)
        np.testing.assert_allclose(tf.transform_point(t, p), [1.0, 2.0, 3.0])
        np.testing.assert_allclose(tf.transform_vector(t, p), [0.0, 0.0, 0.0])

    def test_inverse_roundtrip(self):
        t = tf.translate([1.0, 2.0, 3.0]) @ tf.scale(2.0, 3.0, 4.0) \
            @ tf.rotate(37.0, [1.0, 1.0, 0.0])
        p = vm.vec(0.5, -1.5, 2.5)
        p2 = tf.transform_point(t.inverse, tf.transform_point(t, p))
        np.testing.assert_allclose(p2, p, atol=1e-5)

    def test_normal_transform_perpendicular(self):
        # under non-uniform scale, transformed normal stays perpendicular to
        # the transformed tangent (transform.rs:133-139 inverse-transpose)
        t = tf.scale(1.0, 2.0, 4.0)
        tangent = vm.vec(0.0, 1.0, -1.0)   # on plane with normal (0,1,1)
        n = vm.normalize(vm.vec(0.0, 1.0, 1.0))
        tt = tf.transform_vector(t, tangent)
        tn = tf.transform_normal(t, n)
        assert abs(float(vm.dot(tt, tn))) < 1e-5

    def test_look_at_maps_origin_to_eye(self):
        t = tf.look_at([0.0, -2.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0])
        cam_origin = tf.transform_point(t, vm.vec(0.0, 0.0, 0.0))
        np.testing.assert_allclose(cam_origin, [0.0, -2.0, 0.0], atol=1e-6)
        # +z in camera space points towards look target
        fwd = tf.transform_vector(t, vm.vec(0.0, 0.0, 1.0))
        np.testing.assert_allclose(fwd, [0.0, 1.0, 0.0], atol=1e-6)

    def test_rotate_inverse_is_transpose(self):
        t = tf.rotate(60.0, [0.0, 1.0, 0.0])
        np.testing.assert_allclose(t.m_inv, jnp.transpose(t.m), atol=1e-6)

    def test_error_propagation_bounds_actual_error(self):
        # mirrors reference transform.rs:392-440 property: the error bound
        # dominates the true rounding error vs float64 computation
        rs = np.random.RandomState(1)
        m = np.eye(4)
        m[:3, :3] = rs.randn(3, 3)
        m[:3, 3] = rs.randn(3) * 10
        t = tf.from_matrix(m.astype(np.float32))
        p = jnp.asarray(rs.randn(64, 3), jnp.float32)
        pt, err = tf.transform_point_with_error(t, p)
        exact = (m[:3, :3] @ np.asarray(p, np.float64).T).T + m[:3, 3]
        assert np.all(np.abs(np.asarray(pt, np.float64) - exact) <= np.asarray(err) + 1e-12)


class TestSampling:
    def test_concentric_disk_in_unit_disk(self):
        # mirrors reference sampling.rs:200-208
        u = np.random.RandomState(0).rand(2, 1000).astype(np.float32)
        x, y = sampling.concentric_sample_disk(jnp.asarray(u[0]), jnp.asarray(u[1]))
        r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
        assert np.all(r2 <= 1.0 + 1e-6)
        # area coverage: mean radius^2 of uniform disk samples is 1/2
        assert abs(r2.mean() - 0.5) < 0.05

    def test_cosine_hemisphere_upper(self):
        u = np.random.RandomState(1).rand(2, 1000).astype(np.float32)
        w = sampling.cosine_sample_hemisphere(jnp.asarray(u[0]), jnp.asarray(u[1]))
        assert np.all(np.asarray(w.z) >= 0.0)
        np.testing.assert_allclose(vm.length(w), 1.0, atol=1e-3)
        # E[cos(theta)] = 2/3 under cosine-weighted sampling
        assert abs(float(jnp.mean(w.z)) - 2.0 / 3.0) < 0.02

    def test_uniform_sphere_mean_zero(self):
        u = np.random.RandomState(2).rand(2, 4000).astype(np.float32)
        w = sampling.uniform_sample_sphere(jnp.asarray(u[0]), jnp.asarray(u[1]))
        np.testing.assert_allclose(vm.length(w), 1.0, atol=1e-3)
        for c in (w.x, w.y, w.z):
            assert abs(float(jnp.mean(c))) < 0.05

    def test_power_heuristic(self):
        # mirrors reference sampling.rs power_heuristic semantics
        w = sampling.power_heuristic(1, jnp.float32(1.0), 1, jnp.float32(1.0))
        np.testing.assert_allclose(w, 0.5)
        w = sampling.power_heuristic(1, jnp.float32(0.0), 1, jnp.float32(0.0))
        np.testing.assert_allclose(w, 0.0)

    def test_distribution_1d(self):
        # mirrors reference sampling.rs:187-198
        d = sampling.make_distribution_1d(jnp.array([1.0, 1.0, 2.0]))
        np.testing.assert_allclose(d.cdf, [0.0, 0.25, 0.5, 1.0], rtol=1e-6)
        idx, pmf = sampling.sample_distribution_1d_discrete(d, jnp.float32(0.7))
        assert int(idx) == 2
        np.testing.assert_allclose(pmf, 0.5, rtol=1e-6)
        x, pdf, off = sampling.sample_distribution_1d_continuous(d, jnp.float32(0.75))
        assert int(off) == 2
        np.testing.assert_allclose(pdf, 1.5, rtol=1e-6)  # 2 / (4/3)
        np.testing.assert_allclose(x, (2 + 0.5) / 3, rtol=1e-6)

    def test_distribution_2d_pdf_integrates_to_one(self):
        f = jnp.asarray(np.random.RandomState(3).rand(8, 16).astype(np.float32))
        d = sampling.make_distribution_2d(f)
        u = np.random.RandomState(4).rand(2, 5000).astype(np.float32)
        uu, vv, pdf = sampling.sample_distribution_2d(
            d, jnp.asarray(u[0]), jnp.asarray(u[1]))
        # MC estimate of integral of pdf over samples drawn from pdf = 1
        # E[1] = 1; also check pdf_distribution_2d agrees with sampled pdf
        pdf2 = sampling.pdf_distribution_2d(d, uu, vv)
        np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4)
        # inverse-pdf MC integral of 1 over the unit square
        est = np.mean(1.0 / np.asarray(pdf))
        assert abs(est - 1.0) < 0.05


class TestRng:
    def test_uniform_deterministic(self):
        a = rng.uniform1(jnp.arange(16), 0, 0, 7)
        b = rng.uniform1(jnp.arange(16), 0, 0, 7)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_uniform_range_and_mean(self):
        u = rng.uniform1(jnp.arange(100000), 0, 3, 1)
        u = np.asarray(u)
        assert u.min() >= 0.0 and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(u.var() - 1.0 / 12.0) < 0.01

    def test_streams_independent(self):
        u0 = np.asarray(rng.uniform1(jnp.arange(10000), 0, 0, 0))
        u1 = np.asarray(rng.uniform1(jnp.arange(10000), 0, 1, 0))
        assert abs(np.corrcoef(u0, u1)[0, 1]) < 0.05


class TestSpectrum:
    def test_rgb_xyz_roundtrip(self):
        rgb = jnp.asarray(np.random.RandomState(5).rand(32, 3), jnp.float32)
        back = spectrum.xyz_to_rgb(spectrum.rgb_to_xyz(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)

    def test_luminance_white(self):
        np.testing.assert_allclose(
            spectrum.luminance(jnp.ones((3,))), 1.0, rtol=1e-3)

    def test_srgb_roundtrip(self):
        v = jnp.linspace(0.0, 1.0, 64)
        back = spectrum.inverse_gamma_correct(spectrum.gamma_correct(v))
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)
