"""Math-layer unit + property tests.

Ports the *laws* of the reference's 277 geometry tests
(core/src/geometry/{vector3,point3,normal,bounds2,matrix4x4,ray}.rs test
modules) as vectorized property checks over random batches — not the code.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.core import math as vm
from pbrt_tpu.core import transform as tf


RNG = np.random.default_rng(42)


def rand_vec(n=256, scale=10.0):
    return jnp.asarray(RNG.uniform(-scale, scale, (n, 3)).astype(np.float32))


class TestVectorLaws:
    def test_dot_bilinear(self):
        a, b, c = rand_vec(), rand_vec(), rand_vec()
        lhs = vm.dot(a, b + c)
        rhs = vm.dot(a, b) + vm.dot(a, c)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-3)

    def test_cross_orthogonal(self):
        a, b = rand_vec(), rand_vec()
        c = vm.cross(a, b)
        np.testing.assert_allclose(vm.dot(c, a), 0.0, atol=1e-2)
        np.testing.assert_allclose(vm.dot(c, b), 0.0, atol=1e-2)

    def test_cross_anticommute(self):
        a, b = rand_vec(), rand_vec()
        np.testing.assert_allclose(vm.cross(a, b), -vm.cross(b, a), atol=1e-4)

    def test_lagrange_identity(self):
        a, b = rand_vec(n=128, scale=2.0), rand_vec(n=128, scale=2.0)
        lhs = vm.length_squared(vm.cross(a, b))
        rhs = vm.length_squared(a) * vm.length_squared(b) - vm.dot(a, b) ** 2
        np.testing.assert_allclose(lhs, rhs, rtol=1e-3, atol=1e-3)

    def test_normalize_unit(self):
        v = rand_vec()
        np.testing.assert_allclose(vm.length(vm.normalize(v)), 1.0, atol=1e-5)

    def test_coordinate_system_orthonormal(self):
        v1 = vm.normalize(rand_vec())
        v2, v3 = vm.coordinate_system(v1)
        for x, y in [(v1, v2), (v1, v3), (v2, v3)]:
            np.testing.assert_allclose(vm.dot(x, y), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.length(v2), 1.0, atol=1e-5)
        np.testing.assert_allclose(vm.length(v3), 1.0, atol=1e-5)
        # right-handed: v1 x v2 == v3
        np.testing.assert_allclose(vm.cross(v1, v2), v3, atol=1e-5)

    def test_face_forward(self):
        n, v = rand_vec(), rand_vec()
        assert bool(jnp.all(vm.dot(vm.face_forward(n, v), v) >= 0.0))

    def test_spherical_roundtrip(self):
        v = vm.normalize(rand_vec())
        theta, phi = vm.spherical_theta(v), vm.spherical_phi(v)
        v2 = vm.spherical_direction(jnp.sin(theta), jnp.cos(theta), phi)
        np.testing.assert_allclose(v, v2, atol=1e-4)

    def test_quadratic(self):
        # (t-2)(t-5) = t^2 -7t + 10
        has, t0, t1 = vm.quadratic(jnp.float32(1), jnp.float32(-7), jnp.float32(10))
        assert bool(has)
        np.testing.assert_allclose([t0, t1], [2.0, 5.0], rtol=1e-5)
        has, _, _ = vm.quadratic(jnp.float32(1), jnp.float32(0), jnp.float32(1))
        assert not bool(has)
        # linear
        has, t0, t1 = vm.quadratic(jnp.float32(0), jnp.float32(2), jnp.float32(-8))
        assert bool(has) and abs(float(t0) - 4.0) < 1e-5


class TestTransforms:
    def test_compose_inverse(self):
        t = tf.translate([1, 2, 3]) * tf.rotate(30, [0, 1, 1]) * tf.scale([2, 0.5, 1])
        p = rand_vec(64)
        back = t.inverse().point(t.point(p))
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-3)

    def test_rotate_preserves_length(self):
        t = tf.rotate(77, [1, 2, 3])
        v = rand_vec(64)
        np.testing.assert_allclose(vm.length(jnp.asarray(t.vector(v))), vm.length(v), rtol=1e-4)

    def test_normal_transform(self):
        # normals transform by inverse-transpose: stay perpendicular
        t = tf.scale([2.0, 1.0, 0.25]) * tf.rotate(40, [1, 0, 0])
        v = rand_vec(64)
        n = vm.cross(v, rand_vec(64))
        tv = jnp.asarray(t.vector(v))
        tn = jnp.asarray(t.normal(n))
        np.testing.assert_allclose(vm.dot(tv, tn), 0.0, atol=2e-2)

    def test_look_at(self):
        t = tf.look_at([0, 5, 1.5], [0, 0, 0], [0, 0, 1])
        # camera origin maps to eye
        np.testing.assert_allclose(t.point(np.zeros(3)), [0, 5, 1.5], atol=1e-5)
        # +z maps toward look point
        d = t.vector(np.array([0, 0, 1.0]))
        expect = np.array([0, -5, -1.5]) / np.linalg.norm([0, 5, 1.5])
        np.testing.assert_allclose(d, expect, atol=1e-5)

    def test_swaps_handedness(self):
        assert tf.scale([-1, 1, 1]).swaps_handedness()
        assert not tf.rotate(13, [1, 1, 0]).swaps_handedness()

    def test_animated_endpoints(self):
        t0 = tf.translate([0, 0, 0])
        t1 = tf.translate([2, 0, 0]) * tf.rotate(90, [0, 0, 1])
        at = tf.AnimatedTransform(t0, 0.0, t1, 1.0)
        m0 = np.asarray(at.interpolate(jnp.float32(0.0)))
        m1 = np.asarray(at.interpolate(jnp.float32(1.0)))
        np.testing.assert_allclose(m0, t0.m, atol=1e-4)
        np.testing.assert_allclose(m1, t1.m, atol=1e-4)


class TestSpectrum:
    def test_xyz_roundtrip(self):
        from pbrt_tpu.core import spectrum as sp
        rgb = jnp.asarray(RNG.uniform(0, 1, (32, 3)).astype(np.float32))
        back = sp.xyz_to_rgb(sp.rgb_to_xyz(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)

    def test_luminance_white(self):
        from pbrt_tpu.core import spectrum as sp
        np.testing.assert_allclose(float(sp.luminance(jnp.ones(3))), 1.0, atol=1e-3)

    def test_blackbody_hue(self):
        from pbrt_tpu.core import spectrum as sp
        hot = sp.blackbody_normalized_rgb(10000.0)
        cold = sp.blackbody_normalized_rgb(2000.0)
        # hot is blue-ish, cold is red-ish
        assert hot[2] / max(hot[0], 1e-6) > cold[2] / max(cold[0], 1e-6)
        assert cold[0] > cold[2]

    def test_gamma_roundtrip(self):
        from pbrt_tpu.core import spectrum as sp
        v = jnp.linspace(0.0, 1.0, 64)
        np.testing.assert_allclose(np.asarray(sp.inverse_gamma_correct(sp.gamma_correct(v))),
                                   np.asarray(v), atol=1e-4)
