"""Unit tests for the math core (vecmath, transforms, color, colorramp, rng)."""

import numpy as np
import jax.numpy as jnp
import pytest

from optix_ray_tracer_tpu.utils import vecmath as vm
from optix_ray_tracer_tpu.utils import transforms as tf
from optix_ray_tracer_tpu.utils import color as col
from optix_ray_tracer_tpu.utils import colorramp as ramp
from optix_ray_tracer_tpu.utils import rng


class TestVecmath:
    def test_normalize(self):
        v = jnp.asarray([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
        n = np.asarray(vm.normalize(v))
        np.testing.assert_allclose(n[0], [0.6, 0.0, 0.8], atol=1e-6)
        np.testing.assert_allclose(n[1], [0.0, 0.0, 0.0])  # safe zero

    def test_reflect(self):
        d = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2)
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        r = np.asarray(vm.reflect(d, n))
        np.testing.assert_allclose(r[0], [1 / np.sqrt(2), 1 / np.sqrt(2), 0.0],
                                   atol=1e-6)

    def test_refract_straight_through(self):
        d = jnp.asarray([[0.0, -1.0, 0.0]])
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        r = np.asarray(vm.refract(d, n, 1.0))
        np.testing.assert_allclose(r[0], [0.0, -1.0, 0.0], atol=1e-6)

    def test_refract_snell(self):
        # 45 degrees into glass (eta = 1/1.5)
        d = vm.normalize(jnp.asarray([[1.0, -1.0, 0.0]]))
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        r = np.asarray(vm.refract(d, n, 1.0 / 1.5))[0]
        sin_out = abs(r[0]) / np.linalg.norm(r)
        np.testing.assert_allclose(sin_out, np.sin(np.pi / 4) / 1.5, atol=1e-6)

    def test_rotate_about_axis(self):
        v = jnp.asarray([1.0, 0.0, 0.0])
        axis = jnp.asarray([0.0, 0.0, 1.0])
        r = np.asarray(vm.rotate_about_axis(v, axis, jnp.float32(np.pi / 2)))
        np.testing.assert_allclose(r, [0.0, 1.0, 0.0], atol=1e-6)


class TestTransforms:
    def test_srt_identity(self):
        t = np.asarray(tf.srt_transform([0, 0, 0], [0, 0, 0], [1, 1, 1]))
        np.testing.assert_allclose(t, np.eye(3, 4), atol=1e-6)

    def test_srt_compose_order(self):
        # shift * rotZ(90) * scale(2): point (1,0,0) -> scale (2,0,0)
        # -> rotate (0,2,0) -> shift (1,2,3)+(0,2,0) = (1,4,3)
        t = tf.srt_transform([1, 2, 3], [0, 0, 90], [2, 2, 2])
        p = np.asarray(tf.apply_transform_point(t, jnp.asarray([1.0, 0.0, 0.0])))
        np.testing.assert_allclose(p, [1.0, 4.0, 3.0], atol=1e-4)

    def test_invert_roundtrip(self):
        t = tf.srt_transform([0.3, -0.2, 1.0], [10, 20, 30], [1.5, 0.7, 2.0])
        inv = tf.invert_transform(t)
        p = jnp.asarray([0.1, 0.2, 0.3])
        back = np.asarray(tf.apply_transform_point(inv, tf.apply_transform_point(t, p)))
        np.testing.assert_allclose(back, np.asarray(p), atol=1e-5)

    def test_compose(self):
        a = tf.srt_transform([1, 0, 0], [0, 0, 90], [1, 1, 1])
        b = tf.srt_transform([0, 1, 0], [0, 0, 0], [2, 2, 2])
        ab = tf.compose_transforms(a, b)
        p = jnp.asarray([1.0, 0.0, 0.0])
        expect = tf.apply_transform_point(a, tf.apply_transform_point(b, p))
        np.testing.assert_allclose(np.asarray(tf.apply_transform_point(ab, p)),
                                   np.asarray(expect), atol=1e-5)

    def test_slerp_endpoints(self):
        q1 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        q2 = jnp.asarray([np.cos(np.pi / 4), np.sin(np.pi / 4), 0.0, 0.0])
        np.testing.assert_allclose(np.asarray(tf.quat_slerp(q1, q2, 0.0)),
                                   np.asarray(q1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(tf.quat_slerp(q1, q2, 1.0)),
                                   np.asarray(q2), atol=1e-6)

    def test_slerp_halfway_is_half_angle(self):
        # 90-degree rotation about x: halfway should be 45 degrees
        q1 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        q2 = jnp.asarray([np.cos(np.pi / 4), np.sin(np.pi / 4), 0.0, 0.0])
        mid = np.asarray(tf.quat_slerp(q1, q2, 0.5))
        np.testing.assert_allclose(mid, [np.cos(np.pi / 8), np.sin(np.pi / 8), 0, 0],
                                   atol=1e-5)

    def test_slerp_shortest_path(self):
        q1 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        q2 = -jnp.asarray([np.cos(0.1), np.sin(0.1), 0.0, 0.0])
        mid = np.asarray(tf.quat_slerp(q1, q2, 0.5))
        # should interpolate toward +q2 (flipped), tiny rotation
        assert abs(mid[0]) > 0.99

    def test_quat_rotation_matrix(self):
        # 90 degrees about z: (1,0,0) -> (0,1,0)
        q = jnp.asarray([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
        m = np.asarray(tf.quat_to_rotation_matrix(q))
        np.testing.assert_allclose(m @ np.asarray([1.0, 0, 0]), [0, 1, 0], atol=1e-6)

    def test_quat_to_euler_pure_yaw(self):
        q = jnp.asarray([np.cos(np.pi / 8), 0.0, 0.0, np.sin(np.pi / 8)])
        e = np.asarray(tf.quat_to_euler_degrees(q))
        np.testing.assert_allclose(e, [0.0, 0.0, 45.0], atol=1e-3)


class TestColor:
    def test_srgb_roundtrip(self):
        c = jnp.linspace(0.0, 1.0, 64)
        back = np.asarray(col.srgb_to_linear(col.linear_to_srgb(c)))
        np.testing.assert_allclose(back, np.asarray(c), atol=1e-4)

    def test_linear_cutoff(self):
        # below 0.0031308 the curve is linear with slope 12.92
        lo = np.asarray(col.linear_to_srgb(jnp.asarray(0.002)))
        np.testing.assert_allclose(lo, 12.92 * 0.002, atol=1e-7)

    def test_uint8_quantization(self):
        # colorToUchar4 semantics: min(uint(srgb*256), 255)
        q = np.asarray(col.color_to_uint8(jnp.asarray([[1.0, 0.0, 0.5]])))
        assert q[0, 0] == 255 and q[0, 1] == 0 and q[0, 3] == 255

    def test_color_to_float4(self):
        f = np.asarray(col.color_to_float4(jnp.asarray([0.5, 0.5, 0.5])))
        assert f.shape == (4,) and f[3] == 1.0
        assert 0.7 < f[0] < 0.8  # sRGB(0.5) ~ 0.7354


class TestColorRamp:
    def test_single_color_is_last_stop(self):
        c = ramp.bake_color_ramp("viridis", 1)
        np.testing.assert_allclose(c[0], ramp.PRESETS["viridis"][-1][1])

    def test_endpoints(self):
        c = ramp.bake_color_ramp("terrain", 10)
        np.testing.assert_allclose(c[0], ramp.PRESETS["terrain"][0][1], atol=1e-6)
        np.testing.assert_allclose(c[-1], ramp.PRESETS["terrain"][-1][1], atol=1e-6)

    def test_midpoint_interpolation(self):
        # grayscale at u=0.5 -> 0.5 (linear between 0.05 and 0.95)
        c = ramp.bake_color_ramp("grayscale", 3)
        np.testing.assert_allclose(c[1], [0.5, 0.5, 0.5], atol=1e-6)

    def test_unknown_preset_falls_back_to_viridis(self):
        assert ramp.resolve_preset("NoSuchRamp") == "viridis"
        assert ramp.resolve_preset("VIRIDIS") == "viridis"
        assert ramp.resolve_preset("HeatMap") == "heatmap"

    @pytest.mark.parametrize("name", list(ramp.PRESETS))
    def test_all_presets_bake(self, name):
        c = ramp.bake_color_ramp(name, 25)
        assert c.shape == (25, 3)
        assert (c >= 0).all() and (c <= 1).all()


class TestRNG:
    def test_deterministic(self):
        a = np.asarray(rng.uniform4(jnp.arange(100), 3, 1, 42))
        b = np.asarray(rng.uniform4(jnp.arange(100), 3, 1, 42))
        np.testing.assert_array_equal(a, b)

    def test_seeds_decorrelate(self):
        a = np.asarray(rng.uniform4(jnp.arange(100), 3, 1, 42)[0])
        b = np.asarray(rng.uniform4(jnp.arange(100), 3, 1, 43)[0])
        assert not np.array_equal(a, b)

    def test_uniform_range_and_mean(self):
        u = np.asarray(rng.uniform4(jnp.arange(100000), 0, 0, 7)[0])
        assert (u >= 0).all() and (u < 1).all()
        assert abs(u.mean() - 0.5) < 0.01

    def test_unit_vectors(self):
        v = np.asarray(rng.random_unit_vector(jnp.arange(10000), 0, 0, 1))
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
        assert np.abs(v.mean(axis=0)).max() < 0.03  # isotropy

    def test_cosine_direction_hemisphere(self):
        v = np.asarray(rng.random_cosine_direction(jnp.arange(10000), 0, 0, 1))
        assert (v[:, 2] >= 0).all()
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
        # E[cos theta] = 2/3 for cosine-weighted
        assert abs(v[:, 2].mean() - 2.0 / 3.0) < 0.02

    def test_disk(self):
        p = np.asarray(rng.random_in_unit_disk(jnp.arange(10000), 0, 0, 1))
        r = np.linalg.norm(p, axis=-1)
        assert (r <= 1.0 + 1e-6).all()
        assert abs((r < 0.5).mean() - 0.25) < 0.02  # area-uniform
