"""Golden tests for the math library against independent NumPy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from banggameengine_tpu import math3d


def np_rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)


def np_rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def np_rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def np_euler_to_mat(e):
    """R = Rz @ Ry @ Rx (apply X first), the library's convention."""
    return np_rot_z(e[2]) @ np_rot_y(e[1]) @ np_rot_x(e[0])


RNG = np.random.default_rng(0)


def rand_euler(n):
    return RNG.uniform(-np.pi, np.pi, (n, 3)).astype(np.float32)


class TestQuat:
    def test_identity_rotates_nothing(self):
        v = RNG.normal(size=(5, 3)).astype(np.float32)
        out = math3d.quat_rotate(math3d.quat_identity((5,)), jnp.asarray(v))
        np.testing.assert_allclose(out, v, atol=1e-6)

    def test_from_euler_matches_matrix(self):
        e = rand_euler(32)
        q = math3d.quat_from_euler_xyz(jnp.asarray(e))
        m = np.asarray(math3d.quat_to_mat3(q))
        for i in range(len(e)):
            np.testing.assert_allclose(m[i], np_euler_to_mat(e[i]), atol=1e-5)

    def test_mul_composes_rotation(self):
        e1, e2 = rand_euler(8), rand_euler(8)
        q1 = math3d.quat_from_euler_xyz(jnp.asarray(e1))
        q2 = math3d.quat_from_euler_xyz(jnp.asarray(e2))
        v = RNG.normal(size=(8, 3)).astype(np.float32)
        lhs = math3d.quat_rotate(math3d.quat_mul(q1, q2), jnp.asarray(v))
        rhs = math3d.quat_rotate(q1, math3d.quat_rotate(q2, jnp.asarray(v)))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_mat3_roundtrip(self):
        e = rand_euler(64)
        q = math3d.quat_from_euler_xyz(jnp.asarray(e))
        q2 = math3d.quat_from_mat3(math3d.quat_to_mat3(q))
        # q and -q are the same rotation
        dot = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_euler_zyx_roundtrip(self):
        # restrict pitch to avoid gimbal ambiguity
        e = rand_euler(64)
        e[:, 1] = np.clip(e[:, 1], -1.4, 1.4)
        q = math3d.quat_from_euler_xyz(jnp.asarray(e))
        e2 = math3d.euler_zyx_from_quat(q)
        q2 = math3d.quat_from_euler_xyz(e2)
        dot = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-4)

    def test_integrate_small_step(self):
        q = math3d.quat_identity((1,))
        omega = jnp.asarray([[0.0, 2.0, 0.0]], jnp.float32)
        dt = 1e-3
        out = q
        for _ in range(100):
            out = math3d.quat_integrate(out, omega, jnp.full((1,), dt))
        # After 0.1s at 2 rad/s about Y: angle 0.2 rad
        expected = math3d.quat_from_axis_angle(
            jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), jnp.asarray([0.2])
        )
        dot = np.abs(np.sum(np.asarray(out) * np.asarray(expected)))
        assert dot > 1.0 - 1e-4


class TestMat:
    def test_srt_compose(self):
        e = rand_euler(16)
        s = RNG.uniform(0.1, 3.0, (16, 3)).astype(np.float32)
        t = RNG.normal(size=(16, 3)).astype(np.float32)
        m = np.asarray(math3d.mat_from_euler_srt(jnp.asarray(s), jnp.asarray(e), jnp.asarray(t)))
        for i in range(16):
            ref = np.eye(4)
            ref[:3, :3] = np_euler_to_mat(e[i]) @ np.diag(s[i])
            ref[:3, 3] = t[i]
            np.testing.assert_allclose(m[i], ref, atol=1e-5)

    def test_affine_inverse(self):
        e = rand_euler(8)
        s = RNG.uniform(0.2, 2.0, (8, 3)).astype(np.float32)
        t = RNG.normal(size=(8, 3)).astype(np.float32)
        m = math3d.mat_from_euler_srt(jnp.asarray(s), jnp.asarray(e), jnp.asarray(t))
        inv = math3d.mat_affine_inverse(m)
        prod = np.asarray(math3d.mat_mul(m, inv))
        for i in range(8):
            np.testing.assert_allclose(prod[i], np.eye(4), atol=1e-2)

    def test_transform_point_matches_matmul(self):
        e = rand_euler(4)
        s = np.ones((4, 3), np.float32)
        t = RNG.normal(size=(4, 3)).astype(np.float32)
        m = math3d.mat_from_euler_srt(jnp.asarray(s), jnp.asarray(e), jnp.asarray(t))
        p = RNG.normal(size=(4, 3)).astype(np.float32)
        out = np.asarray(math3d.mat_transform_point(m, jnp.asarray(p)))
        for i in range(4):
            hp = np.append(p[i], 1.0)
            np.testing.assert_allclose(out[i], (np.asarray(m[i]) @ hp)[:3], atol=1e-5)

    def test_normal_matrix_preserves_normals(self):
        # Nonuniform scale: normal must be transformed by inverse-transpose
        s = jnp.asarray([[2.0, 1.0, 0.5]], jnp.float32)
        e = jnp.asarray([[0.3, 0.4, 0.5]], jnp.float32)
        t = jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32)
        m = math3d.mat_from_euler_srt(s, e, t)
        nm = math3d.normal_matrix(m)
        # tangent plane check: for surface y=0 plane with normal (0,1,0) and
        # tangent (1,0,0): transformed normal . transformed tangent == 0
        n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
        tan = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        n2 = jnp.einsum("bij,bj->bi", nm, n)
        t2 = math3d.mat_transform_dir(m, tan)
        assert abs(float(jnp.sum(n2 * t2))) < 1e-5


class TestCamera:
    def test_look_at_centers_target(self):
        eye = jnp.asarray([0.0, 2.0, -7.0], jnp.float32)
        at = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
        v = math3d.mtx_look_at(eye, at)
        p = math3d.mat_transform_point(v, at)
        np.testing.assert_allclose(np.asarray(p)[:2], [0, 0], atol=1e-6)
        assert float(p[2]) > 0  # +Z forward

    def test_proj_depth_range(self):
        proj = math3d.mtx_proj(60.0, 16 / 9, 0.1, 1000.0)
        view = math3d.mtx_look_at(
            jnp.zeros(3, jnp.float32), jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
        )
        vp = math3d.mat_mul(proj, view)

        def ndc_depth(z):
            clip = np.asarray(vp) @ np.array([0, 0, z, 1.0])
            return clip[2] / clip[3]

        # f32 cancellation near the near plane bounds accuracy to ~1e-3
        np.testing.assert_allclose(ndc_depth(0.1), 0.0, atol=2e-3)
        np.testing.assert_allclose(ndc_depth(1000.0), 1.0, atol=1e-4)
        assert 0 < ndc_depth(10.0) < 1

    def test_yaw_pitch_forward(self):
        # yaw = pi/2 faces +Z (reference default, Camera.cpp:19-26)
        f = math3d.yaw_pitch_forward(jnp.float32(np.pi / 2), jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(f), [0, 0, 1], atol=1e-6)
