"""Unit tests for core/lie.py: group axioms, exp/log roundtrips, Jacobians,
and exact parity with the reference's poseDiff semantics
(SensorManagerRos.cpp:122-158)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vil_sensor_fusion_tpu.core import lie


RNG = np.random.default_rng(42)


def random_quat(shape=()):
    q = RNG.normal(size=shape + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


def random_pose(shape=()):
    q = random_quat(shape)
    t = jnp.asarray(RNG.normal(size=shape + (3,)) * 5.0)
    return lie.pose_make(q, t)


class TestQuaternion:
    def test_mul_identity(self):
        q = random_quat((7,))
        I = jnp.broadcast_to(lie.quat_identity(q.dtype), q.shape)
        np.testing.assert_allclose(lie.quat_mul(q, I), q, atol=1e-12)
        np.testing.assert_allclose(lie.quat_mul(I, q), q, atol=1e-12)

    def test_mul_conjugate_is_identity(self):
        q = random_quat((7,))
        out = lie.quat_mul(q, lie.quat_conjugate(q))
        expected = np.tile([1.0, 0, 0, 0], (7, 1))
        np.testing.assert_allclose(out, expected, atol=1e-12)

    def test_rotate_matches_matrix(self):
        q = random_quat((5,))
        v = jnp.asarray(RNG.normal(size=(5, 3)))
        R = lie.quat_to_rot(q)
        np.testing.assert_allclose(
            lie.quat_rotate(q, v), jnp.einsum("bij,bj->bi", R, v), atol=1e-12
        )

    def test_rot_quat_roundtrip(self):
        q = lie.quat_canonical(random_quat((50,)))
        q2 = lie.rot_to_quat(lie.quat_to_rot(q))
        np.testing.assert_allclose(q2, q, atol=1e-9)

    def test_rot_quat_roundtrip_near_pi(self):
        # Rotations near pi stress the trace-based branch.
        axis = np.array([1.0, -2.0, 0.5])
        axis /= np.linalg.norm(axis)
        theta = jnp.asarray(axis * (np.pi - 1e-7))
        R = lie.so3_exp(theta)
        np.testing.assert_allclose(lie.quat_to_rot(lie.rot_to_quat(R)), R, atol=1e-9)

    def test_quat_to_rot_det_one(self):
        R = lie.quat_to_rot(random_quat((20,)))
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)


class TestSO3:
    def test_exp_log_roundtrip(self):
        # Keep |theta| < pi: log returns the principal branch.
        theta = jnp.asarray(RNG.normal(size=(40, 3)) * 0.8)
        np.testing.assert_allclose(lie.so3_log(lie.so3_exp(theta)), theta, atol=1e-9)

    def test_exp_small_angle(self):
        theta = jnp.asarray(RNG.normal(size=(10, 3)) * 1e-9)
        R = lie.so3_exp(theta)
        np.testing.assert_allclose(R, np.eye(3) + np.asarray(lie.hat(theta)), atol=1e-15)
        np.testing.assert_allclose(lie.so3_log(R), theta, atol=1e-15)

    def test_exp_quat_matches_exp_mat(self):
        theta = jnp.asarray(RNG.normal(size=(30, 3)))
        np.testing.assert_allclose(
            lie.quat_to_rot(lie.so3_exp_quat(theta)), lie.so3_exp(theta), atol=1e-12
        )

    def test_left_jacobian_numeric(self):
        # exp(theta + d) ≈ exp(J_l(theta) d) exp(theta)
        theta = jnp.asarray([0.3, -0.7, 0.2])
        Jl = lie.so3_left_jacobian(theta)
        eps = 1e-7
        for k in range(3):
            d = np.zeros(3)
            d[k] = eps
            lhs = lie.so3_exp(theta + jnp.asarray(d))
            rhs = lie.so3_exp(Jl @ jnp.asarray(d)) @ lie.so3_exp(theta)
            np.testing.assert_allclose(lhs, rhs, atol=1e-9)

    def test_jacobian_inverse(self):
        theta = jnp.asarray(RNG.normal(size=(10, 3)))
        J = lie.so3_left_jacobian(theta)
        Jinv = lie.so3_left_jacobian_inv(theta)
        np.testing.assert_allclose(
            J @ Jinv, np.broadcast_to(np.eye(3), (10, 3, 3)), atol=1e-9
        )

    def test_hat_vee(self):
        v = jnp.asarray(RNG.normal(size=(5, 3)))
        np.testing.assert_allclose(lie.vee(lie.hat(v)), v, atol=1e-15)


class TestSE3:
    def test_compose_inverse(self):
        p = random_pose((9,))
        ident = lie.pose_compose(p, lie.pose_inverse(p))
        np.testing.assert_allclose(lie.pose_trans(ident), np.zeros((9, 3)), atol=1e-9)
        np.testing.assert_allclose(
            np.abs(np.asarray(lie.pose_quat(ident))[:, 0]), np.ones(9), atol=1e-9
        )

    def test_between(self):
        p1, p2 = random_pose((4,)), random_pose((4,))
        between = lie.pose_between(p1, p2)
        np.testing.assert_allclose(
            _canon(lie.pose_compose(p1, between)), _canon(p2), atol=1e-9
        )

    def test_exp_log_roundtrip(self):
        # Rotation part must stay below pi (principal branch of log).
        xi = jnp.asarray(RNG.normal(size=(30, 6)) * 0.8)
        np.testing.assert_allclose(lie.se3_log(lie.se3_exp(xi)), xi, atol=1e-9)

    def test_retract_local_roundtrip(self):
        p = random_pose((6,))
        xi = jnp.asarray(RNG.normal(size=(6, 6)) * 0.3)
        p2 = lie.pose_retract(p, xi)
        np.testing.assert_allclose(lie.pose_local(p, p2), xi, atol=1e-9)

    def test_transform_points(self):
        p = random_pose()
        pts = jnp.asarray(RNG.normal(size=(17, 3)))
        R = lie.quat_to_rot(lie.pose_quat(p))
        expected = pts @ np.asarray(R).T + np.asarray(lie.pose_trans(p))
        np.testing.assert_allclose(lie.pose_transform_points(p, pts), expected, atol=1e-12)

    def test_adjoint_property(self):
        # Ad_T * xi == Log(T Exp(xi) T^-1) for small xi
        p = random_pose()
        xi = jnp.asarray(RNG.normal(size=(6,)) * 1e-4)
        lhs = lie.pose_adjoint(p) @ xi
        rhs = lie.se3_log(
            lie.pose_compose(lie.pose_compose(p, lie.se3_exp(xi)), lie.pose_inverse(p))
        )
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)


class TestReferenceParity:
    def test_pose_ref_delta_matches_cpp(self):
        """Replicates SensorManagerRos::poseDiff with explicit Eigen-style math."""
        p1, p2 = random_pose((8,)), random_pose((8,))
        out = lie.pose_ref_delta(p1, p2)
        q1 = np.asarray(lie.pose_quat(p1))
        q2 = np.asarray(lie.pose_quat(p2))
        x1 = np.asarray(lie.pose_trans(p1))
        x2 = np.asarray(lie.pose_trans(p2))
        for i in range(8):
            R1 = np.asarray(lie.quat_to_rot(jnp.asarray(q1[i])))
            dxr = R1.T @ (x2[i] - x1[i])
            np.testing.assert_allclose(lie.pose_trans(out)[i], dxr, atol=1e-9)
            qr = np.asarray(
                lie.quat_mul(jnp.asarray(q2[i]), lie.quat_conjugate(jnp.asarray(q1[i])))
            )
            qr = qr / np.linalg.norm(qr)
            got = np.asarray(lie.pose_quat(out))[i]
            assert np.allclose(got, qr, atol=1e-9) or np.allclose(got, -qr, atol=1e-9)

    def test_euler_roundtrip(self):
        rpy = jnp.asarray(RNG.uniform(-1.2, 1.2, size=(20, 3)))
        np.testing.assert_allclose(
            lie.quat_to_euler(lie.euler_to_quat(rpy)), rpy, atol=1e-9
        )

    def test_rotation_angle(self):
        axis = np.array([0.0, 0.0, 1.0])
        for ang in [0.0, 0.1, 1.0, 3.0]:
            q = lie.so3_exp_quat(jnp.asarray(axis * ang))
            np.testing.assert_allclose(lie.rotation_angle(q), ang, atol=1e-9)


def _canon(p):
    q = lie.quat_canonical(lie.pose_quat(p))
    return lie.pose_make(q, lie.pose_trans(p))


class TestJitVmap:
    def test_jit_compose(self):
        p1, p2 = random_pose((3,)), random_pose((3,))
        f = jax.jit(lie.pose_compose)
        np.testing.assert_allclose(f(p1, p2), lie.pose_compose(p1, p2), atol=1e-12)

    def test_vmap_exp(self):
        xi = jnp.asarray(RNG.normal(size=(5, 6)))
        np.testing.assert_allclose(
            jax.vmap(lie.se3_exp)(xi), lie.se3_exp(xi), atol=1e-12
        )
