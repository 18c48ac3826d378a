"""Unit tests for IMU preintegration.

Golden values replicate the reference's gtest expectations
(gtsam_fusion/test/UnitTests.cpp:58-66): constant accel (0.35,0.35,0.35),
zero gyro, 50 Hz samples over a 0.05 s window ending mid-sample ⇒
ΔV = 0.0175 and ΔP = 0.0011875 per axis (includes GTSAM's velocity-Verlet
position update 0.5*a*dt² per step).
"""

import numpy as np
import jax
import jax.numpy as jnp

from vil_sensor_fusion_tpu.core import lie
from vil_sensor_fusion_tpu.core import preintegration as pre

PARAMS = pre.ImuParams()


def _pim(accel, gyro, dts, bias=None):
    bias = jnp.zeros(6) if bias is None else bias
    return pre.preintegrate(
        jnp.asarray(accel, jnp.float64),
        jnp.asarray(gyro, jnp.float64),
        jnp.asarray(dts, jnp.float64),
        bias,
        PARAMS,
    )


class TestGoldenReference:
    def test_constant_accel_window(self):
        """UnitTests.cpp ImuManagerTest.test1 expected values (lines 58-66).

        The reference feeds samples (t=0, a=0), (t=0.1, a=0.1), (t=0.2,
        a=0.2) — gyro equal to accel — and integrates the window (0, 0.15]:
        one full step a=0.1 over dt=0.1, then the interpolated sample
        a=0.15 at t=0.15 over dt=0.05 (IMUManager.cpp:46-66).
        ΔV = 0.1*0.1 + 0.15*0.05 = 0.0175;
        ΔP = 0.5*0.1*0.01 + (0.01*0.05 + 0.5*0.15*0.0025) = 0.0011875.
        The gyro rotation axis (1,1,1) is parallel to the accel, so the
        rotating frame leaves the expectations exact.
        """
        accel = np.array([[0.1] * 3, [0.15] * 3])
        gyro = np.array([[0.1] * 3, [0.15] * 3])
        dts = np.array([0.1, 0.05])
        out = _pim(accel, gyro, dts)
        np.testing.assert_allclose(out.delta_v, [0.0175] * 3, atol=1e-12)
        np.testing.assert_allclose(out.delta_p, [0.0011875] * 3, atol=1e-12)
        np.testing.assert_allclose(out.delta_t, 0.15, atol=1e-12)

    def test_pure_rotation(self):
        w = np.array([0.0, 0.0, 0.5])  # rad/s about z
        N = 100
        dt = 0.01
        accel = np.zeros((N, 3))
        gyro = np.tile(w, (N, 1))
        out = _pim(accel, gyro, np.full(N, dt))
        expected = np.asarray(lie.so3_exp(jnp.asarray(w * N * dt)))
        np.testing.assert_allclose(out.delta_R, expected, atol=1e-9)

    def test_gravity_free_accumulation(self):
        # Rotating body with constant body-frame accel: compare against a
        # fine Euler integration of the same discrete model.
        rng = np.random.default_rng(0)
        N = 50
        dt = 0.005
        accel = rng.normal(size=(N, 3))
        gyro = rng.normal(size=(N, 3)) * 0.3
        out = _pim(accel, gyro, np.full(N, dt))

        R = np.eye(3)
        v = np.zeros(3)
        p = np.zeros(3)
        for k in range(N):
            Ra = R @ accel[k]
            p = p + v * dt + 0.5 * Ra * dt * dt
            v = v + Ra * dt
            R = R @ np.asarray(lie.so3_exp(jnp.asarray(gyro[k] * dt)))
        np.testing.assert_allclose(out.delta_R, R, atol=1e-9)
        np.testing.assert_allclose(out.delta_v, v, atol=1e-9)
        np.testing.assert_allclose(out.delta_p, p, atol=1e-9)


class TestMaskAndWindow:
    def test_masked_padding_is_noop(self):
        rng = np.random.default_rng(1)
        accel = rng.normal(size=(10, 3))
        gyro = rng.normal(size=(10, 3)) * 0.1
        dts = np.full(10, 0.01)
        full = _pim(accel[:6], gyro[:6], dts[:6])
        padded = _pim(accel, gyro, np.concatenate([dts[:6], np.zeros(4)]))
        np.testing.assert_allclose(padded.delta_R, full.delta_R, atol=1e-12)
        np.testing.assert_allclose(padded.delta_v, full.delta_v, atol=1e-12)
        np.testing.assert_allclose(padded.delta_p, full.delta_p, atol=1e-12)
        np.testing.assert_allclose(padded.cov, full.cov, atol=1e-12)

    def test_extract_window_interpolation(self):
        """Replicates IMUManager.cpp:46-66: full samples inside the window
        plus a final interpolated sample landing exactly on endTime."""
        times = jnp.asarray(np.arange(10) * 0.02)  # 0.00 .. 0.18
        accel = jnp.asarray(np.linspace(1.0, 10.0, 10)[:, None] * np.ones((10, 3)))
        gyro = jnp.zeros((10, 3))
        a, g, dts = pre.extract_window(
            times, accel, gyro, jnp.asarray(0.0), jnp.asarray(0.05), max_samples=8
        )
        # Samples at t=0.02 (dt 0.02), t=0.04 (dt 0.02), interp at 0.05 (dt 0.01)
        total = float(jnp.sum(dts))
        np.testing.assert_allclose(total, 0.05, atol=1e-12)
        nz = np.asarray(dts) > 0
        assert nz.sum() == 3
        # Interpolated accel: halfway between samples at 0.04 (a=3) and 0.06 (a=4)
        np.testing.assert_allclose(np.asarray(a)[-1], [3.5] * 3, atol=1e-9)

    def test_window_then_preintegrate_matches_reference_values(self):
        """End-to-end replication of UnitTests.cpp ImuManagerTest.test1:
        stream [(0,0),(0.1,0.1),(0.2,0.2)], window (0, 0.15]."""
        times = jnp.asarray([0.0, 0.1, 0.2])
        accel = jnp.asarray([[0.0] * 3, [0.1] * 3, [0.2] * 3])
        gyro = jnp.asarray([[0.0] * 3, [0.1] * 3, [0.2] * 3])
        out = pre.preintegrate_window(
            times, accel, gyro, jnp.asarray(0.0), jnp.asarray(0.15),
            jnp.zeros(6), PARAMS, max_samples=8,
        )
        np.testing.assert_allclose(out.delta_v, [0.0175] * 3, atol=1e-12)
        np.testing.assert_allclose(out.delta_p, [0.0011875] * 3, atol=1e-12)
        np.testing.assert_allclose(out.delta_t, 0.15, atol=1e-12)


class TestBiasJacobians:
    def test_bias_jacobians_match_finite_difference(self):
        rng = np.random.default_rng(2)
        N = 20
        dt = 0.01
        accel = jnp.asarray(rng.normal(size=(N, 3)) + np.array([0, 0, 9.81]))
        gyro = jnp.asarray(rng.normal(size=(N, 3)) * 0.2)
        dts = jnp.full(N, dt)
        bias0 = jnp.zeros(6)
        base = pre.preintegrate(accel, gyro, dts, bias0, PARAMS)

        eps = 1e-6
        for k in range(6):
            db = np.zeros(6)
            db[k] = eps
            pert = pre.preintegrate(accel, gyro, dts, jnp.asarray(db), PARAMS)
            dv_fd = (np.asarray(pert.delta_v) - np.asarray(base.delta_v)) / eps
            dp_fd = (np.asarray(pert.delta_p) - np.asarray(base.delta_p)) / eps
            J_v = np.concatenate([np.asarray(base.dv_dba), np.asarray(base.dv_dbg)], 1)
            J_p = np.concatenate([np.asarray(base.dp_dba), np.asarray(base.dp_dbg)], 1)
            np.testing.assert_allclose(dv_fd, J_v[:, k], atol=1e-4)
            np.testing.assert_allclose(dp_fd, J_p[:, k], atol=1e-4)
            if k >= 3:  # gyro bias affects rotation
                dR_fd = np.asarray(
                    lie.so3_log(jnp.asarray(np.asarray(base.delta_R).T @ np.asarray(pert.delta_R)))
                ) / eps
                np.testing.assert_allclose(dR_fd, np.asarray(base.dR_dbg)[:, k - 3], atol=1e-4)


class TestPredict:
    def test_predict_freefall(self):
        # Stationary body, accel measures +g (reaction), predict should stay put.
        N = 10
        dt = 0.01
        accel = jnp.tile(jnp.asarray([0.0, 0.0, 9.81]), (N, 1))
        gyro = jnp.zeros((N, 3))
        pim = pre.preintegrate(accel, gyro, jnp.full(N, dt), jnp.zeros(6), PARAMS)
        pose0 = lie.pose_identity(jnp.float64)
        pose1, vel1 = pre.predict(pim, pose0, jnp.zeros(3), jnp.zeros(6), PARAMS)
        np.testing.assert_allclose(lie.pose_trans(pose1), np.zeros(3), atol=1e-9)
        np.testing.assert_allclose(vel1, np.zeros(3), atol=1e-9)

    def test_predict_constant_velocity(self):
        N = 10
        dt = 0.01
        accel = jnp.tile(jnp.asarray([0.0, 0.0, 9.81]), (N, 1))
        gyro = jnp.zeros((N, 3))
        pim = pre.preintegrate(accel, gyro, jnp.full(N, dt), jnp.zeros(6), PARAMS)
        v0 = jnp.asarray([2.0, -1.0, 0.5])
        pose1, vel1 = pre.predict(pim, lie.pose_identity(jnp.float64), v0, jnp.zeros(6), PARAMS)
        np.testing.assert_allclose(vel1, v0, atol=1e-9)
        np.testing.assert_allclose(lie.pose_trans(pose1), np.asarray(v0) * 0.1, atol=1e-9)


class TestCovariance:
    def test_covariance_psd_and_grows(self):
        N = 50
        dt = 0.005
        rng = np.random.default_rng(3)
        accel = jnp.asarray(rng.normal(size=(N, 3)))
        gyro = jnp.asarray(rng.normal(size=(N, 3)) * 0.1)
        pim = pre.preintegrate(accel, gyro, jnp.full(N, dt), jnp.zeros(6), PARAMS)
        cov = np.asarray(pim.cov)
        np.testing.assert_allclose(cov, cov.T, atol=1e-15)
        eig = np.linalg.eigvalsh(cov)
        assert (eig > -1e-15).all()
        assert eig.max() > 0

        # Longer window ⇒ strictly more uncertainty (trace).
        pim_short = pre.preintegrate(accel[:10], gyro[:10], jnp.full(10, dt), jnp.zeros(6), PARAMS)
        assert np.trace(np.asarray(pim.cov)) > np.trace(np.asarray(pim_short.cov))

    def test_combined_cov_15(self):
        N = 10
        pim = pre.preintegrate(
            jnp.zeros((N, 3)), jnp.zeros((N, 3)), jnp.full(N, 0.01), jnp.zeros(6), PARAMS
        )
        c15 = np.asarray(pre.combined_covariance_15(pim, PARAMS))
        assert c15.shape == (15, 15)
        np.testing.assert_allclose(c15[:9, :9], np.asarray(pim.cov), atol=1e-15)
        np.testing.assert_allclose(
            np.diag(c15)[9:12], [PARAMS.cov_bias_acc * 0.1] * 3, atol=1e-12
        )


class TestJit:
    def test_scan_jits_once(self):
        f = jax.jit(
            lambda a, g, d, b: pre.preintegrate(a, g, d, b, PARAMS).delta_p
        )
        a = jnp.zeros((32, 3))
        g = jnp.zeros((32, 3))
        d = jnp.full(32, 0.01)
        out = f(a, g, d, jnp.zeros(6))
        assert out.shape == (3,)
