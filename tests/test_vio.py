"""VIO front-end tests: camera model, EKF propagation against analytic
ground truth, landmark initialization, and the full filter tracking a
trajectory from synthetic feature observations — the capability the
reference delegates to ROVIO (configured, never tested, in-repo).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vil_sensor_fusion_tpu.core import lie
from vil_sensor_fusion_tpu.data import synthetic as syn
from vil_sensor_fusion_tpu.frontends import vio as V

DTYPE = jnp.float64


class TestCamera:
    def test_project_backproject_roundtrip(self):
        cam = V.carla_camera()
        p = jnp.array([[1.0, -0.5, 5.0], [0.2, 0.3, 2.0]], DTYPE)
        uv, ok = V.project(cam, p)
        assert bool(ok.all())
        p2 = V.backproject(cam, uv, p[:, 2])
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p), rtol=1e-12)

    def test_behind_camera_invalid(self):
        cam = V.carla_camera()
        _, ok = V.project(cam, jnp.array([0.0, 0.0, -1.0], DTYPE))
        assert not bool(ok)

    def test_carla_intrinsics(self):
        cam = V.carla_camera(800, 600, 100.0)
        # fov 100° → fx = 400 / tan(50°)
        assert cam.fx == pytest.approx(400.0 / np.tan(np.radians(50.0)), rel=1e-6)


def _imu_window(traj, t0, t1, hz=200.0, n_pad=64):
    ts = np.arange(t0, t1, 1.0 / hz)[1:]
    ts = np.concatenate([ts, [t1]])
    stream = syn.sample_imu(traj, jnp.asarray(ts, DTYPE))
    n = len(ts)
    accel = np.zeros((n_pad, 3)); gyro = np.zeros((n_pad, 3))
    dts = np.zeros(n_pad)
    accel[:n] = np.asarray(stream.accel); gyro[:n] = np.asarray(stream.gyro)
    prev = np.concatenate([[t0], ts[:-1]])
    dts[:n] = ts - prev
    return (jnp.asarray(accel, DTYPE), jnp.asarray(gyro, DTYPE),
            jnp.asarray(dts, DTYPE))


class TestPropagation:
    def test_zero_noise_imu_follows_truth(self):
        traj = syn.circle(radius=12.0, period=10.0)
        cfg = V.VioConfig(num_landmarks=4)
        t0 = jnp.zeros((), DTYPE)
        s = V.init(cfg, traj.pose_fn(t0), traj.vel_fn(t0), jnp.zeros(6, DTYPE))
        t = 0.0
        for _ in range(10):
            a, g, dts = _imu_window(traj, t, t + 0.05)
            s = V.propagate(cfg, s, a, g, dts)
            t += 0.05
        gt = traj.pose_fn(jnp.asarray(t, DTYPE))
        err = lie.pose_local(gt, s.pose)
        assert float(jnp.linalg.norm(err[:3])) < 1e-3
        assert float(jnp.linalg.norm(err[3:])) < 1e-4

    def test_covariance_grows_without_updates(self):
        traj = syn.circle()
        cfg = V.VioConfig(num_landmarks=4)
        t0 = jnp.zeros((), DTYPE)
        s = V.init(cfg, traj.pose_fn(t0), traj.vel_fn(t0), jnp.zeros(6, DTYPE))
        tr0 = float(jnp.trace(s.cov[:6, :6]))
        a, g, dts = _imu_window(traj, 0.0, 0.5, n_pad=128)
        s = V.propagate(cfg, s, a, g, dts)
        assert float(jnp.trace(s.cov[:6, :6])) > tr0


class TestLandmarkInit:
    def test_init_from_pixel_depth(self):
        cfg = V.VioConfig(num_landmarks=4)
        pose = lie.pose_make(
            lie.so3_exp_quat(jnp.array([0.0, 0.0, 0.3], DTYPE)),
            jnp.array([1.0, 2.0, 0.5], DTYPE))
        s = V.init(cfg, pose, jnp.zeros(3, DTYPE), jnp.zeros(6, DTYPE))
        # A known world point in front of the camera.
        l_true = lie.pose_trans(pose) + lie.quat_rotate(
            lie.pose_quat(pose), jnp.array([0.5, -0.2, 6.0], DTYPE))
        p_cam = lie.quat_rotate(
            lie.quat_conjugate(lie.pose_quat(pose)),
            l_true - lie.pose_trans(pose))
        uv, ok = V.project(cfg.cam, p_cam)
        assert bool(ok)
        s = V.init_landmark(cfg, s, jnp.asarray(1, jnp.int32), uv,
                            p_cam[2], jnp.asarray(0.05, DTYPE),
                            jnp.asarray(True))
        np.testing.assert_allclose(
            np.asarray(s.landmarks[1]), np.asarray(l_true), atol=1e-9)
        assert float(s.lm_valid[1]) == 1.0
        # Covariance block was reset from backprojection jacobian (small).
        blk = np.asarray(s.cov[15 + 3:15 + 6, 15 + 3:15 + 6])
        assert 0 < np.trace(blk) < 1.0
        # Disabled init leaves everything alone.
        s2 = V.init_landmark(cfg, s, jnp.asarray(2, jnp.int32), uv,
                             p_cam[2], jnp.asarray(0.05, DTYPE),
                             jnp.asarray(False))
        assert float(s2.lm_valid[2]) == 0.0


class TestFullFilter:
    @pytest.mark.slow
    def test_tracks_circle_with_features(self):
        traj = syn.circle(radius=12.0, period=10.0)
        cfg = V.VioConfig(num_landmarks=24, pixel_sigma=1.0,
                          update_iters=2)
        T = 40
        frame_times = (np.arange(T) + 1.0) / 20.0
        poses_gt = np.asarray(jax.vmap(traj.pose_fn)(
            jnp.asarray(frame_times, DTYPE)))
        imu_w = V.synthetic.imu_windows_for_frames(
            traj, frame_times, imu_hz=200.0, dtype=DTYPE)
        lms = V.synthetic.landmark_field(300, seed=3, extent=30.0)
        frames = V.synthetic.make_frames(
            cfg, poses_gt, imu_w, lms, pixel_noise=0.5, depth_noise=0.05)

        t0 = jnp.zeros((), DTYPE)
        s = V.init(cfg, traj.pose_fn(t0), traj.vel_fn(t0), jnp.zeros(6, DTYPE))
        s, out = jax.jit(lambda s, f: V.run(cfg, s, f))(s, frames)

        err = np.linalg.norm(
            np.asarray(lie.pose_trans(out.pose)) -
            poses_gt[:, 4:7], axis=-1)
        assert err.max() < 0.2, err
        # Covariance output is (trans, rot)-ordered, SPD, and sane.
        covs = np.asarray(out.cov)
        assert covs.shape == (T, 6, 6)
        eig = np.linalg.eigvalsh(covs)
        assert (eig > -1e-9).all()
        assert eig.max() < 1.0


class TestGravityUpdate:
    def test_static_roll_error_corrected_yaw_untouched(self):
        """A roll-perturbed attitude under a static accelerometer reading
        must be pulled back toward level by gravity_update; yaw (rotation
        about gravity) is unobservable and must not move."""
        from vil_sensor_fusion_tpu.frontends.vio import ekf as E

        cfg = V.VioConfig(num_landmarks=4, gravity=9.81)
        # True attitude: level with yaw 0.7; filter believes roll 0.1 extra.
        q_true = lie.so3_exp_quat(jnp.array([0.0, 0.0, 0.7], DTYPE))
        q_est = lie.quat_mul(q_true,
                             lie.so3_exp_quat(jnp.array([0.1, 0.0, 0.0],
                                                        DTYPE)))
        s = V.init(cfg, lie.pose_make(q_est, jnp.zeros(3, DTYPE)),
                   jnp.zeros(3, DTYPE), jnp.zeros(6, DTYPE),
                   sigmas=(0.2, 1e-3, 1e-2, 1e-2, 1e-3))
        # Static: accelerometer reads g along the TRUE body z.
        R_true = lie.quat_to_rot(q_true)
        accel = 9.81 * (R_true.T @ jnp.array([0.0, 0.0, 1.0], DTYPE))
        err0 = lie.quat_log(lie.quat_mul(lie.quat_conjugate(q_true),
                                         lie.pose_quat(s.pose)))
        for _ in range(20):
            s = E.gravity_update(cfg, s, accel)
        err1 = lie.quat_log(lie.quat_mul(lie.quat_conjugate(q_true),
                                         lie.pose_quat(s.pose)))
        # Roll/pitch error shrinks by >5x; yaw error stays ~0.
        assert float(jnp.linalg.norm(err1[:2])) < 0.2 * float(
            jnp.linalg.norm(err0[:2]))
        assert abs(float(err1[2])) < 1e-3

    def test_dynamic_window_gated_out(self):
        """During strong acceleration the reading says nothing about
        gravity: the gate must make the update a no-op."""
        from vil_sensor_fusion_tpu.frontends.vio import ekf as E

        cfg = V.VioConfig(num_landmarks=4)
        q0 = lie.so3_exp_quat(jnp.array([0.05, 0.0, 0.0], DTYPE))
        s = V.init(cfg, lie.pose_make(q0, jnp.zeros(3, DTYPE)),
                   jnp.zeros(3, DTYPE), jnp.zeros(6, DTYPE))
        accel = jnp.array([3.0, 0.0, 12.0], DTYPE)   # ‖f‖ far from g
        s2 = E.gravity_update(cfg, s, accel)
        np.testing.assert_allclose(np.asarray(s2.pose),
                                   np.asarray(s.pose), atol=1e-9)
        # And a gravity-magnitude reading while MOVING (is_static=0) must
        # also be a no-op — smooth driving carries vehicle acceleration
        # the model would misread as attitude bias.
        accel_g = jnp.array([0.1, 0.0, 9.81], DTYPE)
        s2 = E.gravity_update(cfg, s, accel_g, is_static=0.0)
        np.testing.assert_allclose(np.asarray(s2.pose),
                                   np.asarray(s.pose), atol=1e-9)

    def test_smooth_cruise_rejected_by_velocity_gate(self):
        """A smooth constant-speed cruise (or gentle lane-weave) looks
        'static' to window IMU statistics — mean|ω|≈0, std‖f‖≈0, ‖f‖≈g —
        but the filter KNOWS it is moving. The velocity-Mahalanobis gate
        must make the gravity update a no-op there (regression: without
        it, the phantom-roll bias compounded to ~7× fused ATE over a
        345 s soak drive)."""
        from vil_sensor_fusion_tpu.frontends.vio import ekf as E

        cfg = V.VioConfig(num_landmarks=4)
        q0 = lie.so3_exp_quat(jnp.array([0.05, 0.0, 0.0], DTYPE))
        # Confidently moving at 4 m/s (tight velocity covariance).
        s = V.init(cfg, lie.pose_make(q0, jnp.zeros(3, DTYPE)),
                   jnp.array([4.0, 0.0, 0.0], DTYPE), jnp.zeros(6, DTYPE),
                   sigmas=(0.2, 1e-3, 1e-2, 1e-2, 1e-3))
        accel_g = jnp.array([0.1, 0.0, 9.81], DTYPE)
        # Window statistics say static (is_static=1) — the velocity gate
        # must still reject.
        s2 = E.gravity_update(cfg, s, accel_g, is_static=1.0)
        np.testing.assert_allclose(np.asarray(s2.pose),
                                   np.asarray(s.pose), atol=1e-9)
        # A genuinely stationary filter with the same window accepts.
        s_st = V.init(cfg, lie.pose_make(q0, jnp.zeros(3, DTYPE)),
                      jnp.zeros(3, DTYPE), jnp.zeros(6, DTYPE),
                      sigmas=(0.2, 1e-3, 1e-2, 1e-2, 1e-3))
        s3 = E.gravity_update(cfg, s_st, accel_g, is_static=1.0)
        assert float(jnp.max(jnp.abs(s3.pose - s_st.pose))) > 1e-6


class TestZeroVelocityUpdate:
    def test_static_platform_velocity_pulled_to_zero(self):
        from vil_sensor_fusion_tpu.frontends.vio import ekf as E

        cfg = V.VioConfig(num_landmarks=4)
        s = V.init(cfg, lie.pose_make(jnp.array([1.0, 0, 0, 0], DTYPE),
                                      jnp.zeros(3, DTYPE)),
                   jnp.array([0.3, -0.2, 0.1], DTYPE), jnp.zeros(6, DTYPE),
                   sigmas=(1e-3, 1e-3, 0.5, 1e-2, 1e-3))
        s2 = E.zero_velocity_update(cfg, s, jnp.asarray(1.0, DTYPE))
        assert float(jnp.linalg.norm(s2.vel)) < 0.1 * float(
            jnp.linalg.norm(s.vel))

    def test_moving_window_is_noop(self):
        from vil_sensor_fusion_tpu.frontends.vio import ekf as E

        cfg = V.VioConfig(num_landmarks=4)
        s = V.init(cfg, lie.pose_make(jnp.array([1.0, 0, 0, 0], DTYPE),
                                      jnp.zeros(3, DTYPE)),
                   jnp.array([0.3, -0.2, 0.1], DTYPE), jnp.zeros(6, DTYPE))
        s2 = E.zero_velocity_update(cfg, s, jnp.asarray(0.0, DTYPE))
        np.testing.assert_allclose(np.asarray(s2.vel), np.asarray(s.vel),
                                   atol=1e-9)

    def test_motion_detector(self):
        from vil_sensor_fusion_tpu.frontends.vio import ekf as E

        cfg = V.VioConfig(num_landmarks=4)
        n = 16
        dts = jnp.full((n,), 0.005, DTYPE)
        accel_static = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 9.81], DTYPE), (n, 3))
        gyro_static = jnp.zeros((n, 3), DTYPE)
        assert float(E.detect_no_motion(cfg, accel_static, gyro_static,
                                        dts)) == 1.0
        gyro_moving = jnp.full((n, 3), 0.2, DTYPE)
        assert float(E.detect_no_motion(cfg, accel_static, gyro_moving,
                                        dts)) == 0.0

    def test_confident_moving_filter_rejects_zuv(self):
        """Smooth constant-velocity motion is IMU-indistinguishable from
        standstill — the Mahalanobis gate must reject v=0 when the filter
        confidently believes it is moving (ROVIO MahalanobisTh0)."""
        from vil_sensor_fusion_tpu.frontends.vio import ekf as E

        cfg = V.VioConfig(num_landmarks=4)
        s = V.init(cfg, lie.pose_make(jnp.array([1.0, 0, 0, 0], DTYPE),
                                      jnp.zeros(3, DTYPE)),
                   jnp.array([4.0, 0.0, 0.0], DTYPE), jnp.zeros(6, DTYPE),
                   sigmas=(1e-3, 1e-3, 0.05, 1e-2, 1e-3))
        # Motion detector wrongly says static (straight glide):
        s2 = E.zero_velocity_update(cfg, s, jnp.asarray(1.0, DTYPE))
        np.testing.assert_allclose(np.asarray(s2.vel), np.asarray(s.vel),
                                   atol=1e-6)
