"""Fixed-lag smoother tests.

The reference validates its back-end with synthetic-message integration tests
(gtsam_fusion/test/UnitTests.cpp:236-393: schedule of images/clouds/IMU,
assert graph bookkeeping, solve). Here we go further: the smoother must
*track a known analytic trajectory* through many window slides, which
exercises preintegration, between-factors, GN convergence, and Schur
marginalization end-to-end against exact ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vil_sensor_fusion_tpu.core import lie
from vil_sensor_fusion_tpu.core import preintegration as pre
from vil_sensor_fusion_tpu.data import synthetic as syn
from vil_sensor_fusion_tpu import graph as G

IMU_HZ = 200.0
KEY_HZ = 20.0
CFG = G.SmootherConfig(window=6, between_slots=12, gn_iters=6)
MAX_IMU = 16  # 200/20 = 10 samples per window + interp slot


def _run_tracking(traj, n_keys, use_between=True, btw_valid=1.0,
                  meas_fn=None, key=None, odo_noise=(0.0, 0.0)):
    """Drive the smoother along a trajectory; return (est poses, gt poses)."""
    dtype = jnp.float64
    t_imu = jnp.arange(int(n_keys / KEY_HZ * IMU_HZ) + 50, dtype=dtype) / IMU_HZ
    imu = syn.sample_imu(traj, t_imu)
    t_keys = (jnp.arange(n_keys, dtype=dtype) + 1.0) / KEY_HZ
    gt = syn.sample_ground_truth(traj, jnp.concatenate([jnp.zeros((1,), dtype), t_keys]))
    odo = syn.sample_odometry(traj, gt.times, *odo_noise, key=key)

    pose0 = gt.poses[0]
    vel0 = gt.vels[0]
    s = G.init(CFG, pose0, vel0, jnp.zeros(6, dtype), jnp.zeros((), dtype))

    cov = jnp.diag(jnp.array([0.1**2] * 3 + [0.05**2] * 3, dtype))

    @jax.jit
    def step(s, t_new, meas, valid):
        _, _, bias, t_prev = G.latest(s)
        pim = pre.preintegrate_window(
            imu.times, imu.accel, imu.gyro, t_prev, t_new, bias, CFG.imu,
            max_samples=MAX_IMU)
        s = G.add_keyframe(CFG, s, t_new, pim)
        i_win = jnp.asarray(CFG.window - 2, jnp.int32)
        j_win = jnp.asarray(CFG.window - 1, jnp.int32)
        s = G.add_between(CFG, s, i_win, j_win, meas, cov,
                          jnp.asarray(valid, dtype))
        return G.solve(CFG, s)

    est = []
    for k in range(n_keys):
        if meas_fn is not None:
            meas = meas_fn(odo.poses[k], odo.poses[k + 1])
        else:
            meas = lie.pose_between(odo.poses[k], odo.poses[k + 1])
        s = step(s, t_keys[k], meas, btw_valid if use_between else 0.0)
        est.append(np.asarray(G.latest(s)[0]))
    return np.stack(est), np.asarray(gt.poses[1:]), s


def _pose_errors(est, gt):
    dt = np.linalg.norm(est[:, 4:7] - gt[:, 4:7], axis=-1)
    dq = np.abs(np.sum(est[:, :4] * gt[:, :4], axis=-1))
    ang = 2.0 * np.arccos(np.clip(dq, 0.0, 1.0))
    return dt, ang


class TestSmootherTracking:
    @pytest.mark.slow
    def test_stationary(self):
        """Zero-motion: estimates stay pinned at the origin."""
        traj = syn.trajectory(
            lambda t: jnp.stack([0.0 * t, 0.0 * t, 0.0 * t]),
            lambda t: jnp.eye(3, dtype=t.dtype) * (1.0 + 0.0 * t),
        )
        est, gt, _ = _run_tracking(traj, n_keys=10)
        dt, ang = _pose_errors(est, gt)
        assert dt.max() < 1e-4
        assert ang.max() < 1e-5

    @pytest.mark.slow
    def test_circle_with_between(self):
        """Circle drive, noiseless IMU + exact between factors: the smoother
        must track GT to sub-mm through >3 window lengths of slides."""
        est, gt, _ = _run_tracking(syn.circle(), n_keys=24)
        dt, ang = _pose_errors(est, gt)
        assert dt.max() < 1e-3, dt
        assert ang.max() < 1e-4, ang

    @pytest.mark.slow
    def test_imu_only_prediction(self):
        """No between factors: pure preintegration chain still tracks a
        smooth trajectory over a short horizon (noiseless IMU)."""
        est, gt, _ = _run_tracking(syn.circle(), n_keys=12, use_between=False)
        dt, ang = _pose_errors(est, gt)
        assert dt.max() < 5e-2, dt
        assert ang.max() < 5e-3, ang

    @pytest.mark.slow
    def test_gated_between_is_ignored(self):
        """A between factor with valid=0 (degeneracy-gated) must not move the
        estimate: replicates the drop path of degerate_odometry_filter.cpp:39-46."""
        bad = lie.pose_make(
            lie.so3_exp_quat(jnp.array([0.3, 0.2, 0.1])), jnp.array([5.0, 5.0, 5.0]))
        est_gated, gt, _ = _run_tracking(
            syn.circle(), n_keys=10, meas_fn=lambda a, b: bad, btw_valid=0.0)
        est_ref, _, _ = _run_tracking(syn.circle(), n_keys=10, use_between=False)
        np.testing.assert_allclose(est_gated, est_ref, atol=1e-9)

    def test_noisy_between_bounded(self):
        """With noisy odometry the fused error stays bounded by the noise."""
        est, gt, _ = _run_tracking(
            syn.circle(), n_keys=24, key=jax.random.PRNGKey(0),
            odo_noise=(0.02, 0.005))
        dt, ang = _pose_errors(est, gt)
        assert dt.mean() < 0.08
        assert ang.mean() < 0.02

    def test_parity_pose_ref_delta(self):
        """Parity mode: the reference feeds poseDiff (not a true SE(3)
        between) into BetweenFactor (SensorManagerRos.cpp:105,122-158). For
        slow rotation rates this still tracks; verify bounded error."""
        est, gt, _ = _run_tracking(
            syn.circle(), n_keys=24,
            meas_fn=lambda a, b: lie.pose_ref_delta(a, b))
        dt, ang = _pose_errors(est, gt)
        assert dt.max() < 0.05
        assert ang.max() < 0.01

    @pytest.mark.slow
    def test_cost_decreases_with_solve(self):
        traj = syn.circle()
        dtype = jnp.float64
        t_imu = jnp.arange(200, dtype=dtype) / IMU_HZ
        imu = syn.sample_imu(traj, t_imu)
        s = G.init(CFG, traj.pose_fn(jnp.zeros((), dtype)),
                   traj.vel_fn(jnp.zeros((), dtype)), jnp.zeros(6, dtype),
                   jnp.zeros((), dtype))
        t1 = jnp.asarray(0.05, dtype)
        pim = pre.preintegrate_window(
            imu.times, imu.accel, imu.gyro, jnp.zeros((), dtype), t1,
            jnp.zeros(6, dtype), CFG.imu, max_samples=MAX_IMU)
        s = G.add_keyframe(CFG, s, t1, pim)
        # Knock the new state off and verify solve pulls cost down.
        poses = s.states.poses.at[-1, 4:7].add(jnp.array([0.5, -0.3, 0.2]))
        s = s._replace(states=s.states._replace(poses=poses))
        c0 = float(G.cost(CFG, s))
        s2 = G.solve(CFG, s)
        c1 = float(G.cost(CFG, s2))
        assert c1 < c0 * 1e-3


class TestWindowBookkeeping:
    @pytest.mark.slow
    def test_key0_advances(self):
        _, _, s = _run_tracking(syn.circle(), n_keys=9)
        assert int(s.key0) == 9

    def test_times_shift(self):
        _, _, s = _run_tracking(syn.circle(), n_keys=9)
        t = np.asarray(s.times)
        np.testing.assert_allclose(np.diff(t), 1.0 / KEY_HZ, atol=1e-9)
        np.testing.assert_allclose(t[-1], 9.0 / KEY_HZ, atol=1e-12)
