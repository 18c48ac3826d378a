"""End-to-end fusion engine tests — the TPU equivalent of the reference's
IntegrationTest (gtsam_fusion/test/UnitTests.cpp:236-393), but validated
against analytic ground truth instead of just graph bookkeeping:

- two odometry sources at different rates (vio 20 Hz solving, lidar 10 Hz
  piggybacking — the Carla config topology, fusion_params.yaml:1-20),
- degeneracy gating actually rescuing the trajectory when one source goes
  bad inside a labeled window (the thesis's core claim),
- DiagnosticMessage-parity error series and ROC/AUC sanity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vil_sensor_fusion_tpu import degeneracy as deg
from vil_sensor_fusion_tpu import eval as ev
from vil_sensor_fusion_tpu import fusion as fu
from vil_sensor_fusion_tpu import graph as G
from vil_sensor_fusion_tpu.core import lie
from vil_sensor_fusion_tpu.data import synthetic as syn

DTYPE = jnp.float64
IMU_HZ = 200.0
DUR = 4.0


def _streams(traj, vio_hz=20.0, lidar_hz=10.0):
    t_imu = jnp.arange(int(DUR * IMU_HZ) + 20, dtype=DTYPE) / IMU_HZ
    imu = syn.sample_imu(traj, t_imu)
    t_vio = (jnp.arange(int(DUR * vio_hz), dtype=DTYPE) + 1.0) / vio_hz
    t_lid = (jnp.arange(int(DUR * lidar_hz), dtype=DTYPE) + 1.0) / lidar_hz
    vio = syn.sample_odometry(traj, t_vio)
    lid = syn.sample_odometry(traj, t_lid)
    return imu, vio, lid


def _config():
    sm = G.SmootherConfig(window=6, between_slots=12, gn_iters=5)
    return fu.FusionConfig(
        smoother=sm,
        sensors=(
            fu.SensorSpec(name="vio", optimize_after_odom=True,
                          covariance_linear=0.01, covariance_angular=0.01,
                          max_time_skip=0.2),
            fu.SensorSpec(name="lidar", optimize_after_odom=False,
                          covariance_linear=0.01, covariance_angular=0.01,
                          max_time_skip=0.2),
        ),
        max_imu_per_gap=32,
    )


import functools


@functools.lru_cache(maxsize=8)
def _engine_runner(cfg):
    """ONE jitted engine program per FusionConfig, shared across tests —
    re-wrapping fu.run in a fresh lambda per test recompiled the identical
    scan each time (~40-140 s each on this CPU; the fast tier's largest
    cost)."""
    return jax.jit(lambda es, tl, it, ia, ig: fu.run(cfg, es, tl, it, ia,
                                                     ig))


def _run(cfg, traj, vio_keep=None, lid_keep=None, vio_poses=None):
    imu, vio, lid = _streams(traj)
    vio_p = vio.poses if vio_poses is None else vio_poses
    vk = np.ones(len(vio.times)) if vio_keep is None else vio_keep
    lk = np.ones(len(lid.times)) if lid_keep is None else lid_keep
    tl = fu.merge_timeline([
        (np.asarray(vio.times), np.asarray(vio_p), np.asarray(vio.cov), vk),
        (np.asarray(lid.times), np.asarray(lid.poses), np.asarray(lid.cov), lk),
    ])
    gt = syn.sample_ground_truth(traj, tl.times)
    t0 = jnp.zeros((), DTYPE)
    es = fu.init(cfg, traj.pose_fn(t0), traj.vel_fn(t0), jnp.zeros(6, DTYPE), t0)

    es, out = _engine_runner(cfg)(es, tl, imu.times, imu.accel, imu.gyro)
    return tl, gt, out


class TestEndToEnd:
    @pytest.mark.slow
    def test_two_source_fusion_tracks_circle(self):
        cfg = _config()
        tl, gt, out = _run(cfg, syn.circle(radius=15.0, period=12.0))
        ate = float(ev.ate_rmse(out.poses, gt.poses))
        assert ate < 0.05, f"ATE {ate} too large"
        # Fused output at every event; solves on vio events only
        n_vio = int(np.sum(np.asarray(tl.source) == 0))
        assert int(np.sum(np.asarray(out.solved))) == n_vio

    @pytest.mark.slow
    def test_gating_rescues_corrupted_source(self):
        """Corrupt the lidar odometry inside a 'degenerate window' and verify
        the gate (keep=0 there) restores accuracy — the thesis's experiment
        shape (fusion with vs. without the degeneracy filter).

        Physics matters here: with an ideal IMU the smoother absorbs bad
        between-factors, so we use realistic MEMS noise (sampled AND modeled)
        and an *overconfident* corrupted source — which is exactly what
        degenerate LOAM is (tiny reported covariance, meters of drift)."""
        from vil_sensor_fusion_tpu.core import preintegration as pre

        cov_a, cov_g = 1e-3, 1e-5
        ip = pre.ImuParams(cov_accel=cov_a, cov_gyro=cov_g)
        sm = G.SmootherConfig(window=6, between_slots=12, gn_iters=5, imu=ip)
        cfg = fu.FusionConfig(
            smoother=sm,
            sensors=(
                fu.SensorSpec(name="vio", optimize_after_odom=True,
                              covariance_linear=0.01, covariance_angular=0.01,
                              max_time_skip=0.2),
                fu.SensorSpec(name="lidar", optimize_after_odom=False,
                              covariance_linear=1e-6, covariance_angular=1e-6,
                              max_time_skip=0.2),
            ),
            max_imu_per_gap=32,
        )
        traj = syn.circle(radius=15.0, period=12.0)
        t_imu = jnp.arange(int(DUR * IMU_HZ) + 20, dtype=DTYPE) / IMU_HZ
        imu = syn.sample_imu(
            traj, t_imu,
            accel_noise=float(np.sqrt(cov_a * IMU_HZ)),
            gyro_noise=float(np.sqrt(cov_g * IMU_HZ)),
            key=jax.random.PRNGKey(0))
        t_vio = (jnp.arange(int(DUR * 20), dtype=DTYPE) + 1.0) / 20
        t_lid = (jnp.arange(int(DUR * 10), dtype=DTYPE) + 1.0) / 10
        vio = syn.sample_odometry(traj, t_vio)
        lid = syn.sample_odometry(traj, t_lid)
        # Corrupt lidar poses in t ∈ [1.5, 3.0] with a large drift.
        t = np.asarray(lid.times)
        bad = (t >= 1.5) & (t <= 3.0)
        drift = np.zeros((len(t), 6))
        drift[bad, 0] = 3.0 * (t[bad] - 1.5)   # runaway x drift
        lid_bad = lie.pose_retract(lid.poses, jnp.asarray(drift))

        keep_all = np.ones(len(t))
        keep_gated = (~bad).astype(np.float64)

        def run_with(keep):
            tl = fu.merge_timeline([
                (np.asarray(vio.times), np.asarray(vio.poses),
                 np.asarray(vio.cov), np.ones(len(vio.times))),
                (t, np.asarray(lid_bad), np.asarray(lid.cov), keep),
            ])
            gt = syn.sample_ground_truth(traj, tl.times)
            t0 = jnp.zeros((), DTYPE)
            es = fu.init(cfg, traj.pose_fn(t0), traj.vel_fn(t0),
                         jnp.zeros(6, DTYPE), t0)
            es, out = jax.jit(lambda es, tl: fu.run(
                cfg, es, tl, imu.times, imu.accel, imu.gyro))(es, tl)
            return float(ev.ate_rmse(out.poses, gt.poses))

        ate_ungated = run_with(keep_all)
        ate_gated = run_with(keep_gated)
        assert ate_gated < 0.15
        assert ate_ungated > 10.0 * ate_gated

    @pytest.mark.slow   # three engine-scan compiles (~5 min CPU)
    def test_twist_covariance_literal_mode(self):
        """use_odom_covariance must select the timeline's TWIST channel
        verbatim (SensorManagerRos.cpp:84-99: poseDiff carries
        after->twist.covariance, :154-156) — distinct from both the
        constant-diag default and the pose-covariance adaptive mode."""
        traj = syn.circle(radius=10.0, period=16.0)
        imu, vio, lid = _streams(traj)
        # Pose covs deliberately HUGE, twist covs tight: only the twist
        # selection can produce an accurate run.
        big = np.tile(np.eye(6) * 100.0, (len(vio.times), 1, 1))
        tight = np.tile(np.eye(6) * 1e-4, (len(vio.times), 1, 1))
        big_l = np.tile(np.eye(6) * 100.0, (len(lid.times), 1, 1))
        tight_l = np.tile(np.eye(6) * 1e-4, (len(lid.times), 1, 1))
        tl = fu.merge_timeline([
            (np.asarray(vio.times), np.asarray(vio.poses), big,
             np.ones(len(vio.times)), tight),
            (np.asarray(lid.times), np.asarray(lid.poses), big_l,
             np.ones(len(lid.times)), tight_l),
        ])
        gt = syn.sample_ground_truth(traj, tl.times)
        t0 = jnp.zeros((), DTYPE)

        def run_mode(**flags):
            cfg = _config()
            cfg = cfg._replace(sensors=tuple(
                s._replace(**flags) for s in cfg.sensors))
            es = fu.init(cfg, traj.pose_fn(t0), traj.vel_fn(t0),
                         jnp.zeros(6, DTYPE), t0)
            _, out = _engine_runner(cfg)(es, tl, imu.times, imu.accel,
                                         imu.gyro)
            err = np.linalg.norm(np.asarray(out.poses)[:, 4:7]
                                 - np.asarray(gt.poses)[:, 4:7], axis=-1)
            assert np.isfinite(err).all()
            return err

        err_twist = run_mode(use_odom_covariance=True)
        err_pose = run_mode(use_pose_covariance=True)
        err_diag = run_mode()
        # Twist mode (tight, correct noise) tracks GT closely...
        assert err_twist.max() < 0.05, err_twist.max()
        # ...the pose-cov mode consumed the HUGE pose covariance: the
        # between factors carry ~no information, so it must drift
        # measurably more than the twist mode.
        assert err_pose.max() > 2.0 * err_twist.max(), \
            (err_pose.max(), err_twist.max())
        # And the three selections are genuinely distinct paths.
        assert abs(err_pose.max() - err_diag.max()) > 1e-6 or \
            abs(err_twist.max() - err_diag.max()) > 1e-6

    def test_max_time_skip_resets_chain(self):
        """Events separated by more than max_time_skip must not produce a
        between-factor (SensorManagerRos.cpp:47) — fusion still works off
        IMU + the other source."""
        cfg = _config()
        traj = syn.figure_eight(radius=10.0, period=16.0)
        # Drop a block of lidar measurements entirely (sensor dropout).
        imu, vio, lid = _streams(traj)
        t = np.asarray(lid.times)
        alive = (t < 1.5) | (t > 2.5)
        tl = fu.merge_timeline([
            (np.asarray(vio.times), np.asarray(vio.poses), np.asarray(vio.cov),
             np.ones(len(vio.times))),
            (t[alive], np.asarray(lid.poses)[alive], np.asarray(lid.cov)[alive],
             np.ones(alive.sum())),
        ])
        gt = syn.sample_ground_truth(traj, tl.times)
        t0 = jnp.zeros((), DTYPE)
        es = fu.init(cfg, traj.pose_fn(t0), traj.vel_fn(t0),
                     jnp.zeros(6, DTYPE), t0)
        es, out = jax.jit(lambda es, tl: fu.run(
            cfg, es, tl, imu.times, imu.accel, imu.gyro))(es, tl)
        ate = float(ev.ate_rmse(out.poses, gt.poses))
        assert ate < 0.05


class TestDiagnostics:
    def test_fields_against_manual(self):
        traj = syn.circle(radius=10.0, period=10.0)
        times = jnp.arange(1, 41, dtype=DTYPE) / 10.0
        gt = syn.sample_ground_truth(traj, times)
        # Estimate = gt with constant offset in x (world frame)
        off = jnp.zeros((len(times), 6), DTYPE).at[:, 0].set(0.1)
        est = lie.pose_retract(gt.poses, off)
        d = ev.diagnostic_series(times, est, gt.poses)
        np.testing.assert_allclose(np.asarray(d.abs_dist_err), 0.1, atol=1e-9)
        np.testing.assert_allclose(np.asarray(d.abs_rot_err), 0.0, atol=1e-9)
        # gt_distance is cumulative arc length ≈ speed * t
        speed = 2 * np.pi * 10.0 / 10.0
        got = float(d.gt_distance[-1])
        want = speed * (float(times[-1]) - float(times[0]))
        # z oscillation adds a little arc length beyond the planar speed
        np.testing.assert_allclose(got, want, rtol=5e-3)
        # relative error = abs/cum
        np.testing.assert_allclose(
            np.asarray(d.relative_dist_err[1:]),
            0.1 / np.asarray(d.gt_distance[1:]), rtol=1e-9)

    def test_ate_rpe(self):
        traj = syn.straight_tunnel(speed=5.0)
        times = jnp.arange(1, 21, dtype=DTYPE) / 10.0
        gt = syn.sample_ground_truth(traj, times)
        ate = float(ev.ate_rmse(gt.poses, gt.poses))
        assert ate == pytest.approx(0.0, abs=1e-12)
        t_rpe, r_rpe = ev.rpe(gt.poses, gt.poses)
        assert float(t_rpe) == pytest.approx(0.0, abs=1e-12)
        assert float(r_rpe) == pytest.approx(0.0, abs=1e-9)


class TestRoc:
    def test_perfect_detector_auc_1(self):
        times = jnp.arange(200, dtype=DTYPE) / 10.0
        labels = ev.label_windows(times, [(5.0, 10.0)])
        # Perfect low-is-degenerate score: 0 inside window, 1 outside
        score = jnp.where(labels, 0.0, 1.0)
        curve = ev.roc_curve(labels, score)
        assert float(curve.auc) > 0.95

    def test_random_detector_auc_half(self):
        rng = np.random.default_rng(3)
        times = jnp.arange(1000, dtype=DTYPE) / 10.0
        labels = ev.label_windows(times, [(20.0, 60.0)])
        score = jnp.asarray(rng.standard_normal(1000))
        curve = ev.roc_curve(labels, score)
        assert 0.4 < float(curve.auc) < 0.6

    def test_auc_table(self):
        times = jnp.arange(100, dtype=DTYPE)
        labels = ev.label_windows(times, [(10.0, 30.0)])
        scores = {"good": jnp.where(labels, -1.0, 1.0),
                  "bad": jnp.where(labels, 1.0, -1.0)}
        table = ev.auc_table(scores, labels)
        assert table["good"] > 0.9
        assert table["bad"] < 0.1


class TestHealthGuard:
    def test_nan_event_rejected_state_survives(self):
        """Elastic recovery inside the engine (utils.health wired into
        step): an event carrying a NaN odometry pose must not contaminate
        the running state — the event is rejected (healthy=0) and fusion
        continues tracking."""
        cfg = _config()
        traj = syn.circle(radius=10.0, period=10.0)
        imu, vio, lid = _streams(traj)
        vio_p = np.asarray(vio.poses).copy()
        vio_p[20] = np.nan                       # poison one measurement
        tl = fu.merge_timeline([
            (np.asarray(vio.times), vio_p, np.asarray(vio.cov),
             np.ones(len(vio.times))),
            (np.asarray(lid.times), np.asarray(lid.poses),
             np.asarray(lid.cov), np.ones(len(lid.times))),
        ])
        t0 = jnp.zeros((), DTYPE)
        es = fu.init(cfg, traj.pose_fn(t0), traj.vel_fn(t0),
                     jnp.zeros(6, DTYPE), t0)
        es, out = _engine_runner(cfg)(es, tl, imu.times, imu.accel,
                                      imu.gyro)

        h = np.asarray(out.healthy)
        assert h.min() == 0.0, "the poisoned event was not flagged"
        assert h.mean() > 0.9, h.mean()
        # Every reported pose stays finite and the trajectory still tracks.
        assert np.isfinite(np.asarray(out.poses)).all()
        gt = syn.sample_ground_truth(traj, tl.times)
        ate = float(ev.ate_rmse(out.poses, gt.poses))
        assert ate < 0.1, ate

    @pytest.mark.slow
    def test_guard_off_propagates_nan(self):
        """Sanity: with guard_health=False the same poison produces NaNs —
        proving the guard is what saves the run above."""
        cfg = _config()._replace(guard_health=False)
        traj = syn.circle(radius=10.0, period=10.0)
        imu, vio, lid = _streams(traj)
        vio_p = np.asarray(vio.poses).copy()
        vio_p[20] = np.nan
        tl = fu.merge_timeline([
            (np.asarray(vio.times), vio_p, np.asarray(vio.cov),
             np.ones(len(vio.times))),
        ])
        t0 = jnp.zeros((), DTYPE)
        es = fu.init(cfg, traj.pose_fn(t0), traj.vel_fn(t0),
                     jnp.zeros(6, DTYPE), t0)
        es, out = jax.jit(lambda es, tl: fu.run(
            cfg, es, tl, imu.times, imu.accel, imu.gyro))(es, tl)
        assert not np.isfinite(np.asarray(out.poses)).all()


class TestCheckpointResume:
    @pytest.mark.slow
    def test_killed_and_resumed_run_matches_uninterrupted(self, tmp_path):
        """Checkpoint/resume wired end-to-end: process half the timeline,
        save the engine state (utils.checkpoint), restore into a fresh
        template, process the rest — outputs identical to the uninterrupted
        run (SURVEY.md §5: the reference has no estimator checkpointing)."""
        import os
        from vil_sensor_fusion_tpu import utils as U

        cfg = _config()
        traj = syn.circle(radius=10.0, period=10.0)
        imu, vio, lid = _streams(traj)
        tl = fu.merge_timeline([
            (np.asarray(vio.times), np.asarray(vio.poses),
             np.asarray(vio.cov), np.ones(len(vio.times))),
            (np.asarray(lid.times), np.asarray(lid.poses),
             np.asarray(lid.cov), np.ones(len(lid.times))),
        ])
        t0 = jnp.zeros((), DTYPE)
        es0 = fu.init(cfg, traj.pose_fn(t0), traj.vel_fn(t0),
                      jnp.zeros(6, DTYPE), t0)
        run = lambda es, tl: _engine_runner(cfg)(es, tl, imu.times,
                                                 imu.accel, imu.gyro)

        _, out_full = run(es0, tl)

        E = int(tl.times.shape[0])
        half = E // 2
        first = jax.tree_util.tree_map(lambda x: x[:half], tl)
        second = jax.tree_util.tree_map(lambda x: x[half:], tl)
        es_half, out_a = run(es0, first)
        path = os.path.join(tmp_path, "engine.npz")
        U.save(path, es_half)
        es_restored = U.restore(path, es0)       # fresh template
        _, out_b = run(es_restored, second)

        np.testing.assert_allclose(np.asarray(out_b.poses),
                                   np.asarray(out_full.poses)[half:],
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(out_a.poses),
                                   np.asarray(out_full.poses)[:half],
                                   atol=1e-12)


class TestAbsoluteAnchor:
    @pytest.mark.slow
    def test_anchor_bounds_random_walk_drift(self):
        """With per-event noise on the odometry stream, the between-factor
        chain integrates the noise as a random walk; an absolute
        map-anchored unary factor on the same stream bounds the error near
        the per-event noise floor (graph/smoother.py add_unary)."""
        rng = np.random.default_rng(7)
        traj = syn.circle(radius=12.0, period=24.0)
        imu, vio, lid = _streams(traj)
        # Drifting VIO: a slowly accumulating position bias (the EKF's
        # long-horizon failure mode), plus noisy lidar absolute poses.
        n_v = len(vio.times)
        drift = np.cumsum(np.full((n_v, 1), 0.02) *
                          np.array([[1.0, 0.5, 0.0]]), axis=0)
        vio_p = np.asarray(vio.poses).copy()
        vio_p[:, 4:7] += drift
        lid_p = np.asarray(lid.poses).copy()
        lid_p[:, 4:7] += rng.normal(0, 0.02, lid_p[:, 4:7].shape)

        def build(anchor):
            sm = G.SmootherConfig(window=6, between_slots=12, gn_iters=5)
            return fu.FusionConfig(
                smoother=sm,
                sensors=(
                    fu.SensorSpec(name="vio", optimize_after_odom=True,
                                  covariance_linear=0.05,
                                  covariance_angular=0.05,
                                  max_time_skip=0.2),
                    fu.SensorSpec(name="lidar", optimize_after_odom=False,
                                  covariance_linear=0.01,
                                  covariance_angular=0.01,
                                  max_time_skip=0.2,
                                  absolute_anchor=anchor,
                                  anchor_cov_scale=25.0),
                ),
                max_imu_per_gap=32,
            )

        errs = {}
        for anchor in (False, True):
            cfg = build(anchor)
            tl = fu.merge_timeline([
                (np.asarray(vio.times), vio_p, np.asarray(vio.cov),
                 np.ones(n_v)),
                (np.asarray(lid.times), lid_p, np.asarray(lid.cov),
                 np.ones(len(lid.times))),
            ])
            gt = syn.sample_ground_truth(traj, tl.times)
            t0 = jnp.zeros((), DTYPE)
            es = fu.init(cfg, traj.pose_fn(t0), traj.vel_fn(t0),
                         jnp.zeros(6, DTYPE), t0)
            run = jax.jit(lambda es, tl: fu.run(cfg, es, tl, imu.times,
                                                imu.accel, imu.gyro))
            _, out = run(es, tl)
            err = np.linalg.norm(np.asarray(out.poses)[:, 4:7]
                                 - np.asarray(gt.poses)[:, 4:7], axis=-1)
            errs[anchor] = err
        # Unanchored: tracks the drifting VIO chain; anchored: bounded by
        # the absolute lidar poses. Final-quarter error must shrink a lot.
        tail_un = errs[False][-len(errs[False]) // 4:].mean()
        tail_an = errs[True][-len(errs[True]) // 4:].mean()
        assert tail_an < 0.5 * tail_un, (tail_un, tail_an)
        assert tail_an < 0.25, tail_an
