"""Raw-sensor bag → FULL stack end-to-end: the product run of the reference
(fusion_carla.launch:13-97 — rosbag play → image_proc → LOAM → ROVIO →
degeneracy filter → gtsam_fusion → results). Here: record a rendered
scenario to a real rosbag (cli `record` / scenarios.write_scenario_bag),
then replay it with run_vil_from_bag — bag → organized sweeps → LiDAR
odometry, bag → images → tracker → EKF, gate, fusion — and bound the fused
trajectory error against the recorded GT.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from vil_sensor_fusion_tpu import fusion as fu
from vil_sensor_fusion_tpu import graph as G
from vil_sensor_fusion_tpu.data import ingest as IG
from vil_sensor_fusion_tpu.data import scenarios
from vil_sensor_fusion_tpu.degeneracy import gate as DG
from vil_sensor_fusion_tpu.frontends import lidar as L
from vil_sensor_fusion_tpu.frontends import vio as V
from vil_sensor_fusion_tpu.frontends.vio import frontend as F
from vil_sensor_fusion_tpu.fusion import vil

# Long-running e2e coverage: excluded from the fast default loop
# (pytest -m 'not slow').
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]
DTYPE = jnp.float32


def _rig():
    cam = V.camera.Camera(fx=107.0, fy=107.0, cx=80.0, cy=60.0,
                          width=160, height=120)
    pose_ic = F.forward_camera_extrinsics(DTYPE)
    vio_cfg = V.VioConfig(num_landmarks=16, update_iters=2, cam=cam,
                          pose_ic=tuple(np.asarray(pose_ic)))
    fe_cfg = F.FrontendConfig(cam=cam, n_candidates=32, min_dist=10.0,
                              min_score=0.5)
    return vio_cfg, fe_cfg


@pytest.fixture(scope="module")
def recorded_bag(tmp_path_factory):
    """A raw-sensor bag (bz2-compressed chunks, like real Carla bags) of a
    1.5 s rendered town drive, plus the scenario it came from."""
    vio_cfg, fe_cfg = _rig()
    sc = scenarios.build("town", duration=1.5, vio_cfg=vio_cfg, dtype=DTYPE,
                         vio_from_images=True, frontend_cfg=fe_cfg)
    path = str(tmp_path_factory.mktemp("bags") / "town.bag")
    scenarios.write_scenario_bag(path, sc, compression="bz2",
                                 gt_topic="/gt/odometry")
    return path, sc, vio_cfg, fe_cfg


class TestIngest:
    def test_load_bag_round_trips_streams(self, recorded_bag):
        path, sc, _, _ = recorded_bag
        ba = IG.load_bag(path, gt_topic="/gt/odometry")
        assert len(ba.imu_times) == len(sc.imu_times)
        assert len(ba.lidar_times) == len(sc.lidar_times)
        assert len(ba.cam_times) == len(sc.vio_times)
        np.testing.assert_allclose(ba.imu_times, np.asarray(sc.imu_times),
                                   atol=1e-6)
        np.testing.assert_allclose(ba.imu_accel, np.asarray(sc.imu_accel),
                                   atol=1e-5)
        # Images round-trip through uint8 quantization.
        assert ba.images.shape == np.asarray(sc.images).shape
        err = np.abs(ba.images - np.clip(np.asarray(sc.images), 0, 255))
        assert err.max() <= 1.0
        # GT poses round-trip exactly (float64 in the message).
        np.testing.assert_allclose(ba.gt_poses, np.asarray(sc.gt_vio_poses),
                                   atol=1e-6)

    def test_imu_windows_cover_stream(self, recorded_bag):
        path, sc, _, _ = recorded_bag
        ba = IG.load_bag(path)
        a, g, dts = IG.imu_windows_from_stream(
            ba.imu_times, ba.imu_accel, ba.imu_gyro, ba.cam_times)
        # Each window's dts sum to the frame interval.
        bounds = np.concatenate([[0.0], ba.cam_times])
        np.testing.assert_allclose(np.asarray(dts).sum(axis=1),
                                   np.diff(bounds), atol=1e-6)


class TestFullStackFromBag:
    def test_replay_matches_gt(self, recorded_bag):
        """One call reproduces fusion_carla.launch's job and the fused
        trajectory tracks GT."""
        path, sc, vio_cfg, fe_cfg = recorded_bag
        cfg = vil.VilConfig(
            vio=vio_cfg,
            lidar=L.LidarOdomConfig(
                icp=L.IcpConfig(iters=6, degen_eigval=5.0)),
            gate=DG.GateConfig(rot_threshold=-1e9, trans_threshold=-5.0,
                               normalize_per_corr=True),
            fusion=fu.FusionConfig(
                smoother=G.SmootherConfig(window=6, between_slots=12,
                                          gn_iters=4),
                sensors=vil.VilConfig().fusion.sensors, max_imu_per_gap=32),
        )
        es, res, ba = vil.run_vil_from_bag(
            path, cfg=cfg, fe_cfg=fe_cfg,
            topics=dict(gt_topic="/gt/odometry"), dtype=DTYPE)

        fused_t = np.asarray(res.fused.times)
        fused_p = np.asarray(res.fused.poses)
        assert np.isfinite(fused_p).all()
        gt_t = np.asarray(ba.gt_times)
        gt_p = np.asarray(ba.gt_poses)
        idx = np.clip(np.searchsorted(gt_t, fused_t), 0, len(gt_t) - 1)
        err = np.linalg.norm(fused_p[:, 4:7] - gt_p[idx][:, 4:7], axis=1)
        ate = float(np.sqrt((err ** 2).mean()))
        assert ate < 0.5, f"full-stack bag replay ATE {ate}"

    def test_cli_record_then_run(self, tmp_path):
        """The two CLI commands compose: `record` writes a raw bag, `run
        --bag` replays it through the full stack and reports fused ATE."""
        bag = str(tmp_path / "cli.bag")
        env = {"PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu",
               "PATH": "/usr/bin:/bin:/usr/local/bin"}
        rec = subprocess.run(
            [sys.executable, "-m", "vil_sensor_fusion_tpu.cli", "record",
             "--scenario", "town", "--duration", "1.0", "--out", bag],
            capture_output=True, text=True, env=env, timeout=900)
        assert rec.returncode == 0, rec.stderr[-2000:]
        meta = json.loads(rec.stdout)
        assert meta["imu_msgs"] > 0 and meta["image_msgs"] > 0

        run = subprocess.run(
            [sys.executable, "-m", "vil_sensor_fusion_tpu.cli", "run",
             "--bag", bag],
            capture_output=True, text=True, env=env, timeout=900)
        assert run.returncode == 0, run.stderr[-2000:]
        out = json.loads(run.stdout)
        assert out["events"] > 0
        assert out["fused_ate_rmse_m"] < 1.0
