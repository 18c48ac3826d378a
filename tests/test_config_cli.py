"""Config loading and CLI smoke tests."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from vil_sensor_fusion_tpu import config as C

REPO = Path(__file__).resolve().parents[1]


class TestConfig:
    def test_load_carla_yaml_matches_reference_values(self):
        cfg = C.load(str(REPO / "configs" / "carla.yaml"))
        # Values from gtsam_fusion/config/carla/fusion_params.yaml
        assert cfg.gate.rot_threshold == 11.5
        assert cfg.gate.trans_threshold == 28.9
        assert cfg.imu.cov_accel == pytest.approx(1e-6)
        assert cfg.imu.cov_bias_acc == pytest.approx(1e-4)
        names = [s.name for s in cfg.sensor_specs]
        assert names == ["lidar", "vio"]
        lidar, vio = cfg.sensor_specs
        assert not lidar.optimize_after_odom and vio.optimize_after_odom
        assert lidar.covariance_linear == 0.2
        assert vio.covariance_linear == 0.1
        assert lidar.max_time_skip == 0.1
        assert cfg.fusion.sensors == cfg.sensor_specs

    def test_defaults(self, tmp_path):
        p = tmp_path / "min.yaml"
        p.write_text("sensors:\n  odom: {}\n")
        cfg = C.load(str(p))
        assert cfg.smoother.window == 8
        assert cfg.gate.rot_threshold == 11.5

    def test_carla_full_builds_complete_vilconfig(self):
        """The full per-dataset surface (VERDICT r2 task 7): a VilConfig —
        camera rig, VIO, frontend, LiDAR structure, gate, fusion — built
        from YAML alone, with the reference 800×600 rig and LOAM-parity
        structure ON."""
        cfg = C.load(str(REPO / "configs" / "carla_full.yaml"))
        vil = cfg.vil()
        assert vil.vio.cam.width == 800 and vil.vio.cam.height == 600
        assert cfg.frontend.cam.width == 800
        assert vil.lidar.two_stage and vil.lidar.undistort
        assert vil.lidar.guess_is_delta
        assert vil.lidar.corner_map.leaf == pytest.approx(0.2)
        assert vil.gate.normalize_per_corr
        # Calibrated thresholds — no -1e9 sentinels anywhere.
        assert vil.gate.rot_threshold > -100.0
        assert vil.gate.trans_threshold > -100.0
        names = [s.name for s in vil.fusion.sensors]
        assert names == ["lidar", "vio"]

    def test_san_rafael_builds_and_differs_from_carla(self):
        """The SECOND per-dataset family (VERDICT r4 next #9): the
        san_rafael-shaped rig (gtsam_fusion/config/san_rafael/) — explicit
        Blackfly intrinsics at 720×540, mapping-output solve cadence, its
        own covariance calibration — must build a complete VilConfig whose
        rig genuinely differs from the Carla one."""
        cfg = C.load(str(REPO / "configs" / "san_rafael.yaml"))
        vil = cfg.vil()
        assert vil.vio.cam.width == 720 and vil.vio.cam.height == 540
        assert vil.vio.cam.fx == pytest.approx(593.690871957)
        assert vil.vio.cam.cy == pytest.approx(274.84471313)
        lidar, vio = vil.fusion.sensors
        # san_rafael solves on the LiDAR mapping stream too
        # (fusion_params.yaml: optimize_after_odom true for BOTH).
        assert lidar.optimize_after_odom and vio.optimize_after_odom
        assert lidar.covariance_linear == pytest.approx(1e-6)
        assert lidar.covariance_angular == pytest.approx(1e-7)
        assert vio.covariance_linear == pytest.approx(1e-3)
        assert cfg.imu.cov_bias_acc == pytest.approx(1e-3)
        assert cfg.imu_topic == "/imu/lidar"

    @pytest.mark.slow
    def test_san_rafael_rig_end_to_end(self):
        """`cli run --config configs/san_rafael.yaml` end to end: the
        non-Carla-shaped rig (different resolution, intrinsics, solve
        cadence, covariances) runs the full stack and converges — proving
        the YAML surface isn't accidentally Carla-specific."""
        r = subprocess.run(
            [sys.executable, "-m", "vil_sensor_fusion_tpu.cli", "run",
             "--scenario", "town", "--duration", "1.5",
             "--config", str(REPO / "configs" / "san_rafael.yaml")],
            cwd=REPO, capture_output=True, text=True, timeout=1500,
            env={"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
                 "JAX_PLATFORMS": "cpu"})
        assert r.returncode == 0, r.stderr[-2000:]
        info = json.loads(r.stdout[r.stdout.index("{"):])
        assert np.isfinite(info["fused_ate_rmse_m"])
        assert info["events"] > 0

    @pytest.mark.slow
    def test_run_with_config_and_model_devices(self, tmp_path):
        """`cli run --config ... --model-devices 2`: the model-parallel ICP
        (sharded registration psum) reachable from the product CLI, on the
        virtual CPU mesh."""
        cfgp = tmp_path / "small.yaml"
        cfgp.write_text(
            "camera: {width: 128, height: 96}\n"
            "vio: {num_landmarks: 12}\n"
            "lidar:\n"
            "  two_stage: false\n"
            "  undistort: false\n"
            "  mapping: {iters: 3, degen_eigval: 5.0}\n"
            "filter:\n"
            "  rot_degen_threshold: 4.0\n"
            "  trans_degen_threshold: -6.0\n"
            "  normalize_per_corr: true\n"
            "sensors:\n"
            "  lidar: {optimize_after_odom: false, covariance_linear: 0.2,\n"
            "          covariance_angular: 0.2, max_time_skip: 0.2}\n"
            "  vio: {optimize_after_odom: true, covariance_linear: 0.1,\n"
            "        covariance_angular: 0.1, max_time_skip: 0.1}\n"
            "smoother: {window: 4, between_slots: 8, gn_iters: 3}\n")
        r = subprocess.run(
            [sys.executable, "-m", "vil_sensor_fusion_tpu.cli", "run",
             "--scenario", "town", "--duration", "1.5",
             "--config", str(cfgp), "--model-devices", "2"],
            cwd=REPO, capture_output=True, text=True, timeout=1500,
            env={"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
                 "JAX_PLATFORMS": "cpu",
                 "XLA_FLAGS": "--xla_force_host_platform_device_count=2"})
        assert r.returncode == 0, r.stderr[-2000:]
        # cmd_run pretty-prints one JSON object; parse from its first brace.
        info = json.loads(r.stdout[r.stdout.index("{"):])
        assert np.isfinite(info["fused_ate_rmse_m"])
        assert info["events"] > 0


class TestCli:
    def test_convert_and_fuse_bag(self, tmp_path):
        # Build a small bag with the test writer, convert it, fuse it.
        sys.path.insert(0, str(REPO / "tests"))
        import test_rosbag_io as W

        rng = np.random.default_rng(0)
        recs = b""
        recs += W._conn_record(0, "/imu/fusion", "sensor_msgs/Imu")
        recs += W._conn_record(1, "/rovio/odometry", "nav_msgs/Odometry")
        for i in range(200):
            t = 0.005 * i
            recs += W._msg_record(0, t, W._imu_msg(
                t, [0, 0, 0], [0, 0, 9.81]))
        for i in range(10):
            t = 0.1 * (i + 1)
            recs += W._msg_record(1, t, W._odom_msg(
                t, [0.0, 0, 0], [0, 0, 0, 1],
                np.eye(6).reshape(-1) * 0.01, np.eye(6).reshape(-1) * 0.01))
        bag = tmp_path / "mini.bag"
        W._write_bag(bag, recs, chunked=True)

        out = tmp_path / "mini.npz"
        r = subprocess.run(
            [sys.executable, "-m", "vil_sensor_fusion_tpu.cli", "convert",
             "--bag", str(bag), "--out", str(out)],
            cwd=REPO, capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr
        z = np.load(out)
        assert len(z["imu_fusion_t"]) == 200

        cfgp = tmp_path / "cfg.yaml"
        cfgp.write_text(
            "sensors:\n"
            "  vio:\n"
            "    odom_topic: /rovio/odometry\n"
            "    optimize_after_odom: true\n"
            "    covariance_linear: 0.01\n"
            "    covariance_angular: 0.01\n"
            "    max_time_skip: 0.2\n"
            "imu:\n  topic: /imu/fusion\n"
            "smoother:\n  window: 4\n  gn_iters: 3\n")
        r = subprocess.run(
            [sys.executable, "-m", "vil_sensor_fusion_tpu.cli", "fuse-bag",
             "--bag", str(bag), "--config", str(cfgp)],
            cwd=REPO, capture_output=True, text=True, timeout=500,
            env={"PATH": "/usr/bin:/bin:/usr/local/bin",
                 "JAX_PLATFORMS": "cpu", "HOME": "/root"})
        assert r.returncode == 0, r.stderr
        info = json.loads(r.stdout.strip().splitlines()[-1])
        assert info["events"] == 10
