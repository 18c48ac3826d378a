"""YAML configuration — same shape as the reference's
gtsam_fusion/config/*/fusion_params.yaml (sensors registry, imu covariances,
filter thresholds), so a reference user's config ports by renaming keys
they recognize.

Example (mirrors config/carla/fusion_params.yaml):

    sensors:
      lidar:
        odom_topic: /laser_odom
        optimize_after_odom: false
        use_odom_covariance: false
        covariance_linear: 0.2
        covariance_angular: 0.2
        max_time_skip: 0.1
      vio:
        odom_topic: /rovio/odometry
        optimize_after_odom: true
        covariance_linear: 0.1
        covariance_angular: 0.1
        max_time_skip: 0.1
    imu:
      topic: /imu/fusion
      cov_bias_acc: 0.0001
      cov_bias_omega: 0.000001
      cov_accel: 0.000001
      cov_gyro: 0.000001
      cov_integration: 0.00000001
      cov_bias_acc_omega_int: 0.0001
    filter:
      rot_degen_threshold: 11.5
      trans_degen_threshold: 28.9
    smoother:
      window: 8
      gn_iters: 6
"""

from __future__ import annotations

from typing import Any

from .core.preintegration import ImuParams
from .degeneracy.gate import GateConfig
from .fusion.engine import FusionConfig, SensorSpec
from .graph.smoother import SmootherConfig


def _load_yaml(path: str) -> dict:
    import yaml  # PyYAML ships with the baked-in environment

    with open(path) as f:
        return yaml.safe_load(f)


def imu_params_from_dict(d: dict) -> ImuParams:
    return ImuParams(
        cov_accel=float(d.get("cov_accel", 1e-6)),
        cov_gyro=float(d.get("cov_gyro", 1e-6)),
        cov_integration=float(d.get("cov_integration", 1e-8)),
        cov_bias_acc=float(d.get("cov_bias_acc", 1e-4)),
        cov_bias_omega=float(d.get("cov_bias_omega", 1e-6)),
        cov_bias_acc_omega_int=float(d.get("cov_bias_acc_omega_int", 1e-4)),
        gravity=float(d.get("gravity", 9.81)),
    )


def sensor_spec_from_dict(name: str, d: dict) -> SensorSpec:
    return SensorSpec(
        name=name,
        use_odom_covariance=bool(d.get("use_odom_covariance", False)),
        covariance_linear=float(d.get("covariance_linear", 0.1)),
        covariance_angular=float(d.get("covariance_angular", 0.1)),
        optimize_after_odom=bool(d.get("optimize_after_odom", False)),
        max_time_skip=float(d.get("max_time_skip", 0.1)),
    )


def gate_config_from_dict(d: dict) -> GateConfig:
    return GateConfig(
        rot_threshold=float(d.get("rot_degen_threshold", 11.5)),
        trans_threshold=float(d.get("trans_degen_threshold", 28.9)),
        normalize_per_corr=bool(d.get("normalize_per_corr", False)),
    )


def smoother_config_from_dict(d: dict, imu: ImuParams) -> SmootherConfig:
    return SmootherConfig(
        window=int(d.get("window", 8)),
        between_slots=int(d.get("between_slots", 16)),
        gn_iters=int(d.get("gn_iters", 8)),
        damping=float(d.get("damping", 1e-9)),
        prior_rot_sigma=float(d.get("prior_rot_sigma", 1e-6)),
        prior_trans_sigma=float(d.get("prior_trans_sigma", 5e-5)),
        prior_vel_sigma=float(d.get("prior_vel_sigma", 1e-5)),
        prior_bias_sigma=float(d.get("prior_bias_sigma", 1e-7)),
        info_cap=float(d.get("info_cap", 1e6)),
        imu=imu,
    )


class SystemConfig:
    """Parsed top-level config: fusion + gate + topics."""

    def __init__(self, raw: dict):
        self.raw = raw
        imu_d = raw.get("imu", {})
        self.imu = imu_params_from_dict(imu_d)
        self.imu_topic = imu_d.get("topic", "/imu/fusion")
        sensors = raw.get("sensors", {})
        self.sensor_specs = tuple(
            sensor_spec_from_dict(k, v) for k, v in sensors.items())
        self.sensor_topics = {
            k: v.get("odom_topic") for k, v in sensors.items()}
        self.gate = gate_config_from_dict(raw.get("filter", {}))
        self.smoother = smoother_config_from_dict(
            raw.get("smoother", {}), self.imu)
        self.fusion = FusionConfig(
            smoother=self.smoother,
            sensors=self.sensor_specs or (SensorSpec(),),
            max_imu_per_gap=int(raw.get("max_imu_per_gap", 32)),
            ref_pose_delta=bool(raw.get("ref_pose_delta", True)),
        )


def load(path: str) -> SystemConfig:
    return SystemConfig(_load_yaml(path))
