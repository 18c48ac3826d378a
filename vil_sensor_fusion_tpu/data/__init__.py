"""Data acquisition / dataset layer (replaces carla_tools + rosbag ingestion)."""

from . import synthetic
from .synthetic import (
    GroundTruth,
    ImuStream,
    OdometryStream,
    Trajectory,
    circle,
    figure_eight,
    sample_ground_truth,
    sample_imu,
    sample_odometry,
    straight_tunnel,
    trajectory,
)

__all__ = [
    "synthetic",
    "GroundTruth",
    "ImuStream",
    "OdometryStream",
    "Trajectory",
    "circle",
    "figure_eight",
    "sample_ground_truth",
    "sample_imu",
    "sample_odometry",
    "straight_tunnel",
    "trajectory",
]
