"""Odometry front-ends: LiDAR (LOAM-equivalent) and visual-inertial."""

from . import lidar

__all__ = ["lidar"]
