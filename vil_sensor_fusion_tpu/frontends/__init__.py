"""Odometry front-ends: LiDAR (LOAM-equivalent) and visual-inertial."""

from . import lidar
from . import vio

__all__ = ["lidar", "vio"]
