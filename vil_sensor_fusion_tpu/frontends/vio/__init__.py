"""Visual-inertial front-end (ROVIO-equivalent capability, SURVEY.md §7.6):
error-state EKF with landmark states, iterated camera updates, and
LiDAR-provided feature depth initialization."""

from . import camera
from . import ekf
from . import pipeline
from . import synthetic
from .camera import Camera, backproject, carla_camera, project
from .ekf import VioConfig, VioState, init, init_landmark, pose_covariance, propagate, update
from .pipeline import VioFrameInput, VioOutput, run, step

__all__ = [
    "camera", "ekf", "pipeline", "synthetic",
    "Camera", "backproject", "carla_camera", "project",
    "VioConfig", "VioState", "init", "init_landmark", "pose_covariance",
    "propagate", "update", "VioFrameInput", "VioOutput", "run", "step",
]
