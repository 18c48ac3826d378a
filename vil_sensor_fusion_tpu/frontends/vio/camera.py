"""Pinhole camera model.

The reference's rig: 800×600 RGB, fov 100° (carla_tools/config/sensors.json
front camera), calibration in gtsam_fusion/config/carla/rovio_camera.yaml.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    width: int = 800
    height: int = 600


def carla_camera(width: int = 800, height: int = 600,
                 fov_deg: float = 100.0) -> Camera:
    f = width / (2.0 * jnp.tan(jnp.radians(fov_deg) / 2.0))
    return Camera(fx=float(f), fy=float(f),
                  cx=width / 2.0, cy=height / 2.0,
                  width=width, height=height)


def project(cam: Camera, p_cam: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-frame points (…, 3) → pixel (…, 2), plus validity (z > eps,
    inside image). Camera frame: x right, y down, z forward (the ROVIO
    convention, carla_to_ros_transforms.py:28-48)."""
    z = p_cam[..., 2]
    eps = 1e-6
    zs = jnp.where(jnp.abs(z) < eps, eps, z)
    u = cam.fx * p_cam[..., 0] / zs + cam.cx
    v = cam.fy * p_cam[..., 1] / zs + cam.cy
    ok = (z > 0.1) & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    return jnp.stack([u, v], axis=-1), ok


def backproject(cam: Camera, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixel + depth (along z) → camera-frame point."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    one = jnp.ones_like(x)
    return jnp.stack([x, y, one], axis=-1) * depth[..., None]
