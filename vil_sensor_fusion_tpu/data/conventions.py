"""Frame-convention adapters and stream preprocessors — batched JAX
equivalents of the reference's L2 layer:

- the four coordinate conventions and their rotations
  (carla_tools/src/transform_helper.py:7-45, documented at
  carla_to_ros_transforms.py:28-48): Carla (x fwd, y right, z up —
  left-handed), ROS (x fwd, y left, z up), ROVIO/camera (x right, y down,
  z fwd), LOAM (x left, y up, z fwd), Velodyne;
- IMU stream rotation incl. covariances (transform_helper.transform_imu:52-83);
- point-cloud rotation (transform_pointcloud2:85-97);
- the LOAM→ROS cyclic axis swap xyz→zxy of odometry
  (loam_frame_transform.loam_odom_callback_2:51-117);
- channel/horizontal/time point-cloud decimation, e.g. HDL-64E→VLP-16
  (downsample_pointcloud.py:43-62);
- 180° image flip for upside-down cameras (imgflip.py:22-32);
- color→mono conversion (the reference's image_proc dependency);
- moving-average IMU low-pass (imu_filter.py:30-52 — kept for parity even
  though the reference marks it useless).

All functions are batched over leading axes and jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import lie

# Rotation matrices between conventions (right-multiply column vectors):
# v_ros = ROS_FROM_LOAM @ v_loam, etc.
# ros_to_loam (transform_helper.py:27-32, then inverted at :43): LOAM axes in
# ROS coords are x_loam = y_ros, y_loam = z_ros, z_loam = x_ros.
ROS_FROM_LOAM = jnp.array([
    [0.0, 0.0, 1.0],
    [1.0, 0.0, 0.0],
    [0.0, 1.0, 0.0],
])
LOAM_FROM_ROS = ROS_FROM_LOAM.T
# ros_to_velodyne (transform_helper.py:34-39, inverted at :44).
ROS_FROM_VELODYNE = jnp.array([
    [0.0, 1.0, 0.0],
    [-1.0, 0.0, 0.0],
    [0.0, 0.0, 1.0],
])
VELODYNE_FROM_ROS = ROS_FROM_VELODYNE.T
# Camera/ROVIO convention: x right, y down, z fwd (rovio docs; the
# commented-out ros_to_rovio at transform_helper.py:20-25).
ROS_FROM_CAMERA = jnp.array([
    [0.0, 0.0, 1.0],
    [-1.0, 0.0, 0.0],
    [0.0, -1.0, 0.0],
])
CAMERA_FROM_ROS = ROS_FROM_CAMERA.T
# Carla → ROS: the reference treats positions as-is (carla_to_ros is the
# identity, transform_helper.py:6-11) and handles handedness per-field.
ROS_FROM_CARLA = jnp.eye(3)


def rotate_vectors(R: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., 3) vectors by a 3×3 convention rotation."""
    return jnp.einsum("ij,...j->...i", R, v)


def rotate_covariance(R: jnp.ndarray, cov: jnp.ndarray) -> jnp.ndarray:
    """R Σ Rᵀ over (..., 3, 3) blocks (transform_covariance:47-49)."""
    return jnp.einsum("ij,...jk,lk->...il", R, cov, R)


def transform_imu_stream(
    R: jnp.ndarray,
    accel: jnp.ndarray,
    gyro: jnp.ndarray,
    accel_cov: jnp.ndarray | None = None,
    gyro_cov: jnp.ndarray | None = None,
):
    """Rotate an IMU stream between conventions (transform_imu semantics:
    rotate accel, gyro, and their covariances)."""
    out = [rotate_vectors(R, accel), rotate_vectors(R, gyro)]
    if accel_cov is not None:
        out.append(rotate_covariance(R, accel_cov))
    if gyro_cov is not None:
        out.append(rotate_covariance(R, gyro_cov))
    return tuple(out)


def transform_points(R: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., 3) point clouds (transform_pointcloud2 semantics)."""
    return rotate_vectors(R, pts)


def loam_odom_to_ros(poses: jnp.ndarray) -> jnp.ndarray:
    """The LOAM frame transform node's cyclic swap (x,y,z) ← (z,x,y) applied
    to both position and the quaternion's vector part
    (loam_frame_transform.py:51-117)."""
    q = lie.pose_quat(poses)
    t = lie.pose_trans(poses)
    t2 = jnp.stack([t[..., 2], t[..., 0], t[..., 1]], axis=-1)
    q2 = jnp.stack(
        [q[..., 0], q[..., 3], q[..., 1], q[..., 2]], axis=-1)
    return lie.pose_make(q2, t2)


def downsample_cloud(
    points: jnp.ndarray,
    channels: int,
    vert_downsample: int = 1,
    horiz_downsample: int = 1,
    rings_major: bool = False,
) -> jnp.ndarray:
    """Channel/horizontal decimation of an ordered cloud (N, D) — the
    KITTI HDL-64E → VLP-16 conversion (downsample_pointcloud.py:43-62:
    vert 4×, horiz 2×). ``rings_major`` mirrors the node's `transpose` flag
    (input laid out rings-major vs. points-major)."""
    D = points.shape[-1]
    n = (points.shape[0] // channels) * channels
    p = points[:n]
    if rings_major:
        grid = p.reshape(-1, channels, D).transpose(1, 0, 2)
    else:
        grid = p.reshape(channels, -1, D)
    return grid[::vert_downsample, ::horiz_downsample].reshape(-1, D)


def flip_image(img: jnp.ndarray) -> jnp.ndarray:
    """180° rotation for upside-down cameras (imgflip.py:22-32)."""
    return img[..., ::-1, ::-1]


def rgb_to_mono(img: jnp.ndarray) -> jnp.ndarray:
    """Color→mono (the image_proc dependency, vil_fusion.launch:33-34) with
    the standard BT.601 luma weights."""
    w = jnp.array([0.299, 0.587, 0.114], img.dtype if
                  jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32)
    mono = jnp.einsum("...c,c->...", img.astype(w.dtype), w)
    if jnp.issubdtype(img.dtype, jnp.floating):
        return mono
    return jnp.clip(jnp.round(mono), 0, 255).astype(img.dtype)


def imu_moving_average(
    accel: jnp.ndarray,
    gyro: jnp.ndarray,
    window: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Trailing moving average over the last `window` samples — the
    reference's IMU low-pass node (imu_filter.py:30-52; its own docstring
    declares it useless, kept for capability parity)."""
    def avg(x):
        k = jnp.ones((window,), x.dtype) / window
        pad = jnp.concatenate([jnp.repeat(x[:1], window - 1, 0), x], axis=0)
        return jax.vmap(
            lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1,
            out_axes=1)(pad)

    return avg(accel), avg(gyro)
