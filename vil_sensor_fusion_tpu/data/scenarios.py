"""Full-system synthetic scenarios: one call builds everything a VIL run
needs — IMU stream, VIO feature frames, raycast LiDAR sweeps, ground truth —
from an analytic trajectory through a geometric world.

These replace the Carla sample bags (sample_bags/README.md) as the
deterministic evaluation substrate; the corridor world reproduces the
thesis's labeled degenerate windows (tunnel), the town world its
well-conditioned segments.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..frontends import vio as V
from . import raycast as rc
from . import synthetic as syn


class VilScenario(NamedTuple):
    traj: object
    world: rc.World
    # IMU stream
    imu_times: jnp.ndarray
    imu_accel: jnp.ndarray
    imu_gyro: jnp.ndarray
    # VIO
    vio_times: np.ndarray
    vio_frames: V.VioFrameInput
    # LiDAR
    lidar_times: np.ndarray
    sweeps: object                  # stacked Sweep (T_l, R, A, ·)
    lidar_guess_idx: np.ndarray     # vio frame index per sweep
    # Ground truth at every odometry event time (sorted merge happens later)
    gt_vio_poses: np.ndarray
    gt_lidar_poses: np.ndarray
    # Labeled degenerate time windows [(start_s, end_s), ...] — the
    # DEGEN_TRANS dictionaries of make_prettier_graphs.py:46-120. Empty for
    # well-conditioned scenarios.
    degen_windows: tuple = ()


def _corridor_traj(speed: float = 4.0):
    """Straight drive down the corridor (x axis) at sensor height 1.5 m."""
    def pos_fn(t):
        return jnp.stack([speed * t, 0.05 * jnp.sin(0.5 * t), 1.5 + 0.0 * t])

    def rot_fn(t):
        from ..core import lie
        return lie.so3_exp(jnp.stack([0.0 * t, 0.0 * t, 0.01 * jnp.sin(0.3 * t)]))

    return syn.trajectory(pos_fn, rot_fn)


def _town_traj(speed: float = 4.0):
    """Gently curving drive through the box town at sensor height 1.5 m."""
    def pos_fn(t):
        return jnp.stack([speed * t, 2.0 * jnp.sin(0.25 * t), 1.5 + 0.0 * t])

    def rot_fn(t):
        from ..core import lie
        yaw = jnp.arctan2(2.0 * 0.25 * jnp.cos(0.25 * t), speed)
        return lie.so3_exp(jnp.stack([0.0 * t, 0.0 * t, yaw]))

    return syn.trajectory(pos_fn, rot_fn)


def build(
    kind: str = "town",
    duration: float = 4.0,
    vio_hz: float = 20.0,
    lidar_hz: float = 10.0,
    imu_hz: float = 200.0,
    vio_cfg: V.VioConfig | None = None,
    dtype=jnp.float32,
    seed: int = 0,
    imu_accel_noise: float = 0.0,
    imu_gyro_noise: float = 0.0,
) -> VilScenario:
    if vio_cfg is None:
        vio_cfg = V.VioConfig()
    degen_windows = ()
    if kind == "corridor":
        world = rc.corridor_world(width=8.0, height=5.0, dtype=dtype)
        traj = _corridor_traj()
        lm_extent, lm_height = 30.0, (0.5, 4.5)
        degen_windows = ((0.0, duration),)
    elif kind == "town":
        world = rc.town_world(n_boxes=28, seed=seed, dtype=dtype)
        traj = _town_traj()
        lm_extent, lm_height = 40.0, (0.5, 10.0)
    elif kind == "tunnel":
        # Town drive that passes through a tunnel in the middle third —
        # the labeled-window bag structure ('Tunnel 25-35 s').
        speed = 4.0
        x0, x1 = speed * duration / 3.0, speed * duration * 2.0 / 3.0
        world = rc.tunnel_world(x0=x0, x1=x1, width=8.0, height=5.0,
                                n_boxes=28, seed=seed, dtype=dtype)
        traj = _corridor_traj(speed=speed)
        lm_extent, lm_height = 40.0, (0.5, 10.0)
        # Inside-the-tube times, with half a sweep of margin at each portal —
        # clamped to the transit time so short drives cannot produce an
        # inverted (start > end) window that would mislabel the ROC ground
        # truth.
        margin = min(0.5, (x1 - x0) / speed / 2.0)
        degen_windows = ((x0 / speed + margin, x1 / speed - margin),)
    else:
        raise ValueError(kind)

    key = jax.random.PRNGKey(seed)
    imu_t = jnp.arange(int(duration * imu_hz) + 20, dtype=dtype) / imu_hz
    imu = syn.sample_imu(traj, imu_t, accel_noise=imu_accel_noise,
                         gyro_noise=imu_gyro_noise,
                         key=key if imu_accel_noise > 0 else None)

    vio_times = (np.arange(int(duration * vio_hz)) + 1.0) / vio_hz
    poses_gt_vio = np.asarray(
        jax.vmap(traj.pose_fn)(jnp.asarray(vio_times, dtype)))
    imu_w = V.synthetic.imu_windows_for_frames(
        traj, vio_times, imu_hz=imu_hz, dtype=dtype)
    # VIO landmarks: scatter around the drive path.
    lms = V.synthetic.landmark_field(400, seed=seed + 1, extent=lm_extent,
                                     height=lm_height)
    lms[:, 0] += duration * 2.0  # center along the drive
    frames = V.synthetic.make_frames(
        vio_cfg, poses_gt_vio, imu_w, lms, pixel_noise=0.5,
        depth_noise=0.05, seed=seed + 2)
    frames = jax.tree_util.tree_map(lambda x: x.astype(dtype), frames)

    lidar_times = (np.arange(int(duration * lidar_hz)) + 1.0) / lidar_hz
    poses_gt_lidar = np.asarray(
        jax.vmap(traj.pose_fn)(jnp.asarray(lidar_times, dtype)))
    sweeps = rc.sweep_series(world, jnp.asarray(poses_gt_lidar, dtype))
    # Each sweep's prior = the VIO frame at the same time (vio_hz multiple).
    ratio = vio_hz / lidar_hz
    guess_idx = (np.round((np.arange(len(lidar_times)) + 1) * ratio) - 1
                 ).astype(np.int64)

    return VilScenario(
        traj=traj, world=world,
        imu_times=imu.times, imu_accel=imu.accel, imu_gyro=imu.gyro,
        vio_times=vio_times, vio_frames=frames,
        lidar_times=lidar_times, sweeps=sweeps, lidar_guess_idx=guess_idx,
        gt_vio_poses=poses_gt_vio, gt_lidar_poses=poses_gt_lidar,
        degen_windows=degen_windows,
    )
