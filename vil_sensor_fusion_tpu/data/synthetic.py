"""Synthetic sensor-stream generation with exact ground truth.

The reference's data source is the Carla simulator recorded to rosbags
(carla_tools/scripts/record_simulation.py, sensors.json: 200-250 Hz IMU,
20 Hz camera odometry, 10 Hz LiDAR — see BASELINE.md). Those bags are an
external download (sample_bags/README.md), so the TPU framework ships a
*differentiable analytic simulator*: trajectories are smooth functions of
time and every derived quantity (velocity, world acceleration, body angular
rate, hence ideal IMU specific force) comes from ``jax.jacfwd`` — no finite
differences, no integration drift in the ground truth.

This powers:
- deterministic unit tests (smoother tracks a known trajectory),
- the end-to-end benchmark scenarios (incl. degenerate segments: straight
  featureless "tunnel" stretches analogous to the thesis's labeled windows,
  make_prettier_graphs.py:46-120),
- multi-device scaling runs (one bag per mesh shard).

Conventions: world frame z-up, gravity (0,0,-g). IMU measures specific force
f_b = Rᵀ(a_w - g_w) and body angular rate ω_b = vee(Rᵀ Ṙ).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class Trajectory(NamedTuple):
    """Analytic trajectory: all samplable at arbitrary t (scalar fns)."""

    pose_fn: Callable      # t -> (7,) pose
    vel_fn: Callable       # t -> (3,) world velocity
    acc_fn: Callable       # t -> (3,) world acceleration
    omega_fn: Callable     # t -> (3,) body angular rate


class ImuStream(NamedTuple):
    times: jnp.ndarray     # (N,)
    accel: jnp.ndarray     # (N, 3) specific force (biased, noisy)
    gyro: jnp.ndarray      # (N, 3) angular rate (biased, noisy)


class OdometryStream(NamedTuple):
    """Simulated odometry source (what ROVIO/LOAM would publish)."""

    times: jnp.ndarray     # (M,)
    poses: jnp.ndarray     # (M, 7) world pose (noisy)
    cov: jnp.ndarray       # (M, 6, 6) pose covariance (rho, theta order)


class GroundTruth(NamedTuple):
    times: jnp.ndarray
    poses: jnp.ndarray     # (M, 7)
    vels: jnp.ndarray      # (M, 3)


def trajectory(pos_fn: Callable, rot_fn: Callable) -> Trajectory:
    """Build a Trajectory from analytic position (t->(3,)) and rotation
    (t->(3,3)) functions via forward-mode autodiff."""

    vel_fn = jax.jacfwd(pos_fn)
    acc_fn = jax.jacfwd(vel_fn)
    rot_dot = jax.jacfwd(rot_fn)

    def omega_fn(t):
        R = rot_fn(t)
        return lie.vee(R.T @ rot_dot(t))

    def pose_fn(t):
        return lie.pose_make(lie.rot_to_quat(rot_fn(t)), pos_fn(t))

    return Trajectory(pose_fn, vel_fn, acc_fn, omega_fn)


def circle(radius: float = 20.0, period: float = 30.0,
           z_amp: float = 0.5, z_period: float = 7.0) -> Trajectory:
    """Car driving a circle with gentle height oscillation, yaw tangent to
    the path — the kind of loop the Carla Town autopilot bags contain."""
    w = 2.0 * jnp.pi / period
    wz = 2.0 * jnp.pi / z_period

    def pos_fn(t):
        return jnp.stack([
            radius * jnp.cos(w * t),
            radius * jnp.sin(w * t),
            z_amp * jnp.sin(wz * t),
        ])

    def rot_fn(t):
        yaw = w * t + jnp.pi / 2.0  # tangent direction
        return lie.so3_exp(jnp.stack([0.0 * t, 0.0 * t, yaw]))

    return trajectory(pos_fn, rot_fn)


def straight_tunnel(speed: float = 8.0, sway: float = 0.02) -> Trajectory:
    """Constant-velocity straight line (x-axis) with tiny sway — the
    translation-degenerate "tunnel" scenario (thesis's Tunnel 25-35 s
    labeled window): LiDAR sees two parallel walls, so the along-track
    direction is unobservable for ICP."""
    def pos_fn(t):
        return jnp.stack([speed * t, sway * jnp.sin(0.7 * t), 0.0 * t])

    def rot_fn(t):
        return lie.so3_exp(jnp.stack([0.0 * t, 0.0 * t, sway * jnp.sin(0.3 * t)]))

    return trajectory(pos_fn, rot_fn)


def figure_eight(radius: float = 15.0, period: float = 40.0) -> Trajectory:
    """Lemniscate path — richer excitation of all axes."""
    w = 2.0 * jnp.pi / period

    def pos_fn(t):
        return jnp.stack([
            radius * jnp.sin(w * t),
            radius * jnp.sin(w * t) * jnp.cos(w * t),
            0.3 * jnp.sin(3.0 * w * t),
        ])

    vx = jax.jacfwd(pos_fn)

    def rot_fn(t):
        v = vx(t)
        yaw = jnp.arctan2(v[1], v[0])
        return lie.so3_exp(jnp.stack([0.0 * t, 0.0 * t, yaw]))

    return trajectory(pos_fn, rot_fn)


# ---------------------------------------------------------------------------
# Stream sampling
# ---------------------------------------------------------------------------

def sample_imu(
    traj: Trajectory,
    times: jnp.ndarray,
    gravity: float = 9.81,
    accel_noise: float = 0.0,
    gyro_noise: float = 0.0,
    accel_bias: jnp.ndarray | None = None,
    gyro_bias: jnp.ndarray | None = None,
    key: jax.Array | None = None,
) -> ImuStream:
    """Sample ideal IMU measurements along the trajectory, add bias + white
    noise (the Carla IMU's noise model is white gaussian too)."""
    g_w = jnp.array([0.0, 0.0, -gravity], dtype=times.dtype)

    def one(t):
        R = lie.quat_to_rot(lie.pose_quat(traj.pose_fn(t)))
        f = R.T @ (traj.acc_fn(t) - g_w)
        return f, traj.omega_fn(t)

    f, w = jax.vmap(one)(times)
    if accel_bias is not None:
        f = f + accel_bias
    if gyro_bias is not None:
        w = w + gyro_bias
    if key is not None and (accel_noise > 0 or gyro_noise > 0):
        k1, k2 = jax.random.split(key)
        f = f + accel_noise * jax.random.normal(k1, f.shape, f.dtype)
        w = w + gyro_noise * jax.random.normal(k2, w.shape, w.dtype)
    return ImuStream(times=times, accel=f, gyro=w)


def sample_odometry(
    traj: Trajectory,
    times: jnp.ndarray,
    trans_noise: float = 0.0,
    rot_noise: float = 0.0,
    key: jax.Array | None = None,
) -> OdometryStream:
    """Sample a world-frame odometry stream (what the VIO/LOAM front-ends
    publish) with optional white pose noise, plus a matching covariance."""
    poses = jax.vmap(traj.pose_fn)(times)
    M = times.shape[0]
    if key is not None and (trans_noise > 0 or rot_noise > 0):
        k1, k2 = jax.random.split(key)
        dt_ = trans_noise * jax.random.normal(k1, (M, 3), times.dtype)
        dr = rot_noise * jax.random.normal(k2, (M, 3), times.dtype)
        xi = jnp.concatenate([dt_, dr], axis=-1)
        poses = lie.pose_retract(poses, xi)
    diag = jnp.array([max(trans_noise, 1e-4) ** 2] * 3
                     + [max(rot_noise, 1e-4) ** 2] * 3, dtype=times.dtype)
    cov = jnp.broadcast_to(jnp.diag(diag), (M, 6, 6))
    return OdometryStream(times=times, poses=poses, cov=cov)


def sample_ground_truth(traj: Trajectory, times: jnp.ndarray) -> GroundTruth:
    poses = jax.vmap(traj.pose_fn)(times)
    vels = jax.vmap(traj.vel_fn)(times)
    return GroundTruth(times=times, poses=poses, vels=vels)
