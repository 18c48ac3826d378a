"""Per-frame VIO step: IMU propagation → iterated camera update → landmark
replenishment — the 20 Hz odometry producer of the reference system
(/rovio/odometry, diagnostics_params.yaml:2-6), emitting pose + 6×6
covariance for the degeneracy metrics and the fusion back-end.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import lie
from . import ekf as E


class VioFrameInput(NamedTuple):
    """Everything one camera frame brings (static shapes).

    The tracker (or synthetic generator) supplies per-slot measurements;
    replacement slots carry a fresh pixel + depth (LiDAR-provided — the
    useDepthFromLiDAR path, rovio.cfg:133-138)."""

    accel: jnp.ndarray        # (N, 3) IMU window since last frame
    gyro: jnp.ndarray         # (N, 3)
    dts: jnp.ndarray          # (N,)
    obs_uv: jnp.ndarray       # (M, 2) tracked pixel per landmark slot
    obs_valid: jnp.ndarray    # (M,)
    obs_depth: jnp.ndarray    # (M,) LiDAR depth at the tracked pixel
                              # (0 = none) — continuous scale anchor
    new_uv: jnp.ndarray       # (M, 2) replacement feature pixel per slot
    new_depth: jnp.ndarray    # (M,)
    new_enable: jnp.ndarray   # (M,) 1 ⇒ re-initialize this slot


class VioOutput(NamedTuple):
    pose: jnp.ndarray         # (7,)
    vel: jnp.ndarray          # (3,)
    cov: jnp.ndarray          # (6, 6) pose covariance, (trans, rot) order
    # Twist covariance (v_body, ω_body) — what the reference's
    # use_odom_covariance copies into the between noise
    # (SensorManagerRos.cpp:154-156); see ekf.twist_covariance.
    twist_cov: jnp.ndarray    # (6, 6)


def step(
    cfg: E.VioConfig,
    s: E.VioState,
    fin: VioFrameInput,
    depth_sigma: float = 0.1,
) -> tuple[E.VioState, VioOutput]:
    s = E.propagate(cfg, s, fin.accel, fin.gyro, fin.dts)
    if cfg.use_gravity_update or cfg.use_zero_velocity_update:
        static = E.detect_no_motion(cfg, fin.accel, fin.gyro, fin.dts)
    if cfg.use_gravity_update:
        live = (fin.dts > 0).astype(s.pose.dtype)
        n = jnp.maximum(jnp.sum(live), 1.0)
        accel_mean = jnp.sum(fin.accel * live[:, None], axis=0) / n
        s = E.gravity_update(cfg, s, accel_mean, is_static=static)
    if cfg.use_zero_velocity_update:
        s = E.zero_velocity_update(cfg, s, static)
    s = E.update(cfg, s, fin.obs_uv, fin.obs_valid,
                 obs_depth=fin.obs_depth)

    # Replenish slots (scan over slots; most frames enable none or few).
    def repl(i, st):
        return E.init_landmark(
            cfg, st, jnp.asarray(i, jnp.int32), fin.new_uv[i],
            fin.new_depth[i], jnp.asarray(depth_sigma, st.pose.dtype),
            fin.new_enable[i] > 0)

    s = jax.lax.fori_loop(0, cfg.num_landmarks, repl, s)
    return s, VioOutput(
        pose=s.pose, vel=s.vel, cov=E.pose_covariance(cfg, s),
        twist_cov=E.twist_covariance(cfg, s))


def run(
    cfg: E.VioConfig,
    s: E.VioState,
    frames: VioFrameInput,      # stacked (T, ·)
    depth_sigma: float = 0.1,
) -> tuple[E.VioState, VioOutput]:
    def body(st, fin):
        return step(cfg, st, fin, depth_sigma)

    return jax.lax.scan(body, s, frames)
