"""Synthetic feature-track generation for VIO tests and benchmarks: a field
of world landmarks projected through the camera along a trajectory, with a
simple slot-assignment policy standing in for the tracker.

Replaces what the Carla camera + ROVIO's tracker provide in the reference
(sensors.json front camera → /rovio/odometry), with exact ground truth.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core import lie
from . import camera as C
from . import ekf as E
from .pipeline import VioFrameInput


def landmark_field(n: int, seed: int = 0, extent: float = 40.0,
                   height: tuple = (0.0, 10.0)) -> np.ndarray:
    """Random world landmarks scattered around the origin."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-extent, extent, (n, 2))
    z = rng.uniform(height[0], height[1], (n,))
    return np.concatenate([xy, z[:, None]], axis=-1)


def make_frames(
    cfg: E.VioConfig,
    poses: np.ndarray,        # (T, 7) world_T_imu ground truth per frame
    imu_windows,              # (accel (T,N,3), gyro (T,N,3), dts (T,N))
    landmarks: np.ndarray,    # (L, 3) world landmark field
    pixel_noise: float = 0.5,
    depth_noise: float = 0.05,
    seed: int = 0,
) -> VioFrameInput:
    """Host-side generation of the full frame stream with a greedy tracker:
    each of the M slots tracks one world landmark; when it leaves the view,
    the slot is re-initialized with the most central visible untracked one
    (pixel + LiDAR-like depth)."""
    rng = np.random.default_rng(seed)
    cam = cfg.cam
    M = cfg.num_landmarks
    T = poses.shape[0]
    L = landmarks.shape[0]

    def project_all(pose):
        pose_wc = lie.pose_compose(jnp.asarray(pose),
                                   jnp.asarray(cfg.pose_ic))
        p_cam = lie.quat_rotate(
            lie.quat_conjugate(lie.pose_quat(pose_wc))[None],
            jnp.asarray(landmarks) - lie.pose_trans(pose_wc)[None])
        uv, ok = C.project(cam, p_cam)
        return np.asarray(uv), np.asarray(ok), np.asarray(p_cam[..., 2])

    slot_lm = -np.ones(M, np.int64)       # which world landmark each slot tracks
    obs_uv = np.zeros((T, M, 2))
    obs_valid = np.zeros((T, M))
    obs_depth = np.zeros((T, M))
    new_uv = np.zeros((T, M, 2))
    new_depth = np.ones((T, M))
    new_enable = np.zeros((T, M))

    for t in range(T):
        uv, ok, depth = project_all(poses[t])
        # Track continuing slots.
        for m in range(M):
            lm = slot_lm[m]
            if lm >= 0 and ok[lm]:
                obs_uv[t, m] = uv[lm] + pixel_noise * rng.standard_normal(2)
                obs_valid[t, m] = 1.0
                obs_depth[t, m] = max(
                    depth[lm] + depth_noise * rng.standard_normal(), 0.3)
            else:
                slot_lm[m] = -1
        # Replenish dead slots with the most central visible untracked lm.
        tracked = set(slot_lm[slot_lm >= 0].tolist())
        c = np.array([cam.cx, cam.cy])
        cand = [(np.linalg.norm(uv[l] - c), l)
                for l in range(L) if ok[l] and l not in tracked]
        cand.sort()
        ci = 0
        for m in range(M):
            if slot_lm[m] < 0 and ci < len(cand):
                l = cand[ci][1]
                ci += 1
                slot_lm[m] = l
                new_uv[t, m] = uv[l] + pixel_noise * rng.standard_normal(2)
                new_depth[t, m] = max(
                    depth[l] + depth_noise * rng.standard_normal(), 0.3)
                new_enable[t, m] = 1.0

    accel, gyro, dts = imu_windows
    return VioFrameInput(
        accel=jnp.asarray(accel), gyro=jnp.asarray(gyro),
        dts=jnp.asarray(dts),
        obs_uv=jnp.asarray(obs_uv), obs_valid=jnp.asarray(obs_valid),
        obs_depth=jnp.asarray(obs_depth),
        new_uv=jnp.asarray(new_uv), new_depth=jnp.asarray(new_depth),
        new_enable=jnp.asarray(new_enable),
    )


def imu_windows_for_frames(traj, frame_times: np.ndarray, imu_hz: float,
                           dtype=jnp.float64, t_start: float = 0.0,
                           **imu_kwargs):
    """Sample per-frame IMU windows from an analytic trajectory: window t
    covers (frame_{t-1}, frame_t] at the IMU rate.

    ``t_start``: the time the FIRST listed frame's window opens at —
    REQUIRED when ``frame_times`` is a mid-drive chunk (streaming/soak
    runs): the default 0.0 would make the first window re-integrate the
    whole elapsed drive (a catastrophic EKF jump at every chunk boundary,
    plus a per-chunk shape change that forces recompiles)."""
    from ...data import synthetic as syn

    T = len(frame_times)
    frame_times = np.asarray(frame_times, np.float64)
    t0s = np.concatenate([[t_start], frame_times[:-1]])
    dt_frame = frame_times - t0s
    n_per = int(np.ceil(dt_frame.max() * imu_hz)) + 1
    # Sample grid per frame: t0 + k/hz clamped at the frame time — the
    # clamped tail repeats t1 with dt 0 (masked by the dt>0 live check in
    # preintegration/EKF propagation), and the first clamped sample IS the
    # interpolated window-edge sample (IMUManager.cpp:57-66 semantics).
    # One vectorized sample_imu call for the whole stream (the previous
    # per-frame Python loop retraced per window length — minutes of host
    # time on long chunks).
    k = np.arange(1, n_per + 1)
    ts = np.minimum(t0s[:, None] + k[None, :] / imu_hz,
                    frame_times[:, None])               # (T, n_per)
    prev = np.concatenate([t0s[:, None], ts[:, :-1]], axis=1)
    dts = ts - prev
    stream = syn.sample_imu(
        traj, jnp.asarray(ts.reshape(-1), dtype), **imu_kwargs)
    accel = np.asarray(stream.accel).reshape(T, n_per, 3)
    gyro = np.asarray(stream.gyro).reshape(T, n_per, 3)
    return (jnp.asarray(accel, dtype), jnp.asarray(gyro, dtype),
            jnp.asarray(dts, dtype))
