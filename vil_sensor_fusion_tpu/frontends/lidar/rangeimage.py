"""Point cloud → organized range image.

The reference's LOAM fork ingests VLP-16-style multiscan clouds and
internally organizes them per scan ring (gtsam_fusion/config/carla/
loam_params.yaml MultiScanRegistration block: ``lidar: VLP-16``). On TPU the
organized (RINGS, AZIMUTH) grid **is** the native layout: static shape,
lane-aligned, and every per-ring neighborhood op becomes a vectorized shift.

A sweep is stored as:
  ``xyz``  — (R, A, 3) points in the sensor frame,
  ``rng``  — (R, A) range (0 where invalid),
  ``mask`` — (R, A) validity.
Azimuth column ``a`` covers angle ``2π·a/A - π``; rings are ordered by
elevation (VLP-16: -15°..+15°).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

RINGS = 16
AZIMUTH = 1800   # 0.2° resolution at 10 Hz, the VLP-16's native resolution

# VLP-16 elevation angles, degrees (evenly spaced -15..15).
VLP16_ELEVATIONS_DEG = jnp.linspace(-15.0, 15.0, RINGS)


class Sweep(NamedTuple):
    xyz: jnp.ndarray    # (R, A, 3)
    rng: jnp.ndarray    # (R, A)
    mask: jnp.ndarray   # (R, A) float 0/1


def organize(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    rings: int = RINGS,
    azimuth: int = AZIMUTH,
    elev_min_deg: float = -15.0,
    elev_max_deg: float = 15.0,
) -> Sweep:
    """Scatter an unordered (N, 3) cloud into the (R, A) grid.

    Ring index from elevation angle, azimuth bin from atan2 — the same
    assignment LOAM's MultiScanRegistration does per point. Collisions keep
    the nearer point (scatter-min on range).
    """
    dtype = points.dtype
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    r_xy = jnp.sqrt(x * x + y * y)
    rng = jnp.sqrt(x * x + y * y + z * z)
    elev = jnp.degrees(jnp.arctan2(z, r_xy))
    az = jnp.arctan2(y, x)  # [-π, π)

    ring_f = (elev - elev_min_deg) / (elev_max_deg - elev_min_deg) * (rings - 1)
    ring = jnp.clip(jnp.round(ring_f).astype(jnp.int32), 0, rings - 1)
    col = jnp.clip(
        jnp.floor((az + jnp.pi) / (2.0 * jnp.pi) * azimuth).astype(jnp.int32),
        0, azimuth - 1)

    ok = valid.astype(bool) & (rng > 0.1)
    big = jnp.asarray(1e9, dtype)
    flat_idx = ring * azimuth + col

    # Scatter-min on range to resolve collisions, then gather the winner.
    rng_grid = jnp.full((rings * azimuth,), big, dtype)
    rng_grid = rng_grid.at[flat_idx].min(jnp.where(ok, rng, big))
    # A point wins its cell iff its range equals the cell minimum.
    win = ok & (rng == rng_grid[flat_idx])
    xyz_grid = jnp.zeros((rings * azimuth, 3), dtype)
    xyz_grid = xyz_grid.at[jnp.where(win, flat_idx, rings * azimuth - 1)].set(
        jnp.where(win[..., None], points, 0.0), mode="drop")
    # Note: losers scatter zeros to the last cell; re-scatter winners after so
    # the last cell is correct if it has a real winner.
    xyz_grid = xyz_grid.at[flat_idx].set(
        jnp.where(win[..., None], points, xyz_grid[flat_idx]))

    mask = (rng_grid < big).astype(dtype)
    rng_out = jnp.where(mask > 0, rng_grid, 0.0)
    return Sweep(
        xyz=xyz_grid.reshape(rings, azimuth, 3),
        rng=rng_out.reshape(rings, azimuth),
        mask=mask.reshape(rings, azimuth),
    )


def undistort(
    sweep: Sweep,
    xi_motion: jnp.ndarray,
    scan_period_fraction: jnp.ndarray | None = None,
) -> Sweep:
    """Motion-compensate a sweep: each column was captured at a different
    time during the scan (loam_params.yaml ``scanPeriod``/
    ``undistortInputCloud``). Points are warped to the sweep-end frame with a
    per-column fraction of the relative motion ``xi_motion`` (se3 tangent of
    the end-from-start transform).
    """
    from ...core import lie

    R, A, _ = sweep.xyz.shape
    if scan_period_fraction is None:
        # Column a captured at fraction a/A of the sweep; warp by remaining
        # motion (1 - frac) toward the end pose.
        frac = (jnp.arange(A, dtype=sweep.xyz.dtype) + 0.5) / A
    else:
        frac = scan_period_fraction
    alpha = (1.0 - frac)[None, :, None]                 # (1, A, 1)
    xi = xi_motion[None, None, :] * alpha               # (1, A, 6)
    pose = lie.se3_exp(xi)                              # (1, A, 7)
    pts = lie.quat_rotate(lie.pose_quat(pose), sweep.xyz) + lie.pose_trans(pose)
    return Sweep(xyz=pts * sweep.mask[..., None], rng=sweep.rng, mask=sweep.mask)
