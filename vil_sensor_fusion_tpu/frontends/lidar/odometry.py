"""LiDAR odometry pipeline: feature extraction → scan-to-map registration →
map update — the capability of the reference's LOAM fork
(4 nodelets, gtsam_fusion/launch/loam.launch:31-57) as one jit-compiled
per-sweep step, carried through ``lax.scan`` over a drive.

Outputs per sweep exactly what the thesis consumes downstream:
- the odometry pose,
- the **6×6 ICP Hessian** (LOAM fork's OptStatus message,
  gtsam_fusion/README.md:27-28) feeding the degeneracy gate,
- a pose covariance (scaled Hessian inverse) for the fusion back-end
  (the fork's `feature/publish_covariance` behavior).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import lie
from . import features as feat
from . import icp as I
from . import voxelmap as vm
from .rangeimage import Sweep


class LidarOdomConfig(NamedTuple):
    icp: I.IcpConfig = I.IcpConfig()
    corner_map: vm.VoxelMapConfig = vm.VoxelMapConfig(capacity=8192, leaf=0.2)
    surf_map: vm.VoxelMapConfig = vm.VoxelMapConfig(capacity=16384, leaf=0.4)
    submap_corners: int = 4096
    submap_surfs: int = 8192
    submap_radius: float = 100.0
    # Covariance scale: cov = cost/(n-6) · H⁻¹ (standard GN posterior).
    min_dof: float = 12.0


class LidarOdomState(NamedTuple):
    corner_map: vm.VoxelMap
    surf_map: vm.VoxelMap
    pose: jnp.ndarray        # (7,) world_T_sensor of the last sweep
    initialized: jnp.ndarray  # scalar 0/1


class LidarOdomResult(NamedTuple):
    pose: jnp.ndarray        # (7,)
    hessian: jnp.ndarray     # (6, 6) — the degeneracy signal
    cov: jnp.ndarray         # (6, 6)
    degenerate: jnp.ndarray  # (6,)
    n_corr: jnp.ndarray
    cost: jnp.ndarray


def init(cfg: LidarOdomConfig, dtype=jnp.float32) -> LidarOdomState:
    return LidarOdomState(
        corner_map=vm.empty(cfg.corner_map, dtype),
        surf_map=vm.empty(cfg.surf_map, dtype),
        pose=lie.pose_identity(dtype),
        initialized=jnp.zeros((), dtype),
    )


def _to_world(pose, pts):
    return lie.quat_rotate(lie.pose_quat(pose)[None, :], pts) \
        + lie.pose_trans(pose)[None, :]


def step(
    cfg: LidarOdomConfig,
    state: LidarOdomState,
    sweep: Sweep,
    pose_guess: jnp.ndarray,
    register_fn=None,
) -> tuple[LidarOdomState, LidarOdomResult]:
    """Process one sweep. ``pose_guess`` is the motion-model / IMU prior
    (LOAM's external-prior input; identity-motion fallback).

    ``register_fn``: optional registration override with ``icp.register``'s
    positional signature (pose0, q_c, m_c, q_s, m_s, map_c, map_cm, map_s,
    map_sm) → IcpResult — the hook the model-parallel path uses to run the
    normal-equation reduction sharded over points (parallel.ops
    .make_sharded_lidar_step)."""
    dtype = state.pose.dtype
    fs = feat.extract(sweep)

    # Query sets: the corner pool and the surface pool (LaserMapping
    # registers the less-sharp/less-flat clouds against the map).
    q_corners, q_corner_mask = fs.less_sharp, fs.less_sharp_mask
    q_surfs = jnp.concatenate([fs.flat, fs.less_flat], axis=0)
    q_surf_mask = jnp.concatenate([fs.flat_mask, fs.less_flat_mask], axis=0)

    center = lie.pose_trans(pose_guess)
    sub_c = vm.submap(state.corner_map, center, cfg.submap_corners,
                      cfg.submap_radius)
    sub_s = vm.submap(state.surf_map, center, cfg.submap_surfs,
                      cfg.submap_radius)

    if register_fn is None:
        def register_fn(*a):
            return I.register(*a, cfg.icp)

    res = register_fn(
        pose_guess,
        q_corners, q_corner_mask, q_surfs, q_surf_mask,
        sub_c.points, sub_c.mask, sub_s.points, sub_s.mask,
    )
    # First sweep: no map yet — keep the guess.
    has_map = state.initialized > 0
    pose = jnp.where(has_map, res.pose, pose_guess)

    # Covariance: σ² H⁻¹ with σ² = cost / max(n_corr − 6, min_dof); on the
    # first sweep (no registration) fall back to a weak identity.
    dof = jnp.maximum(res.n_corr - 6.0, cfg.min_dof)
    sigma2 = jnp.where(has_map, res.cost / dof, 1.0)
    eye6 = jnp.eye(6, dtype=dtype)
    H_reg = res.hessian + 1e-6 * eye6
    cov = jnp.where(has_map,
                    sigma2 * jnp.linalg.inv(H_reg),
                    eye6 * 1e2)

    # Map update: insert the sweep's features at the refined pose.
    cm = vm.insert(state.corner_map, _to_world(pose, q_corners),
                   q_corner_mask, lie.pose_trans(pose), cfg.corner_map)
    sm = vm.insert(state.surf_map, _to_world(pose, q_surfs),
                   q_surf_mask, lie.pose_trans(pose), cfg.surf_map)

    new_state = LidarOdomState(
        corner_map=cm, surf_map=sm, pose=pose,
        initialized=jnp.ones((), dtype),
    )
    return new_state, LidarOdomResult(
        pose=pose, hessian=res.hessian, cov=cov,
        degenerate=res.degenerate, n_corr=res.n_corr, cost=res.cost,
    )


def run(
    cfg: LidarOdomConfig,
    state: LidarOdomState,
    sweeps: Sweep,                 # stacked (T, R, A, ·)
    pose_guesses: jnp.ndarray,     # (T, 7) per-sweep priors
    register_fn=None,
) -> tuple[LidarOdomState, LidarOdomResult]:
    """Scan over a whole drive (jit end-to-end)."""

    def body(st, x):
        sweep, guess = x
        return step(cfg, st, sweep, guess, register_fn=register_fn)

    return jax.lax.scan(body, state, (sweeps, pose_guesses))


def constant_velocity_guess(prev_pose, prev_prev_pose):
    """Motion-model prior: extrapolate the last relative motion (LOAM's
    internal motion model when no external prior is available)."""
    d = lie.pose_between(prev_prev_pose, prev_pose)
    return lie.pose_compose(prev_pose, d)
