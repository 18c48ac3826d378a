"""LiDAR odometry pipeline: motion undistortion → feature extraction →
two-stage registration (scan-to-scan odometry, then scan-to-map refinement)
→ map update — the capability of the reference's LOAM fork
(4 nodelets, gtsam_fusion/launch/loam.launch:31-57) as one jit-compiled
per-sweep step, carried through ``lax.scan`` over a drive.

Stage structure mirrors the fork's launch graph:
- **undistortion** — ego-motion compensation of the sweep from the motion
  prior (loam_params.yaml ``scanPeriod``/``undistortInputCloud``).
- **laser_odometry** — scan-to-scan: the sweep's sharp/flat features
  registered against the previous sweep's feature pools
  (odomMaxIterations 25, loam.launch:37-42).
- **laser_mapping** — scan-to-map: the feature pools registered against the
  voxel-map submap, initialized at the odometry stage's estimate
  (mapMaxIterations 10, loam.launch:44-50).

Outputs per sweep exactly what the thesis consumes downstream:
- the odometry pose,
- the **6×6 ICP Hessian** (LOAM fork's OptStatus message,
  gtsam_fusion/README.md:27-28) feeding the degeneracy gate,
- a pose covariance (scaled Hessian inverse) for the fusion back-end
  (the fork's `feature/publish_covariance` behavior),
- the per-DOF perturbation-sweep correspondence distances
  (OdometryWithHessian ``dists``/``shift_*``, the dist_slope metrics' input
  — make_prettier_graphs.py:429-446).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import lie
from . import features as feat
from . import icp as I
from . import rangeimage as RI
from . import voxelmap as vm
from .rangeimage import Sweep


class LidarOdomConfig(NamedTuple):
    icp: I.IcpConfig = I.IcpConfig()
    # Scan-to-scan stage (two_stage mode): looser correspondence radius —
    # consecutive sweeps are ≤1 period apart — and LOAM's higher iteration
    # budget (odomMaxIterations 25 vs mapMaxIterations 10; here scaled down
    # with the same ratio).
    odom_icp: I.IcpConfig = I.IcpConfig(iters=8, max_corr_dist=2.0,
                                        degen_eigval=5.0)
    # Reference-parity LOAM structure ON by default (loam.launch:31-57 runs
    # odometry AND mapping nodelets; undistortInputCloud/scanPeriod).
    two_stage: bool = True       # scan-to-scan odometry before mapping
    undistort: bool = True       # ego-motion compensation (scanPeriod)
    emit_dists: bool = False     # perturbation-sweep correspondence dists
    dists_shifts: int = 15       # S of the 6×S dists arrays
    # Map residency sized for multi-minute drives (the reference's 5:45
    # bags): at 0.2/0.4 m leaves these capacities hold the full keep_radius
    # neighborhood without thrashing (LOAM's cube map achieves residency
    # with a 101x51x101x10 m array; here a flat nearest-K store does).
    corner_map: vm.VoxelMapConfig = vm.VoxelMapConfig(capacity=32768,
                                                      leaf=0.2)
    surf_map: vm.VoxelMapConfig = vm.VoxelMapConfig(capacity=65536,
                                                    leaf=0.4)
    submap_corners: int = 4096
    submap_surfs: int = 8192
    submap_radius: float = 100.0
    # Hardware approximate top-k for the submap selection (~3x cheaper at
    # 64k→8k; the few swapped far members are registration-irrelevant).
    submap_approx: bool = True
    # Covariance scale: cov = cost/(n-6) · H⁻¹ (standard GN posterior).
    min_dof: float = 12.0
    # Interpret ``pose_guess`` as the RELATIVE motion since the previous
    # sweep, composed onto the odometry's own last pose — the robust prior
    # construction (the reference's LOAM consumes the external odometry as
    # motion, not as an absolute anchor): the external estimator's absolute
    # drift cancels, only its (accurate) short-horizon delta enters.
    guess_is_delta: bool = False
    # Sweep grid (for the prev-sweep feature-pool shapes in two_stage mode).
    rings: int = RI.RINGS
    azimuth: int = RI.AZIMUTH


class LidarOdomState(NamedTuple):
    corner_map: vm.VoxelMap
    surf_map: vm.VoxelMap
    pose: jnp.ndarray        # (7,) world_T_sensor of the last sweep
    initialized: jnp.ndarray  # scalar 0/1
    # Previous sweep's feature pools in WORLD frame (scan-to-scan targets).
    prev_corners: jnp.ndarray      # (Nc, 3)
    prev_corner_mask: jnp.ndarray  # (Nc,)
    prev_surfs: jnp.ndarray        # (Ns, 3)
    prev_surf_mask: jnp.ndarray    # (Ns,)


class LidarOdomResult(NamedTuple):
    pose: jnp.ndarray        # (7,) mapping-stage (final) pose
    hessian: jnp.ndarray     # (6, 6) — the degeneracy signal
    cov: jnp.ndarray         # (6, 6)
    degenerate: jnp.ndarray  # (6,)
    n_corr: jnp.ndarray
    cost: jnp.ndarray
    # Scan-to-scan stage outputs (== mapping outputs when single-stage).
    odom_pose: jnp.ndarray     # (7,)
    odom_hessian: jnp.ndarray  # (6, 6)
    # Perturbation-sweep correspondence distances (zeros when disabled).
    dists: I.PerturbationDists


def _zero_dists(cfg: LidarOdomConfig, dtype) -> I.PerturbationDists:
    S = cfg.dists_shifts
    return I.PerturbationDists(
        dists=jnp.zeros((6, S), dtype),
        dists_corner=jnp.zeros((6, S), dtype),
        dists_surface=jnp.zeros((6, S), dtype),
        shift_trans=jnp.zeros((S,), dtype),
        shift_rot=jnp.zeros((S,), dtype),
    )


def init(cfg: LidarOdomConfig, dtype=jnp.float32,
         pose0: jnp.ndarray | None = None) -> LidarOdomState:
    """``pose0``: initial world_T_sensor (required in guess_is_delta mode
    when the trajectory does not start at the origin)."""
    nc, ns = feat.pool_sizes(cfg.rings, cfg.azimuth)
    return LidarOdomState(
        corner_map=vm.empty(cfg.corner_map, dtype),
        surf_map=vm.empty(cfg.surf_map, dtype),
        pose=lie.pose_identity(dtype) if pose0 is None
        else jnp.asarray(pose0, dtype),
        initialized=jnp.zeros((), dtype),
        prev_corners=jnp.zeros((nc, 3), dtype),
        prev_corner_mask=jnp.zeros((nc,), dtype),
        prev_surfs=jnp.zeros((ns, 3), dtype),
        prev_surf_mask=jnp.zeros((ns,), dtype),
    )


def _to_world(pose, pts):
    return lie.quat_rotate(lie.pose_quat(pose)[None, :], pts) \
        + lie.pose_trans(pose)[None, :]


def _covariance(cfg: LidarOdomConfig, hessian, cost, n_corr, has_map):
    """cov = σ² H⁻¹ with σ² = cost / max(n_corr − 6, min_dof); where no map
    existed yet (no registration happened) fall back to a weak identity.
    Batched over leading axes; H⁻¹ via fixed-sweep Jacobi (a single 6×6
    ``jnp.linalg.inv`` is ~2.5 ms on TPU — see ops/eig6)."""
    from ...ops import eig6 as E6

    dtype = hessian.dtype
    dof = jnp.maximum(n_corr - 6.0, cfg.min_dof)
    sigma2 = jnp.where(has_map, cost / dof, 1.0)
    eye6 = jnp.eye(6, dtype=dtype)
    w6, V6 = E6.jacobi_eigh(hessian + 1e-6 * eye6)
    w6 = jnp.maximum(w6, 1e-8)
    H_inv = jnp.einsum("...ij,...j,...kj->...ik", V6, 1.0 / w6, V6)
    return jnp.where(has_map[..., None, None], sigma2[..., None, None] * H_inv,
                     eye6 * 1e2)


def step(
    cfg: LidarOdomConfig,
    state: LidarOdomState,
    sweep: Sweep,
    pose_guess: jnp.ndarray,
    register_fn=None,
    compute_cov: bool = True,
) -> tuple[LidarOdomState, LidarOdomResult]:
    """Process one sweep. ``pose_guess`` is the motion-model / IMU prior
    (LOAM's external-prior input; identity-motion fallback).

    ``register_fn``: optional registration override with ``icp.register``'s
    positional signature (pose0, q_c, m_c, q_s, m_s, map_c, map_cm, map_s,
    map_sm) → IcpResult — the hook the model-parallel path uses to run the
    normal-equation reduction sharded over points (parallel.ops
    .make_sharded_lidar_step). Applies to the mapping stage (the heavy one).
    """
    dtype = state.pose.dtype
    has_map = state.initialized > 0
    delta_guess = pose_guess
    if cfg.guess_is_delta:
        pose_guess = lie.pose_compose(state.pose, pose_guess)

    # --- Stage 0: motion undistortion ---------------------------------------
    if cfg.undistort:
        # end_T_start of this sweep from the motion prior (constant-velocity
        # within the sweep): state.pose = previous sweep end, pose_guess =
        # this sweep end.
        if cfg.guess_is_delta:
            # Exact and state-independent: log(delta⁻¹) = −log(delta). In
            # particular the FIRST sweep is undistorted too — critical,
            # because the hashed voxel map keeps the first observation of
            # every voxel (insert_hashed: old points are authoritative), so
            # a distorted first sweep would poison every voxel in range for
            # the rest of the drive (measured: 0.23 m mean registration
            # error plateau at 4 m/s vs 0.04 m with the seed sweep clean).
            xi = -lie.se3_log(delta_guess)
        else:
            # Absolute-guess mode: the motion comes from state.pose, which
            # is only trustworthy once initialized — fall back to no-warp
            # on the first sweep.
            xi = lie.se3_log(lie.pose_between(pose_guess, state.pose))
            xi = jnp.where(has_map, xi, jnp.zeros_like(xi))
        sweep = RI.undistort(sweep, xi)

    fs = feat.extract(sweep)

    # Query sets: the corner pool and the surface pool (LaserMapping
    # registers the less-sharp/less-flat clouds against the map).
    q_corners, q_corner_mask = fs.less_sharp, fs.less_sharp_mask
    q_surfs = jnp.concatenate([fs.flat, fs.less_flat], axis=0)
    q_surf_mask = jnp.concatenate([fs.flat_mask, fs.less_flat_mask], axis=0)

    # --- Stage 1: scan-to-scan odometry (laser_odometry) --------------------
    pose_init = pose_guess
    odom_pose = pose_guess
    odom_hessian = jnp.zeros((6, 6), dtype)
    if cfg.two_stage:
        res_o = I.register(
            pose_guess,
            fs.sharp, fs.sharp_mask, fs.flat, fs.flat_mask,
            state.prev_corners, state.prev_corner_mask,
            state.prev_surfs, state.prev_surf_mask,
            cfg.odom_icp,
        )
        odom_pose = jnp.where(has_map, res_o.pose, pose_guess)
        odom_hessian = res_o.hessian
        pose_init = odom_pose

    # --- Stage 2: scan-to-map refinement (laser_mapping) --------------------
    center = lie.pose_trans(pose_init)
    sub_c = vm.submap(state.corner_map, center, cfg.submap_corners,
                      cfg.submap_radius, approx=cfg.submap_approx)
    sub_s = vm.submap(state.surf_map, center, cfg.submap_surfs,
                      cfg.submap_radius, approx=cfg.submap_approx)

    if register_fn is None:
        def register_fn(*a):
            return I.register(*a, cfg.icp)

    res = register_fn(
        pose_init,
        q_corners, q_corner_mask, q_surfs, q_surf_mask,
        sub_c.points, sub_c.mask, sub_s.points, sub_s.mask,
    )
    # First sweep: no map yet — keep the guess.
    pose = jnp.where(has_map, res.pose, pose_guess)
    if not cfg.two_stage:
        odom_pose = pose
        odom_hessian = res.hessian

    # Covariance: σ² H⁻¹ (see _covariance). Inside ``run``'s scan this is
    # deferred (compute_cov=False) and done batched over all sweeps after
    # the scan: the 6×6 Jacobi is a ~540-op sequential chain, so running it
    # per sweep serializes T chains while the post-scan batched version
    # pays for ONE.
    if compute_cov:
        cov = _covariance(cfg, res.hessian, res.cost, res.n_corr, has_map)
    else:
        cov = jnp.zeros((6, 6), dtype)

    # --- Perturbation-sweep correspondence distances ------------------------
    if cfg.emit_dists:
        dists = I.perturbation_dists(
            pose, q_corners, q_corner_mask, q_surfs, q_surf_mask,
            sub_c.points, sub_c.mask, sub_s.points, sub_s.mask,
            cfg.icp, n_shifts=cfg.dists_shifts)
    else:
        dists = _zero_dists(cfg, dtype)

    # --- Map + prev-sweep pool update ---------------------------------------
    w_corners = _to_world(pose, q_corners)
    w_surfs = _to_world(pose, q_surfs)
    cm = vm.insert_auto(state.corner_map, w_corners,
                        q_corner_mask, lie.pose_trans(pose), cfg.corner_map)
    sm = vm.insert_auto(state.surf_map, w_surfs,
                        q_surf_mask, lie.pose_trans(pose), cfg.surf_map)

    new_state = LidarOdomState(
        corner_map=cm, surf_map=sm, pose=pose,
        initialized=jnp.ones((), dtype),
        prev_corners=w_corners, prev_corner_mask=q_corner_mask,
        prev_surfs=w_surfs, prev_surf_mask=q_surf_mask,
    )
    return new_state, LidarOdomResult(
        pose=pose, hessian=res.hessian, cov=cov,
        degenerate=res.degenerate, n_corr=res.n_corr, cost=res.cost,
        odom_pose=odom_pose, odom_hessian=odom_hessian, dists=dists,
    )


def run(
    cfg: LidarOdomConfig,
    state: LidarOdomState,
    sweeps: Sweep,                 # stacked (T, R, A, ·)
    pose_guesses: jnp.ndarray,     # (T, 7) per-sweep priors
    register_fn=None,
) -> tuple[LidarOdomState, LidarOdomResult]:
    """Scan over a whole drive (jit end-to-end). The per-sweep covariance
    (σ²H⁻¹, a sequential 6×6 Jacobi chain) is hoisted out of the scan and
    computed ONCE batched over all T sweeps afterwards — identical values,
    one eigendecomposition chain instead of T."""
    init0 = state.initialized

    def body(st, x):
        sweep, guess = x
        return step(cfg, st, sweep, guess, register_fn=register_fn,
                    compute_cov=False)

    state, res = jax.lax.scan(body, state, (sweeps, pose_guesses))
    T = res.pose.shape[0]
    has_map = (jnp.arange(T) > 0) | (init0 > 0)
    cov = _covariance(cfg, res.hessian, res.cost, res.n_corr, has_map)
    return state, res._replace(cov=cov)


def constant_velocity_guess(prev_pose, prev_prev_pose):
    """Motion-model prior: extrapolate the last relative motion (LOAM's
    internal motion model when no external prior is available)."""
    d = lie.pose_between(prev_prev_pose, prev_pose)
    return lie.pose_compose(prev_pose, d)
