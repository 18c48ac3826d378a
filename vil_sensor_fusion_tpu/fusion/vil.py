"""Full VIL pipeline: VIO (20 Hz) + LiDAR odometry (10 Hz) + degeneracy
gate + factor-graph fusion — the complete system of the reference
(gtsam_fusion/launch/fusion.launch: ROVIO + LOAM + degenerate_odometry_filter
+ gtsam_fusion_node), stage-for-stage:

    camera+IMU ─→ VIO (ekf)            ─ pose+cov @20Hz ──┐
    LiDAR      ─→ lidar odometry (ICP) ─ pose+cov+HESSIAN @10Hz
                      │                                   │
                      └→ log-det gate (keep/drop) ────────┤
    IMU ──────────────────────────────────────────────────┴→ fusion engine
                                                             → fused pose

Each stage is an independently jitted scan; the composition is a pure
function over array streams, so the whole system replays deterministically
and batches over sequences.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import lie
from ..degeneracy import gate as DG
from ..frontends import lidar as L
from ..frontends import vio as V
from ..graph import smoother as S
from . import engine as E


class VilConfig(NamedTuple):
    vio: V.VioConfig = V.VioConfig()
    lidar: L.LidarOdomConfig = L.LidarOdomConfig()
    gate: DG.GateConfig = DG.GateConfig()
    # Per-sensor noise mirrors the reference's calibration, which trusts
    # the LiDAR stream more (fusion_params.yaml: rovio covariance 0.2,
    # loam covariance 0.1). Long-horizon soaks show fused ATE is
    # insensitive to this ratio (SCALING.md "Multi-minute soak"), so the
    # reference values are kept verbatim for parity.
    fusion: E.FusionConfig = E.FusionConfig(
        sensors=(
            E.SensorSpec(name="vio", optimize_after_odom=True,
                         use_odom_covariance=False,
                         covariance_linear=0.2, covariance_angular=0.2,
                         max_time_skip=0.1),
            E.SensorSpec(name="lidar", optimize_after_odom=False,
                         use_odom_covariance=False,
                         covariance_linear=0.1, covariance_angular=0.1,
                         max_time_skip=0.2),
        ),
    )


class VilResult(NamedTuple):
    fused: E.FusedOutput
    timeline: E.Timeline
    vio_out: V.VioOutput          # stacked (T_v, ·)
    lidar_out: L.LidarOdomResult  # stacked (T_l, ·)
    gate: DG.GateResult           # over lidar sweeps


class PhotoInputs(NamedTuple):
    """Precomputed per-frame inputs for the direct photometric VIO path
    (``VioConfig.use_photometric=True``): the batched outputs of
    frontend.precompute_frames plus the per-frame IMU windows. There is no
    KLT tracking stage — alignment happens inside the iterated EKF update
    (frontends.vio.photometric)."""

    fe_cfg: object                # frontend.FrontendConfig (static)
    pyrs: tuple                   # L × (T, h_l, w_l)
    cand_uv: jnp.ndarray          # (T, C, 2)
    cand_score: jnp.ndarray       # (T, C)
    cand_depth: jnp.ndarray       # (T, C)
    projs: jnp.ndarray            # (T, P_pts, 3)
    imu_windows: tuple            # (accel (T,N,3), gyro (T,N,3), dts (T,N))


def run_vil(
    cfg: VilConfig,
    # IMU stream (for preintegration in the fusion back-end):
    imu_times: jnp.ndarray, imu_accel: jnp.ndarray, imu_gyro: jnp.ndarray,
    # VIO inputs:
    vio_times: np.ndarray, vio_frames: V.VioFrameInput,
    vio_state: V.VioState,
    # LiDAR inputs:
    lidar_times: np.ndarray, sweeps: L.Sweep, lidar_state: L.LidarOdomState,
    lidar_pose_guesses: jnp.ndarray | None = None,
    lidar_guess_from_vio_idx: np.ndarray | None = None,
    # Fusion init:
    engine_state: E.EngineState = None,
    # Model parallelism: a (data, model) mesh → the scan-to-map registration
    # runs sharded over the mesh's model axis (psum-reduced normal equations
    # per GN iteration, parallel.ops.make_sharded_register).
    mesh=None,
    # Direct photometric VIO (cfg.vio.use_photometric): when provided,
    # stage 1 runs frontends.vio.photometric.run over these precomputed
    # frame inputs instead of the geometric KLT+reprojection pipeline.
    photo_inputs: "PhotoInputs | None" = None,
) -> tuple[E.EngineState, VilResult]:
    """Run the full system over one sequence. Front-ends run first (they are
    causal scans); their odometry streams then drive the fusion engine —
    identical information flow to the reference's topic graph.

    LiDAR registration priors come either from ``lidar_pose_guesses`` or
    from the VIO poses at the sweeps' times (``lidar_guess_from_vio_idx``) —
    the reference LOAM's external-prior input (loam_params.yaml
    extPriorAvailable / extOdomFrame vio_imu).

    ``mesh``: pass a jax.sharding.Mesh with a sized "model" axis to spread
    ONE sequence's ICP over multiple chips (`cli run --model-devices N`)."""
    # --- Stage 1: VIO ------------------------------------------------------
    if cfg.vio.use_photometric:
        if photo_inputs is None:
            raise ValueError(
                "cfg.vio.use_photometric=True requires photo_inputs "
                "(fusion.vil.PhotoInputs — see build_photo_inputs_from_bag)")
        from ..frontends.vio import photometric as PH

        ps0 = PH.init_photo(cfg.vio, vio_state)
        _, vio_out = jax.jit(
            lambda ps, py, cu, cs, cd, pr, iw: PH.run(
                cfg.vio, photo_inputs.fe_cfg, ps, py, cu, cs, cd, pr, iw)
        )(ps0, photo_inputs.pyrs, photo_inputs.cand_uv,
          photo_inputs.cand_score, photo_inputs.cand_depth,
          photo_inputs.projs, photo_inputs.imu_windows)
    else:
        _, vio_out = jax.jit(lambda s, f: V.run(cfg.vio, s, f))(
            vio_state, vio_frames)

    # --- Stage 2: LiDAR odometry -------------------------------------------
    register_fn = None
    if mesh is not None:
        from ..parallel import ops as POPS

        register_fn = POPS.make_sharded_register(mesh, cfg.lidar.icp)
    if lidar_guess_from_vio_idx is not None:
        vio_sel = vio_out.pose[jnp.asarray(lidar_guess_from_vio_idx)]
        if cfg.lidar.guess_is_delta:
            # Robust prior: the VIO's RELATIVE motion between consecutive
            # sweep times (its absolute drift cancels); sweep 0 references
            # the VIO initial pose. Requires lidar_state initialized at the
            # same world pose (odometry.init(pose0=...)).
            prev = jnp.concatenate([vio_state.pose[None], vio_sel[:-1]],
                                   axis=0)
            lidar_pose_guesses = jax.vmap(lie.pose_between)(prev, vio_sel)
        else:
            lidar_pose_guesses = vio_sel
    _, lidar_out = jax.jit(
        lambda st, sw, g: L.odometry.run(cfg.lidar, st, sw, g,
                                         register_fn=register_fn)
    )(lidar_state, sweeps, lidar_pose_guesses)

    # --- Stage 3: degeneracy gate on the ICP Hessian -----------------------
    gate_res = DG.logdet_gate(lidar_out.hessian, cfg.gate,
                              n_corr=lidar_out.n_corr)

    # --- Stage 4: fusion ----------------------------------------------------
    dtype = engine_state.smoother.states.poses.dtype
    # Twist covariance channels (the reference's use_odom_covariance source,
    # SensorManagerRos.cpp:154-156): the EKF publishes its own
    # (ekf.twist_covariance); the LiDAR odometry's twist is the pose delta
    # over the sweep period, so its covariance is the registration
    # covariance scaled by 1/Δt².
    lt = np.asarray(lidar_times)
    dt_l = float(np.median(np.diff(lt))) if len(lt) > 1 else 0.1
    lidar_twist = np.asarray(lidar_out.cov) / max(dt_l, 1e-3) ** 2
    tl = E.merge_timeline([
        (np.asarray(vio_times), np.asarray(vio_out.pose),
         np.asarray(vio_out.cov), np.ones(len(vio_times)),
         np.asarray(vio_out.twist_cov)),
        (lt, np.asarray(lidar_out.pose),
         np.asarray(lidar_out.cov), np.asarray(gate_res.keep),
         lidar_twist),
    ])
    tl = jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tl)
    es, fused = jax.jit(
        lambda es, tl: E.run(cfg.fusion, es, tl,
                             imu_times.astype(dtype),
                             imu_accel.astype(dtype),
                             imu_gyro.astype(dtype))
    )(engine_state, tl)

    return es, VilResult(fused=fused, timeline=tl, vio_out=vio_out,
                         lidar_out=lidar_out, gate=gate_res)


def _bag_frame_streams(
    ba,                            # data.ingest.BagArrays
    pose_ic: jnp.ndarray,          # (7,) imu_T_camera
    sweep_stride: int,
    dtype,
):
    """Shared bag→frame-stream prep: per-frame IMU windows and the most
    recent sweep's points moved into the camera frame by the rig extrinsics
    alone (LiDAR at the IMU): the ≤1-sweep-period motion between sweep and
    frame is absorbed by the coarse depth association — the same tolerance
    ROVIO's useDepthFromLiDAR operates under (rovio.cfg:132-138)."""
    from ..data import ingest as IG

    imu_w = IG.imu_windows_from_stream(
        ba.imu_times, ba.imu_accel, ba.imu_gyro, ba.cam_times, dtype=dtype)
    T_l = len(ba.lidar_times)
    sw_idx = np.clip(
        np.searchsorted(ba.lidar_times, ba.cam_times + 1e-9) - 1, 0, None)
    xyz = jnp.asarray(ba.sweeps.xyz)[:, :, ::sweep_stride, :].reshape(
        T_l, -1, 3)[jnp.asarray(sw_idx)]
    msk = jnp.asarray(ba.sweeps.mask)[:, :, ::sweep_stride].reshape(
        T_l, -1)[jnp.asarray(sw_idx)]
    pose_ci = lie.pose_inverse(jnp.asarray(pose_ic, dtype))
    pts_cam = lie.quat_rotate(lie.pose_quat(pose_ci)[None, None], xyz) \
        + lie.pose_trans(pose_ci)[None, None]
    return imu_w, pts_cam.astype(dtype), msk.astype(dtype)


def build_vio_frames_from_bag(
    fe_cfg,
    ba,                            # data.ingest.BagArrays
    pose_ic: jnp.ndarray,          # (7,) imu_T_camera
    num_slots: int,
    sweep_stride: int = 4,
    dtype=jnp.float32,
):
    """Raw bag streams → VioFrameInput via the image tracker frontend."""
    from ..frontends.vio import frontend as F

    imu_w, pts_cam, msk = _bag_frame_streams(ba, pose_ic, sweep_stride, dtype)
    return F.build_frames(
        fe_cfg, jnp.asarray(ba.images, dtype), pts_cam, msk, imu_w, num_slots)


def build_photo_inputs_from_bag(
    fe_cfg,
    ba,                            # data.ingest.BagArrays
    pose_ic: jnp.ndarray,          # (7,) imu_T_camera
    sweep_stride: int = 4,
    dtype=jnp.float32,
) -> PhotoInputs:
    """Raw bag streams → PhotoInputs for the direct photometric pipeline:
    the batched (non-sequential) half of the frontend only — pyramids,
    Shi-Tomasi candidates, projected sweeps, candidate depths — since the
    photometric update subsumes tracking. Reuses build_frames' separately
    compiled batched programs (same TPU compile-shape constraints)."""
    from ..frontends.vio import frontend as F

    imu_w, pts_cam, msk = _bag_frame_streams(ba, pose_ic, sweep_stride, dtype)
    images = jnp.asarray(ba.images, dtype)
    p_pyr, p_cand, _ = F._frontend_programs(fe_cfg, 1)
    pyrs = jax.block_until_ready(p_pyr(images))
    cand_uv, cand_score, cand_depth, projs = jax.block_until_ready(
        p_cand(images, pts_cam, msk))
    return PhotoInputs(fe_cfg=fe_cfg, pyrs=pyrs, cand_uv=cand_uv,
                       cand_score=cand_score, cand_depth=cand_depth,
                       projs=projs, imu_windows=imu_w)


def run_vil_from_bag(
    path,
    cfg: VilConfig = None,
    fe_cfg=None,
    pose_ic: jnp.ndarray | None = None,
    topics: dict | None = None,
    sweep_stride: int = 4,
    dtype=jnp.float32,
    mesh=None,
):
    """Replay a raw-sensor bag through the FULL stack — bag → organized
    sweeps → LiDAR odometry, bag → images → tracker → EKF, degeneracy gate,
    fusion — one call reproducing fusion_carla.launch's job
    (/root/reference/gtsam_fusion/launch/fusion_carla.launch:13-97).

    Returns (engine_state, VilResult, BagArrays)."""
    from ..data import ingest as IG
    from ..frontends.vio import frontend as F

    cfg = cfg or VilConfig()
    if pose_ic is None:
        pose_ic = jnp.asarray(cfg.vio.pose_ic, dtype)
    fe_cfg = fe_cfg or F.FrontendConfig(cam=cfg.vio.cam)
    ba = IG.load_bag(path, dtype=dtype, **(topics or {}))

    photo_inputs = None
    frames = None
    if cfg.vio.use_photometric:
        photo_inputs = build_photo_inputs_from_bag(
            fe_cfg, ba, pose_ic, sweep_stride=sweep_stride, dtype=dtype)
    else:
        frames = build_vio_frames_from_bag(
            fe_cfg, ba, pose_ic, cfg.vio.num_landmarks,
            sweep_stride=sweep_stride, dtype=dtype)

    # Initial state: GT odometry if recorded, else identity at rest (the
    # reference hardcodes identity priors — GraphManager.cpp:20-35).
    if ba.gt_poses is not None and len(ba.gt_poses):
        pose0 = jnp.asarray(ba.gt_poses[0], dtype)
        if len(ba.gt_poses) > 1:
            dt = float(ba.gt_times[1] - ba.gt_times[0])
            vel0 = (jnp.asarray(ba.gt_poses[1, 4:7], dtype)
                    - pose0[4:7]) / max(dt, 1e-6)
        else:
            vel0 = jnp.zeros(3, dtype)
    else:
        pose0 = lie.pose_identity(dtype)
        vel0 = jnp.zeros(3, dtype)

    from ..frontends import vio as V2
    vio_state = V2.init(cfg.vio, pose0, vel0, jnp.zeros(6, dtype))
    lidar_state = L.odometry.init(cfg.lidar, dtype, pose0=pose0)
    guess_idx = np.clip(
        np.searchsorted(ba.cam_times, ba.lidar_times + 1e-9) - 1, 0, None)
    t0 = jnp.asarray(min(float(ba.imu_times[0]),
                         float(ba.cam_times[0])) - 1e-3, dtype)
    es = E.init(cfg.fusion, pose0, vel0, jnp.zeros(6, dtype), t0)

    es, res = run_vil(
        cfg,
        jnp.asarray(ba.imu_times, dtype), jnp.asarray(ba.imu_accel, dtype),
        jnp.asarray(ba.imu_gyro, dtype),
        ba.cam_times, frames, vio_state,
        ba.lidar_times, ba.sweeps, lidar_state,
        lidar_guess_from_vio_idx=guess_idx,
        engine_state=es,
        mesh=mesh,
        photo_inputs=photo_inputs,
    )
    return es, res, ba
