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
    fusion: E.FusionConfig = E.FusionConfig(
        sensors=(
            E.SensorSpec(name="vio", optimize_after_odom=True,
                         use_odom_covariance=False,
                         covariance_linear=0.1, covariance_angular=0.1,
                         max_time_skip=0.1),
            E.SensorSpec(name="lidar", optimize_after_odom=False,
                         use_odom_covariance=False,
                         covariance_linear=0.2, covariance_angular=0.2,
                         max_time_skip=0.2),
        ),
    )


class VilResult(NamedTuple):
    fused: E.FusedOutput
    timeline: E.Timeline
    vio_out: V.VioOutput          # stacked (T_v, ·)
    lidar_out: L.LidarOdomResult  # stacked (T_l, ·)
    gate: DG.GateResult           # over lidar sweeps


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
) -> tuple[E.EngineState, VilResult]:
    """Run the full system over one sequence. Front-ends run first (they are
    causal scans); their odometry streams then drive the fusion engine —
    identical information flow to the reference's topic graph.

    LiDAR registration priors come either from ``lidar_pose_guesses`` or
    from the VIO poses at the sweeps' times (``lidar_guess_from_vio_idx``) —
    the reference LOAM's external-prior input (loam_params.yaml
    extPriorAvailable / extOdomFrame vio_imu)."""
    # --- Stage 1: VIO ------------------------------------------------------
    _, vio_out = jax.jit(lambda s, f: V.run(cfg.vio, s, f))(
        vio_state, vio_frames)

    # --- Stage 2: LiDAR odometry -------------------------------------------
    if lidar_guess_from_vio_idx is not None:
        lidar_pose_guesses = vio_out.pose[jnp.asarray(lidar_guess_from_vio_idx)]
    _, lidar_out = jax.jit(
        lambda st, sw, g: L.odometry.run(cfg.lidar, st, sw, g)
    )(lidar_state, sweeps, lidar_pose_guesses)

    # --- Stage 3: degeneracy gate on the ICP Hessian -----------------------
    gate_res = DG.logdet_gate(lidar_out.hessian, cfg.gate,
                              n_corr=lidar_out.n_corr)

    # --- Stage 4: fusion ----------------------------------------------------
    dtype = engine_state.smoother.states.poses.dtype
    tl = E.merge_timeline([
        (np.asarray(vio_times), np.asarray(vio_out.pose),
         np.asarray(vio_out.cov), np.ones(len(vio_times))),
        (np.asarray(lidar_times), np.asarray(lidar_out.pose),
         np.asarray(lidar_out.cov), np.asarray(gate_res.keep)),
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
