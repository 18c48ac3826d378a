"""Image-driven VIO frontend: tracker slot management + LiDAR feature depth.

This is the glue that makes the VIO *image-driven*, matching the reference's
ROVIO capability surface (gtsam_fusion/config/carla/rovio.cfg: multilevel
patch tracking, landmark slots, and `useDepthFromLiDAR true` at :132-138 —
depth for new features comes from projecting the LiDAR sweep into the
camera). The whole frontend is a single ``lax.scan`` over frames:

  image ─→ pyramid ─→ KLT (continue slots) ──┐
  image ─→ Shi-Tomasi detect ─→ replenish ───┼─→ VioFrameInput per frame
  sweep points (camera frame) ─→ projected depths ┘

Slot management is static-shape: M landmark slots, C detection candidates,
rank-matching assignment of candidates to free slots (no host loops — the
frontend jits and scans on-device).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import camera as C
from . import ekf as E
from . import tracker as T
from .pipeline import VioFrameInput


class FrontendConfig(NamedTuple):
    cam: C.Camera = C.carla_camera()
    pyramid_levels: int = 3
    klt_radius: int = 4
    klt_iters: int = 8
    klt_max_error: float = 12.0
    n_candidates: int = 64         # detection candidates per frame
    min_score: float = 1.0         # Shi-Tomasi acceptance threshold
    min_dist: float = 16.0         # min pixel distance to a live track
    nms_radius: int = 8
    border: int = 12
    # LiDAR depth association (useDepthFromLiDAR): a feature's depth is
    # that of the projected LiDAR return closest in the image, within this
    # pixel radius.
    depth_radius_px: float = 12.0
    max_depth: float = 120.0


class TrackerState(NamedTuple):
    pyr: tuple                     # previous frame's pyramid (L arrays)
    uv: jnp.ndarray                # (M, 2) current track positions
    valid: jnp.ndarray             # (M,)


def init_tracker(cfg: FrontendConfig, num_slots: int,
                 dtype=jnp.float32) -> TrackerState:
    H, W = cfg.cam.height, cfg.cam.width
    pyr = []
    h, w = H, W
    for _ in range(cfg.pyramid_levels):
        pyr.append(jnp.zeros((h, w), dtype))
        h, w = h // 2, w // 2
    return TrackerState(
        pyr=tuple(pyr),
        uv=jnp.zeros((num_slots, 2), dtype),
        valid=jnp.zeros((num_slots,), dtype),
    )


# ---------------------------------------------------------------------------
# LiDAR feature depth (the useDepthFromLiDAR path)
# ---------------------------------------------------------------------------

def project_sweep(
    cfg: FrontendConfig,
    points_cam: jnp.ndarray,       # (P, 3) sweep points in the camera frame
    point_valid: jnp.ndarray,      # (P,)
) -> jnp.ndarray:
    """Project the sweep into the image once: (P, 3) rows of (u, v, z),
    z = 0 marking returns that miss the image / range gates. This is the
    per-frame precomputation behind :func:`depth_at`'s nearest-in-image
    association (ROVIO's useDepthFromLiDAR, rovio.cfg:133-138).

    TPU note (design history): an earlier grid-based variant splatted the
    points into (H/8, W/8) cells via a dense (cells, P) comparison tile —
    ~8 passes over 54 M elements per 800×600 frame, which dominated the
    whole detection stage (517 ms of a 3.7 s batched pass). Direct
    association against the projected points needs only a
    (queries≈88, P≈7200) tile per frame — ~85× less work — and removes
    the cell-quantization bias entirely: every query sees the truly
    nearest return, not its cell's representative."""
    uv, ok = C.project(cfg.cam, points_cam)
    z = points_cam[..., 2]
    ok = ok & (point_valid > 0) & (z > 0.1) & (z < cfg.max_depth)
    zed = jnp.where(ok, z, 0.0)
    return jnp.stack([uv[..., 0], uv[..., 1], zed], axis=-1)


def depth_at(cfg: FrontendConfig, proj: jnp.ndarray,
             uv: jnp.ndarray) -> jnp.ndarray:
    """Depth at each query pixel: the projected LiDAR return CLOSEST IN
    THE IMAGE within ``depth_radius_px`` (the ROVIO useDepthFromLiDAR
    association — image proximity, NOT min-depth-in-window, which would
    foreground-bias landmark ranges into monocular-style scale collapse).
    ``proj`` is :func:`project_sweep`'s (P, 3) output. Returns (N,)
    depths, 0 where no return is near enough."""
    d2 = ((proj[None, :, 0] - uv[..., 0, None]) ** 2
          + (proj[None, :, 1] - uv[..., 1, None]) ** 2)     # (N, P)
    big = jnp.asarray(1e12, proj.dtype)
    d2 = jnp.where(proj[None, :, 2] > 0, d2, big)
    best = jnp.min(d2, axis=-1)
    sel = d2 <= best[..., None]
    # Lowest-index tie-break via masked min over z (depths are positive).
    z = jnp.min(jnp.where(sel, proj[None, :, 2], big), axis=-1)
    return jnp.where(best <= cfg.depth_radius_px ** 2, z, 0.0)


def assign_candidates(
    cfg: FrontendConfig,
    live_uv: jnp.ndarray,          # (M, 2) live feature positions
    live_valid: jnp.ndarray,       # (M,)
    cand_uv: jnp.ndarray,          # (C, 2) detection candidates
    cand_score: jnp.ndarray,       # (C,)
    cand_depth: jnp.ndarray,       # (C,) LiDAR depth per candidate (0 = none)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Filter candidates against live features and rank-match survivors to
    free slots (static shapes; shared by the KLT and photometric
    pipelines). Returns (new_uv (M, 2), new_depth (M,), new_enable (M,))."""
    dtype = live_uv.dtype
    M = live_uv.shape[0]

    # Drop candidates near live features or without depth.
    d2 = jnp.sum(
        (cand_uv[:, None, :] - live_uv[None, :, :]) ** 2, axis=-1)  # (C, M)
    d2 = jnp.where(live_valid[None, :] > 0, d2, jnp.inf)
    far = jnp.min(d2, axis=-1) > cfg.min_dist ** 2
    cand_ok = (far & (cand_score > cfg.min_score) & (cand_depth > 0))

    # Also keep candidates apart from each other: suppress a candidate that
    # is within min_dist of a better (earlier-ranked) accepted candidate.
    cd2 = jnp.sum((cand_uv[:, None, :] - cand_uv[None, :, :]) ** 2, axis=-1)
    earlier = (jnp.arange(cand_uv.shape[0])[None, :]
               < jnp.arange(cand_uv.shape[0])[:, None])
    clash = jnp.any(
        (cd2 < cfg.min_dist ** 2) & earlier & cand_ok[None, :], axis=-1)
    cand_ok = cand_ok & ~clash

    # Rank-match accepted candidates to free slots (static shapes):
    # the r-th accepted candidate fills the r-th free slot.
    free = live_valid <= 0
    slot_rank = jnp.cumsum(free.astype(jnp.int32)) - 1       # (M,) 0-based
    order = jnp.argsort(~cand_ok, stable=True)               # ok-first
    n_ok = jnp.sum(cand_ok.astype(jnp.int32))
    cand_for_slot = order[jnp.clip(slot_rank, 0, cand_uv.shape[0] - 1)]
    assign = free & (slot_rank < n_ok)

    new_uv = jnp.where(assign[:, None], cand_uv[cand_for_slot],
                       jnp.zeros((M, 2), dtype))
    new_depth = jnp.where(assign, cand_depth[cand_for_slot],
                          jnp.ones((M,), dtype))
    return new_uv, new_depth, assign.astype(dtype)


# ---------------------------------------------------------------------------
# Per-frame step
# ---------------------------------------------------------------------------

def _track_and_assign(
    cfg: FrontendConfig,
    ts: TrackerState,
    pyr_new: tuple,                # this frame's pyramid
    cand_uv: jnp.ndarray,          # (C, 2) detection candidates
    cand_score: jnp.ndarray,       # (C,)
    cand_depth: jnp.ndarray,       # (C,) LiDAR depth per candidate (0 = none)
    proj: jnp.ndarray,             # (P, 3) this frame's projected sweep
) -> tuple[TrackerState, tuple]:
    """The sequential core of one frontend step: continue tracks via KLT,
    query each continued track's LiDAR depth (the EKF's continuous scale
    anchor), and fill freed slots from the (precomputed) candidate set."""
    dtype = ts.uv.dtype
    M = ts.uv.shape[0]

    # 1. Continue existing tracks.
    obs_uv, obs_valid = T.klt_track(
        list(ts.pyr), list(pyr_new), ts.uv, ts.valid,
        radius=cfg.klt_radius, iters=cfg.klt_iters,
        max_error=cfg.klt_max_error)
    obs_valid = obs_valid * ts.valid   # dead slots stay dead through KLT
    obs_depth = depth_at(cfg, proj, obs_uv) * obs_valid

    # 2-3. Fill freed slots from the candidate pool.
    new_uv, new_depth, new_enable = assign_candidates(
        cfg, obs_uv, obs_valid, cand_uv, cand_score, cand_depth)

    uv_next = jnp.where(new_enable[:, None] > 0, new_uv, obs_uv)
    valid_next = jnp.maximum(obs_valid, new_enable)
    return (
        TrackerState(pyr=pyr_new, uv=uv_next, valid=valid_next),
        (obs_uv, obs_valid, obs_depth, new_uv, new_depth, new_enable),
    )


def frontend_step(
    cfg: FrontendConfig,
    ts: TrackerState,
    image: jnp.ndarray,            # (H, W) grayscale
    points_cam: jnp.ndarray,       # (P, 3) latest sweep in this camera frame
    point_valid: jnp.ndarray,      # (P,)
) -> tuple[TrackerState, tuple]:
    """Track + replenish one frame. Returns the per-frame observation
    block (obs_uv, obs_valid, new_uv, new_depth, new_enable)."""
    pyr_new = tuple(T.pyramid(image, cfg.pyramid_levels))
    proj = project_sweep(cfg, points_cam, point_valid)
    cand_uv, cand_score = T.detect(
        image, cfg.n_candidates, nms_radius=cfg.nms_radius,
        border=cfg.border)
    cand_depth = depth_at(cfg, proj, cand_uv)
    return _track_and_assign(cfg, ts, pyr_new, cand_uv, cand_score,
                             cand_depth, proj)


def pyramids_batch(cfg: FrontendConfig, images: jnp.ndarray):
    """Batched pyramids for all frames: tuple of (T, h_l, w_l)."""
    return jax.vmap(lambda im: tuple(T.pyramid(im, cfg.pyramid_levels)))(
        images)


def candidates_batch(
    cfg: FrontendConfig,
    images: jnp.ndarray,           # (T, H, W)
    points_cam: jnp.ndarray,       # (T, P, 3)
    point_valid: jnp.ndarray,      # (T, P)
):
    """Batched Shi-Tomasi detection + projected sweeps + candidate depths
    for all frames: (cand_uv (T,C,2), cand_score (T,C), cand_depth (T,C),
    projs (T,P,3))."""
    cand_uv, cand_score = jax.vmap(
        lambda im: T.detect(im, cfg.n_candidates, nms_radius=cfg.nms_radius,
                            border=cfg.border))(images)
    projs = jax.vmap(lambda p, v: project_sweep(cfg, p, v))(
        points_cam, point_valid)
    cand_depth = jax.vmap(lambda pr, uv: depth_at(cfg, pr, uv))(projs,
                                                                cand_uv)
    return cand_uv, cand_score, cand_depth, projs


def precompute_frames(
    cfg: FrontendConfig,
    images: jnp.ndarray,           # (T, H, W) grayscale
    points_cam: jnp.ndarray,       # (T, P, 3) sweep points per frame
    point_valid: jnp.ndarray,      # (T, P)
):
    """Phase 1 of the frontend — everything with no sequential dependency,
    batched over all frames: pyramids, Shi-Tomasi detection, projected
    sweeps, candidate depths. Big fused convolutions/top-k on the MXU/VPU.

    NOTE (TPU): compile :func:`pyramids_batch` and :func:`candidates_batch`
    as SEPARATE programs (as :func:`build_frames` does) — fusing all three
    batched producers into one XLA program faults the TPU compiler at real
    frame counts (any two of the three are fine; empirically T ≳ 60).

    Returns (pyramids tuple of (T, h_l, w_l), cand_uv (T,C,2),
    cand_score (T,C), cand_depth (T,C))."""
    pyrs = pyramids_batch(cfg, images)
    cand_uv, cand_score, cand_depth, projs = candidates_batch(
        cfg, images, points_cam, point_valid)
    return pyrs, cand_uv, cand_score, cand_depth, projs


def track_frames(
    cfg: FrontendConfig,
    pyrs: tuple,
    cand_uv: jnp.ndarray,
    cand_score: jnp.ndarray,
    cand_depth: jnp.ndarray,
    projs: jnp.ndarray,
    imu_windows: tuple,
    num_slots: int,
    ts0: TrackerState | None = None,
) -> tuple[VioFrameInput, TrackerState]:
    """Phase 2 of the frontend — the inherently sequential part: KLT from
    frame t−1 plus slot replenishment, as one ``lax.scan`` carrying the
    previous frame's pyramid. ``ts0`` continues a previous chunk's tracker
    (streaming/soak runs); returns the final state for the next chunk."""
    dtype = pyrs[0].dtype
    if ts0 is None:
        ts0 = init_tracker(cfg, num_slots, dtype)

    def body(ts, x):
        pyr_t, cuv, cscore, cdepth, proj = x
        return _track_and_assign(cfg, ts, tuple(pyr_t), cuv, cscore,
                                 cdepth, proj)

    ts1, (obs_uv, obs_valid, obs_depth, new_uv, new_depth, new_enable) = \
        jax.lax.scan(
            body, ts0, (tuple(pyrs), cand_uv, cand_score, cand_depth,
                        projs))

    accel, gyro, dts = imu_windows
    return VioFrameInput(
        accel=jnp.asarray(accel, dtype), gyro=jnp.asarray(gyro, dtype),
        dts=jnp.asarray(dts, dtype),
        obs_uv=obs_uv, obs_valid=obs_valid, obs_depth=obs_depth,
        new_uv=new_uv, new_depth=new_depth, new_enable=new_enable,
    ), ts1


def build_frames(
    cfg: FrontendConfig,
    images: jnp.ndarray,           # (T, H, W) grayscale
    points_cam: jnp.ndarray,       # (T, P, 3) sweep points per frame (cam frame)
    point_valid: jnp.ndarray,      # (T, P)
    imu_windows: tuple,            # (accel (T,N,3), gyro (T,N,3), dts (T,N))
    num_slots: int,
) -> VioFrameInput:
    """Scan the tracker over an image sequence → the full VioFrameInput
    stream the EKF consumes — the image-driven replacement for
    synthetic.make_frames.

    Structured as THREE separately compiled programs — batched pyramids,
    batched detection+depth, and the sequential KLT/slot scan: fusing all
    the batched producers (or producers into the scan consumer) in one XLA
    program reliably faults the TPU compiler at real frame counts
    (empirically T ≳ 60), and the split also guarantees the batched phase
    runs as the big parallel kernels it was written to be."""
    p_pyr, p_cand, phase2 = _frontend_programs(cfg, num_slots)
    # Block between programs: compiling/launching the next program while the
    # previous executes faults the axon-tunnel TPU runtime (µs-level cost on
    # this host-orchestrated path).
    pyrs = jax.block_until_ready(p_pyr(images))
    cand_uv, cand_score, cand_depth, projs = jax.block_until_ready(
        p_cand(images, points_cam, point_valid))
    frames, _ = phase2(pyrs, cand_uv, cand_score, cand_depth, projs,
                       imu_windows)
    return frames


@functools.lru_cache(maxsize=16)
def _frontend_programs(cfg: FrontendConfig, num_slots: int):
    """Cached jitted phases per (config, slots) — fresh jit wrappers every
    call would re-trace the T-length scan each time (~seconds)."""
    p_pyr = jax.jit(lambda im: pyramids_batch(cfg, im))
    p_cand = jax.jit(lambda im, p, v: candidates_batch(cfg, im, p, v))
    phase2 = jax.jit(
        lambda py, cu, cs, cd, dm, iw: track_frames(
            cfg, py, cu, cs, cd, dm, iw, num_slots))
    return p_pyr, p_cand, phase2


def forward_camera_extrinsics(dtype=jnp.float32) -> jnp.ndarray:
    """imu_T_camera for a forward-looking camera on an x-forward/z-up IMU:
    camera z → IMU x, camera x → IMU −y, camera y → IMU −z (the standard
    optical-in-body mounting, same frame relationship as the reference rig's
    front camera — carla_to_ros_transforms.py:28-48 conventions)."""
    from ...core import lie

    R_ic = jnp.array([[0.0, 0.0, 1.0],
                      [-1.0, 0.0, 0.0],
                      [0.0, -1.0, 0.0]], dtype)
    return jnp.concatenate([lie.rot_to_quat(R_ic), jnp.zeros(3, dtype)])


def sweep_to_camera(
    sweep_xyz: jnp.ndarray,        # (..., 3) points in the LiDAR sensor frame
    sweep_mask: jnp.ndarray,       # (...)
    pose_cl: jnp.ndarray,          # (7,) camera_T_lidar extrinsics
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Flatten a sweep and move it into the camera frame (the extrinsic
    part of the useDepthFromLiDAR association; per-frame motion between the
    sweep and the image is ≤ one frame interval, within the association
    radius)."""
    from ...core import lie

    pts = sweep_xyz.reshape(-1, 3)
    mask = sweep_mask.reshape(-1)
    pts_c = lie.quat_rotate(lie.pose_quat(pose_cl)[None], pts) \
        + lie.pose_trans(pose_cl)[None]
    return pts_c, mask
