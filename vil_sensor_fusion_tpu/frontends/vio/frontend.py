"""Image-driven VIO frontend: tracker slot management + LiDAR feature depth.

This is the glue that makes the VIO *image-driven*, matching the reference's
ROVIO capability surface (gtsam_fusion/config/carla/rovio.cfg: multilevel
patch tracking, landmark slots, and `useDepthFromLiDAR true` at :132-138 —
depth for new features comes from projecting the LiDAR sweep into the
camera). The whole frontend is a single ``lax.scan`` over frames:

  image ─→ pyramid ─→ KLT (continue slots) ──┐
  image ─→ Shi-Tomasi detect ─→ replenish ───┼─→ VioFrameInput per frame
  sweep points (camera frame) ─→ depth map ──┘

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
    # LiDAR depth association (useDepthFromLiDAR):
    depth_grid: int = 8            # depth-map cell size in pixels
    depth_search: int = 1          # neighborhood cells searched per query
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
# LiDAR depth map (the useDepthFromLiDAR path)
# ---------------------------------------------------------------------------

def lidar_depth_map(
    cfg: FrontendConfig,
    points_cam: jnp.ndarray,       # (P, 3) sweep points in the camera frame
    point_valid: jnp.ndarray,      # (P,)
) -> jnp.ndarray:
    """Splat sweep points into a coarse (H/g, W/g, 3) grid of
    (depth, u, v): each cell stores its ANGULARLY MOST CENTRAL projected
    point — the depth associated with a feature is that of the LiDAR return
    closest in the image, not the nearest-in-range surface in the cell (a
    min-depth cell systematically under-ranges landmarks: foreground bias
    → monocular-style scale collapse of the whole VIO).

    depth 0 = no point in the cell.

    TPU note: implemented as dense masked reductions over a (cells, P)
    comparison tile rather than a scatter — XLA serializes batched scatters
    on TPU (a vmapped `.at[].min` over 80 frames ran long enough to trip
    device timeouts), while the dense compare is a few VPU-friendly
    reductions. At the default 8-px grid this is ~2k×7k per frame; callers
    at higher camera resolutions should scale ``depth_grid`` to keep the
    angular cell size (and this tile) constant."""
    dtype = points_cam.dtype
    g = cfg.depth_grid
    Hg = cfg.cam.height // g
    Wg = cfg.cam.width // g
    C_cells = Hg * Wg
    uv, ok = C.project(cfg.cam, points_cam)
    z = points_cam[..., 2]
    ok = ok & (point_valid > 0) & (z > 0.1) & (z < cfg.max_depth)
    cu = jnp.clip((uv[..., 0] / g).astype(jnp.int32), 0, Wg - 1)
    cv = jnp.clip((uv[..., 1] / g).astype(jnp.int32), 0, Hg - 1)
    flat = jnp.where(ok, cv * Wg + cu, -1)
    big = jnp.asarray(1e9, dtype)
    cell_ids = jnp.arange(C_cells, dtype=jnp.int32)
    hit = cell_ids[:, None] == flat[None, :]              # (cells, P)
    # Representative point per cell: minimal pixel offset to cell center.
    ctr_u = ((cell_ids % Wg).astype(dtype) + 0.5) * g
    ctr_v = ((cell_ids // Wg).astype(dtype) + 0.5) * g
    off2 = ((uv[None, :, 0] - ctr_u[:, None]) ** 2
            + (uv[None, :, 1] - ctr_v[:, None]) ** 2)
    off2 = jnp.where(hit, off2, big)
    best = jnp.min(off2, axis=1)                          # (cells,)
    sel = off2 <= best[:, None]
    pick = lambda val: jnp.min(jnp.where(sel & hit, val[None, :], big),
                               axis=1)
    depth = pick(z)
    pu = pick(uv[..., 0])
    pv = pick(uv[..., 1])
    empty = best >= big
    grid = jnp.stack([jnp.where(empty, 0.0, depth),
                      jnp.where(empty, 0.0, pu),
                      jnp.where(empty, 0.0, pv)], axis=-1)
    return grid.reshape(Hg, Wg, 3)


def depth_at(cfg: FrontendConfig, depth_map: jnp.ndarray,
             uv: jnp.ndarray) -> jnp.ndarray:
    """Query each pixel's depth: among the (2s+1)² neighboring cells, take
    the stored point CLOSEST IN THE IMAGE to the query (the ROVIO
    useDepthFromLiDAR association). Returns (N,) depths, 0 where none
    available."""
    dtype = depth_map.dtype
    Hg, Wg, _ = depth_map.shape
    g = cfg.depth_grid
    s = cfg.depth_search
    cu = jnp.clip((uv[..., 0] / g).astype(jnp.int32), 0, Wg - 1)
    cv = jnp.clip((uv[..., 1] / g).astype(jnp.int32), 0, Hg - 1)
    big = jnp.asarray(1e12, dtype)
    best_d2 = jnp.full(uv.shape[:-1], big, dtype)
    best = jnp.zeros(uv.shape[:-1], dtype)
    for dv in range(-s, s + 1):
        for du in range(-s, s + 1):
            cell = depth_map[jnp.clip(cv + dv, 0, Hg - 1),
                             jnp.clip(cu + du, 0, Wg - 1)]
            d, pu, pv = cell[..., 0], cell[..., 1], cell[..., 2]
            d2 = (pu - uv[..., 0]) ** 2 + (pv - uv[..., 1]) ** 2
            d2 = jnp.where(d > 0, d2, big)
            take = d2 < best_d2
            best_d2 = jnp.where(take, d2, best_d2)
            best = jnp.where(take, d, best)
    return best


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
    dmap: jnp.ndarray,             # (Hg, Wg, 3) this frame's depth map
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
    obs_depth = depth_at(cfg, dmap, obs_uv) * obs_valid

    # 2. Filter candidates: drop those near live tracks or without depth.
    d2 = jnp.sum(
        (cand_uv[:, None, :] - obs_uv[None, :, :]) ** 2, axis=-1)  # (C, M)
    d2 = jnp.where(obs_valid[None, :] > 0, d2, jnp.inf)
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

    # 3. Rank-match accepted candidates to free slots (static shapes):
    # the r-th accepted candidate fills the r-th free slot.
    free = obs_valid <= 0
    slot_rank = jnp.cumsum(free.astype(jnp.int32)) - 1       # (M,) 0-based
    order = jnp.argsort(~cand_ok, stable=True)               # ok-first
    n_ok = jnp.sum(cand_ok.astype(jnp.int32))
    cand_for_slot = order[jnp.clip(slot_rank, 0, cand_uv.shape[0] - 1)]
    assign = free & (slot_rank < n_ok)

    new_uv = jnp.where(assign[:, None], cand_uv[cand_for_slot],
                       jnp.zeros((M, 2), dtype))
    new_depth = jnp.where(assign, cand_depth[cand_for_slot],
                          jnp.ones((M,), dtype))
    new_enable = assign.astype(dtype)

    uv_next = jnp.where(assign[:, None], new_uv, obs_uv)
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
    dmap = lidar_depth_map(cfg, points_cam, point_valid)
    cand_uv, cand_score = T.detect(
        image, cfg.n_candidates, nms_radius=cfg.nms_radius,
        border=cfg.border)
    cand_depth = depth_at(cfg, dmap, cand_uv)
    return _track_and_assign(cfg, ts, pyr_new, cand_uv, cand_score,
                             cand_depth, dmap)


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
    """Batched Shi-Tomasi detection + LiDAR depth maps + candidate depths
    for all frames: (cand_uv (T,C,2), cand_score (T,C), cand_depth (T,C),
    dmaps (T,Hg,Wg,3))."""
    cand_uv, cand_score = jax.vmap(
        lambda im: T.detect(im, cfg.n_candidates, nms_radius=cfg.nms_radius,
                            border=cfg.border))(images)
    dmaps = jax.vmap(lambda p, v: lidar_depth_map(cfg, p, v))(
        points_cam, point_valid)
    cand_depth = jax.vmap(lambda d, uv: depth_at(cfg, d, uv))(dmaps, cand_uv)
    return cand_uv, cand_score, cand_depth, dmaps


def precompute_frames(
    cfg: FrontendConfig,
    images: jnp.ndarray,           # (T, H, W) grayscale
    points_cam: jnp.ndarray,       # (T, P, 3) sweep points per frame
    point_valid: jnp.ndarray,      # (T, P)
):
    """Phase 1 of the frontend — everything with no sequential dependency,
    batched over all frames: pyramids, Shi-Tomasi detection, LiDAR depth
    maps, candidate depths. Big fused convolutions/top-k on the MXU/VPU.

    NOTE (TPU): compile :func:`pyramids_batch` and :func:`candidates_batch`
    as SEPARATE programs (as :func:`build_frames` does) — fusing all three
    batched producers into one XLA program faults the TPU compiler at real
    frame counts (any two of the three are fine; empirically T ≳ 60).

    Returns (pyramids tuple of (T, h_l, w_l), cand_uv (T,C,2),
    cand_score (T,C), cand_depth (T,C))."""
    pyrs = pyramids_batch(cfg, images)
    cand_uv, cand_score, cand_depth, dmaps = candidates_batch(
        cfg, images, points_cam, point_valid)
    return pyrs, cand_uv, cand_score, cand_depth, dmaps


def track_frames(
    cfg: FrontendConfig,
    pyrs: tuple,
    cand_uv: jnp.ndarray,
    cand_score: jnp.ndarray,
    cand_depth: jnp.ndarray,
    dmaps: jnp.ndarray,
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
        pyr_t, cuv, cscore, cdepth, dmap = x
        return _track_and_assign(cfg, ts, tuple(pyr_t), cuv, cscore,
                                 cdepth, dmap)

    ts1, (obs_uv, obs_valid, obs_depth, new_uv, new_depth, new_enable) = \
        jax.lax.scan(
            body, ts0, (tuple(pyrs), cand_uv, cand_score, cand_depth,
                        dmaps))

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
    cand_uv, cand_score, cand_depth, dmaps = jax.block_until_ready(
        p_cand(images, points_cam, point_valid))
    frames, _ = phase2(pyrs, cand_uv, cand_score, cand_depth, dmaps,
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
    sweep and the image is ≤ one frame interval and handled by the coarse
    depth grid)."""
    from ...core import lie

    pts = sweep_xyz.reshape(-1, 3)
    mask = sweep_mask.reshape(-1)
    pts_c = lie.quat_rotate(lie.pose_quat(pose_cl)[None], pts) \
        + lie.pose_trans(pose_cl)[None]
    return pts_c, mask
