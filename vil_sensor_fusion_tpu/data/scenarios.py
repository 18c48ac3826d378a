"""Full-system synthetic scenarios: one call builds everything a VIL run
needs — IMU stream, VIO feature frames, raycast LiDAR sweeps, ground truth —
from an analytic trajectory through a geometric world.

These replace the Carla sample bags (sample_bags/README.md) as the
deterministic evaluation substrate; the corridor world reproduces the
thesis's labeled degenerate windows (tunnel), the town world its
well-conditioned segments.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..frontends import vio as V
from . import raycast as rc
from . import synthetic as syn


class VilScenario(NamedTuple):
    traj: object
    world: rc.World
    # IMU stream
    imu_times: jnp.ndarray
    imu_accel: jnp.ndarray
    imu_gyro: jnp.ndarray
    # VIO
    vio_times: np.ndarray
    vio_frames: V.VioFrameInput
    # LiDAR
    lidar_times: np.ndarray
    sweeps: object                  # stacked Sweep (T_l, R, A, ·)
    lidar_guess_idx: np.ndarray     # vio frame index per sweep
    # Ground truth at every odometry event time (sorted merge happens later)
    gt_vio_poses: np.ndarray
    gt_lidar_poses: np.ndarray
    # Labeled degenerate time windows [(start_s, end_s), ...] — the
    # DEGEN_TRANS dictionaries of make_prettier_graphs.py:46-120. Empty for
    # well-conditioned scenarios.
    degen_windows: tuple = ()
    # Rendered camera frames (T_v, H, W), kept when vio_from_images so the
    # scenario can be serialized to a raw-sensor bag (write_scenario_bag).
    images: object = None
    # Per-frame sweep points in the camera frame + validity (T_v, P, 3)/(T_v,
    # P) — the tracker frontend's depth-association inputs, kept when
    # vio_from_images so benchmarks can re-run the frontend stage alone.
    cam_points: object = None
    cam_point_valid: object = None


def _corridor_traj(speed: float = 4.0):
    """Straight drive down the corridor (x axis) at sensor height 1.5 m."""
    def pos_fn(t):
        return jnp.stack([speed * t, 0.05 * jnp.sin(0.5 * t), 1.5 + 0.0 * t])

    def rot_fn(t):
        from ..core import lie
        return lie.so3_exp(jnp.stack([0.0 * t, 0.0 * t, 0.01 * jnp.sin(0.3 * t)]))

    return syn.trajectory(pos_fn, rot_fn)


def _spin_traj(yaw_rate: float = 0.5):
    """Rotate in place at the origin (sensor height 1.5 m) — the reference's
    stationary evaluation bag (sample_bags/README.md), with steady yaw to
    exercise rotational observability."""
    def pos_fn(t):
        return jnp.stack([0.0 * t, 0.0 * t, 1.5 + 0.0 * t])

    def rot_fn(t):
        from ..core import lie
        return lie.so3_exp(jnp.stack([0.0 * t, 0.0 * t, yaw_rate * t]))

    return syn.trajectory(pos_fn, rot_fn)


def _town_traj(speed: float = 4.0):
    """Gently curving drive through the box town at sensor height 1.5 m."""
    def pos_fn(t):
        return jnp.stack([speed * t, 2.0 * jnp.sin(0.25 * t), 1.5 + 0.0 * t])

    def rot_fn(t):
        from ..core import lie
        yaw = jnp.arctan2(2.0 * 0.25 * jnp.cos(0.25 * t), speed)
        return lie.so3_exp(jnp.stack([0.0 * t, 0.0 * t, yaw]))

    return syn.trajectory(pos_fn, rot_fn)


def build(
    kind: str = "town",
    duration: float = 4.0,
    vio_hz: float = 20.0,
    lidar_hz: float = 10.0,
    imu_hz: float = 200.0,
    vio_cfg: V.VioConfig | None = None,
    dtype=jnp.float32,
    seed: int = 0,
    imu_accel_noise: float = 0.0,
    imu_gyro_noise: float = 0.0,
    vio_from_images: bool = False,
    frontend_cfg=None,
    sweep_stride: int = 4,
    distort_sweeps: bool = False,
) -> VilScenario:
    """``vio_from_images``: instead of synthetic GT feature tracks, render
    camera frames from the raycast world and run the image-driven tracker
    frontend (Shi-Tomasi + KLT + LiDAR feature depth) to produce the VIO
    frame stream — the full ROVIO-equivalent image path. Requires
    ``vio_cfg.pose_ic`` to be a real camera mounting (e.g.
    frontend.forward_camera_extrinsics()); ``sweep_stride`` decimates sweep
    azimuth for the depth association."""
    if vio_cfg is None:
        vio_cfg = V.VioConfig()
    degen_windows = ()
    drive_speed = 4.0               # for sizing the VIO landmark field
    if kind == "corridor":
        world = rc.corridor_world(width=8.0, height=5.0, dtype=dtype)
        traj = _corridor_traj()
        lm_extent, lm_height = 30.0, (0.5, 4.5)
        degen_windows = ((0.0, duration, "trans"),)
    elif kind == "arena":
        # Rotation-degenerate: spin at the center of a surface-of-revolution
        # arena — yaw unobservable for ICP, translations well-conditioned
        # (the DEGEN_ROT labeled-window case, make_prettier_graphs.py:46-120).
        world = rc.arena_world(radius=9.0, faces=96, dtype=dtype)
        traj = _spin_traj()
        lm_extent, lm_height = 12.0, (0.5, 4.5)
        degen_windows = ((0.0, duration, "rot"),)
        drive_speed = 0.0
    elif kind == "town":
        world = rc.town_world(n_boxes=28, seed=seed, dtype=dtype)
        traj = _town_traj()
        lm_extent, lm_height = 40.0, (0.5, 10.0)
    elif kind == "field":
        # Road drive whose middle third is OPEN FIELD (ground plane only):
        # x/y translation starves quickly, and deep inside the clearing yaw
        # starves too — the reference's plane/open-road bag shape (SanRafael
        # 35-85 s appears in both DEGEN_ROT and DEGEN_TRANS,
        # make_prettier_graphs.py:46-120). Motorcycle-speed drive (the
        # reference ships three motorcycle bags) so a 60 s cell's clearing
        # is long enough to outrun the LiDAR's 120 m range mid-section.
        #
        # The trans and rot labels get DIFFERENT interior margins, because
        # the two degeneracies have different length scales (measured on
        # TPU runs of this scenario): along-road translation collapses as
        # soon as the nearest structure is ~25 m away, but ROTATION
        # information is lever-arm-weighted (λ_yaw ≈ Σ|r×n|² over building
        # points) — portal buildings at 40-120 m still anchor yaw
        # strongly, so only the stretch with ≥ ~110 m of clearance is
        # genuinely rot-degenerate.
        speed = 16.0
        drive_speed = speed
        length = speed * duration
        x0, x1 = length / 3.0, length * 2.0 / 3.0
        world = rc.field_world(x0=x0, x1=x1, length=length, seed=seed,
                               dtype=dtype)
        traj = _town_traj(speed=speed)
        lm_extent, lm_height = 40.0, (0.5, 10.0)
        transit_half = (x1 - x0) / speed / 2.0
        m_trans = min(25.0 / speed, transit_half)
        # Clamped so the rot window is always interior to the trans one,
        # even on short smoke cells where the clearance clamp bites first.
        m_rot = max(m_trans,
                    min(110.0 / speed, max(transit_half - 0.5, 0.0)))
        degen_windows = (
            (x0 / speed + m_trans, x1 / speed - m_trans, "trans"),
            (x0 / speed + m_rot, x1 / speed - m_rot, "rot"),
        )
    elif kind == "tunnel":
        # Town drive that passes through a mid-drive tunnel — the
        # labeled-window bag structure ('Tunnel 25-35 s': a ~10 s tunnel
        # inside a 1:04 bag, make_prettier_graphs.py:46-120). The tunnel
        # segment is CAPPED at 40 m (~10 s at 4 m/s) rather than scaling
        # with duration: a duration-proportional tunnel made the 345 s
        # reference-length cell a 460 m tube — far beyond the sensor's
        # 120 m range for ~80 s, which destroys the scan-to-map voxel map
        # and (measured) diverges LiDAR by ~700 m and poisons fusion with
        # confident-but-wrong post-tunnel increments. No real evaluation
        # bag has that shape; the reference's tunnels are portal-visible
        # scale.
        speed = 4.0
        length = speed * duration
        tunnel_len = min(length / 3.0, 40.0)
        x0 = length / 2.0 - tunnel_len / 2.0
        x1 = length / 2.0 + tunnel_len / 2.0
        # Road base (constant building density along the WHOLE drive, like
        # the field kind): the town base only populates ±60 m of the
        # origin, leaving everything past that bare ground — un-labeled
        # degeneracy that wrecks both the fusion and the ROC ground truth
        # at reference-length durations (see tunnel_world docstring).
        world = rc.tunnel_world(x0=x0, x1=x1, width=8.0, height=5.0,
                                n_boxes=28, seed=seed, road_length=length,
                                dtype=dtype)
        traj = _corridor_traj(speed=speed)
        lm_extent, lm_height = 40.0, (0.5, 10.0)
        # Inside-the-tube times, with half a sweep of margin at each portal —
        # clamped to the transit time so short drives cannot produce an
        # inverted (start > end) window that would mislabel the ROC ground
        # truth.
        margin = min(0.5, (x1 - x0) / speed / 2.0)
        degen_windows = ((x0 / speed + margin, x1 / speed - margin, "trans"),)
    else:
        raise ValueError(kind)

    key = jax.random.PRNGKey(seed)
    imu_t = jnp.arange(int(duration * imu_hz) + 20, dtype=dtype) / imu_hz
    imu = syn.sample_imu(traj, imu_t, accel_noise=imu_accel_noise,
                         gyro_noise=imu_gyro_noise,
                         key=key if imu_accel_noise > 0 else None)

    vio_times = (np.arange(int(duration * vio_hz)) + 1.0) / vio_hz
    poses_gt_vio = np.asarray(
        jax.vmap(traj.pose_fn)(jnp.asarray(vio_times, dtype)))
    imu_w = V.synthetic.imu_windows_for_frames(
        traj, vio_times, imu_hz=imu_hz, dtype=dtype)

    lidar_times = (np.arange(int(duration * lidar_hz)) + 1.0) / lidar_hz
    poses_gt_lidar = np.asarray(
        jax.vmap(traj.pose_fn)(jnp.asarray(lidar_times, dtype)))
    if distort_sweeps:
        # Real spinning-LiDAR capture: each azimuth column cast from the
        # sensor pose at its scan time, recorded uncompensated (what
        # loam_params.yaml scanPeriod/undistortInputCloud corrects).
        poses_start = jnp.asarray(np.asarray(jax.vmap(traj.pose_fn)(
            jnp.asarray(lidar_times - 1.0 / lidar_hz, dtype))), dtype)
        poses_end = jnp.asarray(poses_gt_lidar, dtype)
        sweeps = jax.lax.map(
            lambda pe: rc.raycast_motion(world, pe[0], pe[1]),
            (poses_start, poses_end))
    else:
        sweeps = rc.sweep_series(world, jnp.asarray(poses_gt_lidar, dtype))

    if vio_from_images:
        from ..core import lie
        from ..frontends.vio import frontend as F

        fcfg = frontend_cfg or F.FrontendConfig(cam=vio_cfg.cam)
        pose_ic = jnp.asarray(vio_cfg.pose_ic, dtype)
        poses_v = jnp.asarray(poses_gt_vio, dtype)
        poses_cam = jax.vmap(lambda p: lie.pose_compose(p, pose_ic))(poses_v)
        images = rc.render_camera_series(world, poses_cam, vio_cfg.cam)
        # Most recent sweep per frame (frames before the first sweep use it).
        sw_idx = np.clip(
            np.searchsorted(lidar_times, vio_times + 1e-9) - 1, 0, None)
        sw_xyz = sweeps.xyz[:, :, ::sweep_stride, :].reshape(
            len(lidar_times), -1, 3)[sw_idx]
        sw_msk = sweeps.mask[:, :, ::sweep_stride].reshape(
            len(lidar_times), -1)[sw_idx]
        # Move each sweep into its frame's camera: cam_T_lidar(t, ts) =
        # (world_T_cam_t)⁻¹ ∘ world_T_lidar_ts (GT here; the bag path uses
        # the LiDAR odometry poses instead).
        poses_l = jnp.asarray(poses_gt_lidar, dtype)[jnp.asarray(sw_idx)]
        pose_cl = jax.vmap(
            lambda pc, pl_: lie.pose_compose(lie.pose_inverse(pc), pl_)
        )(poses_cam, poses_l)
        pts_cam = jax.vmap(
            lambda x, q, t: lie.quat_rotate(q[None], x) + t[None]
        )(sw_xyz, lie.pose_quat(pose_cl), lie.pose_trans(pose_cl))
        frames = F.build_frames(
            fcfg, images.astype(dtype), pts_cam.astype(dtype),
            sw_msk.astype(dtype), imu_w, vio_cfg.num_landmarks)
    else:
        # Synthetic GT feature tracks (exact projections, the fast path).
        # The field spans the WHOLE drive (constant landmark density per
        # road meter) so reference-length cells (60-345 s) never starve the
        # tracker — a ±extent blob centered mid-drive only covers ~4 s
        # drives.
        span = drive_speed * duration
        n_lms = max(400, int(400 * (span / (2.0 * lm_extent) + 1.0)))
        lms = V.synthetic.landmark_field(n_lms, seed=seed + 1,
                                         extent=lm_extent,
                                         height=lm_height)
        lms[:, 0] = np.random.default_rng(seed + 3).uniform(
            -lm_extent, span + lm_extent, n_lms)
        frames = V.synthetic.make_frames(
            vio_cfg, poses_gt_vio, imu_w, lms, pixel_noise=0.5,
            depth_noise=0.05, seed=seed + 2)
    frames = jax.tree_util.tree_map(lambda x: x.astype(dtype), frames)
    # Each sweep's prior = the VIO frame at the same time (vio_hz multiple).
    ratio = vio_hz / lidar_hz
    guess_idx = (np.round((np.arange(len(lidar_times)) + 1) * ratio) - 1
                 ).astype(np.int64)

    return VilScenario(
        traj=traj, world=world,
        imu_times=imu.times, imu_accel=imu.accel, imu_gyro=imu.gyro,
        vio_times=vio_times, vio_frames=frames,
        lidar_times=lidar_times, sweeps=sweeps, lidar_guess_idx=guess_idx,
        gt_vio_poses=poses_gt_vio, gt_lidar_poses=poses_gt_lidar,
        degen_windows=degen_windows,
        images=images if vio_from_images else None,
        cam_points=pts_cam if vio_from_images else None,
        cam_point_valid=sw_msk if vio_from_images else None,
    )


def render_frontend_inputs(
    sc: VilScenario,
    cam,
    pose_ic: jnp.ndarray,
    sweep_stride: int = 4,
    dtype=jnp.float32,
):
    """Render the camera stream + per-frame camera-frame sweep points for an
    existing scenario (the ``vio_from_images`` inputs) as a separate,
    device-friendly step — lets benchmarks build the cheap scenario skeleton
    once and do the heavy rendering on the TPU.

    Returns (images (T,H,W), pts_cam (T,P,3), pt_valid (T,P))."""
    from ..core import lie

    poses_v = jnp.asarray(sc.gt_vio_poses, dtype)
    pose_ic = jnp.asarray(pose_ic, dtype)
    poses_cam = jax.vmap(lambda p: lie.pose_compose(p, pose_ic))(poses_v)
    images = rc.render_camera_series(sc.world, poses_cam, cam)
    lidar_times = np.asarray(sc.lidar_times)
    vio_times = np.asarray(sc.vio_times)
    sw_idx = np.clip(
        np.searchsorted(lidar_times, vio_times + 1e-9) - 1, 0, None)
    T_l = len(lidar_times)
    sw_xyz = sc.sweeps.xyz[:, :, ::sweep_stride, :].reshape(
        T_l, -1, 3)[jnp.asarray(sw_idx)]
    sw_msk = sc.sweeps.mask[:, :, ::sweep_stride].reshape(
        T_l, -1)[jnp.asarray(sw_idx)]
    poses_l = jnp.asarray(sc.gt_lidar_poses, dtype)[jnp.asarray(sw_idx)]
    pose_cl = jax.vmap(
        lambda pc, pl_: lie.pose_compose(lie.pose_inverse(pc), pl_)
    )(poses_cam, poses_l)
    pts_cam = jax.vmap(
        lambda x, q, t: lie.quat_rotate(q[None], x) + t[None]
    )(sw_xyz, lie.pose_quat(pose_cl), lie.pose_trans(pose_cl))
    return (images.astype(dtype), pts_cam.astype(dtype),
            sw_msk.astype(dtype))


def write_scenario_bag(
    path,
    sc: VilScenario,
    compression: str = "none",
    imu_topic: str = "/imu/fusion",
    lidar_topic: str = "/lidar",
    camera_topic: str = "/cam_forward/image_raw",
    gt_topic: str = "/gt/odometry",
) -> None:
    """Serialize a scenario to a **raw-sensor** rosbag — the product
    replacement for the Carla recording pipeline
    (carla_tools/launch/carla_ros_bridge.launch records exactly these
    topics). The bag replays through the full stack via
    fusion.run_vil_from_bag / `cli run --bag`.

    Requires a scenario built with ``vio_from_images=True`` (images are the
    raw camera stream)."""
    import numpy as np

    from .rosbag_writer import BagWriter

    if sc.images is None:
        raise ValueError("scenario has no images — build with "
                         "vio_from_images=True")
    with BagWriter(path, compression=compression) as w:
        imu_t = np.asarray(sc.imu_times, float)
        acc = np.asarray(sc.imu_accel, float)
        gyr = np.asarray(sc.imu_gyro, float)
        for i in range(len(imu_t)):
            w.write_msg(imu_topic, "sensor_msgs/Imu", float(imu_t[i]),
                        gyr[i], acc[i])
        xyz = np.asarray(sc.sweeps.xyz, np.float32)
        msk = np.asarray(sc.sweeps.mask) > 0
        for i, t in enumerate(np.asarray(sc.lidar_times, float)):
            pts = xyz[i][msk[i]]
            w.write_msg(lidar_topic, "sensor_msgs/PointCloud2", float(t),
                        pts)
        imgs = np.clip(np.asarray(sc.images), 0, 255).astype(np.uint8)
        for i, t in enumerate(np.asarray(sc.vio_times, float)):
            w.write_msg(camera_topic, "sensor_msgs/Image", float(t),
                        imgs[i])
        for i, t in enumerate(np.asarray(sc.vio_times, float)):
            w.write_msg(gt_topic, "nav_msgs/Odometry", float(t),
                        np.asarray(sc.gt_vio_poses[i], float))
