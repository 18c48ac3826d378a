"""Analytic LiDAR simulation: raycast simple geometric worlds.

The reference gets LiDAR data from Carla's simulated VLP-16 (300 k pts/s,
16 ch, 120 m — carla_tools/config/sensors.json). For deterministic tests and
benchmarks we raycast closed-form worlds instead: planes and axis-aligned
boxes. Two presets mirror the thesis's evaluation scenarios
(make_prettier_graphs.py:46-120 labeled windows):

- :func:`corridor_world` — two parallel walls + ground: translation along
  the corridor is unobservable for ICP (the 'Tunnel' degenerate case).
- :func:`town_world` — ground + random boxes (buildings): well-conditioned.

Raycasting the full (16, 1800) VLP-16 grid against ~40 primitives is a tiny
vectorized computation — each sweep is exact, with no simulator noise floor.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..frontends.lidar.rangeimage import (
    AZIMUTH, RINGS, Sweep, VLP16_ELEVATIONS_DEG)


class World(NamedTuple):
    """Planes: n·x + d = 0 with n unit; boxes: AABBs."""

    plane_n: jnp.ndarray     # (P, 3)
    plane_d: jnp.ndarray     # (P,)
    box_min: jnp.ndarray     # (B, 3)
    box_max: jnp.ndarray     # (B, 3)


def corridor_world(width: float = 8.0, height: float = 5.0,
                   dtype=jnp.float32) -> World:
    """Ground plane + two walls along the x axis + ceiling (a tunnel)."""
    n = jnp.array([
        [0.0, 0.0, 1.0],     # ground z = 0 (sensor assumed above)
        [0.0, 1.0, 0.0],     # wall y = -width/2
        [0.0, -1.0, 0.0],    # wall y = +width/2
        [0.0, 0.0, -1.0],    # ceiling z = height
    ], dtype)
    d = jnp.array([0.0, width / 2.0, width / 2.0, height], dtype)
    zero = jnp.zeros((0, 3), dtype)
    return World(plane_n=n, plane_d=d, box_min=zero, box_max=zero)


def town_world(n_boxes: int = 24, seed: int = 0, extent: float = 60.0,
               dtype=jnp.float32) -> World:
    """Ground plane + random 'buildings' scattered around the origin,
    cleared of a central street so trajectories don't collide."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    centers = jax.random.uniform(
        k1, (n_boxes, 2), dtype, -extent, extent)
    # Push boxes off the central corridor (|y| >= 8).
    cy = jnp.where(jnp.abs(centers[:, 1]) < 8.0,
                   jnp.sign(centers[:, 1] + 1e-3) * 8.0 + centers[:, 1],
                   centers[:, 1])
    centers = jnp.stack([centers[:, 0], cy], axis=-1)
    sizes = jax.random.uniform(k2, (n_boxes, 2), dtype, 2.0, 8.0)
    heights = jax.random.uniform(k3, (n_boxes,), dtype, 3.0, 12.0)
    bmin = jnp.concatenate(
        [centers - sizes / 2, jnp.zeros((n_boxes, 1), dtype)], axis=-1)
    bmax = jnp.concatenate(
        [centers + sizes / 2, heights[:, None]], axis=-1)
    n = jnp.array([[0.0, 0.0, 1.0]], dtype)
    d = jnp.array([0.0], dtype)
    return World(plane_n=n, plane_d=d, box_min=bmin, box_max=bmax)


def road_world(length: float = 240.0, n_boxes: int | None = None,
               seed: int = 0, lane_half_width: float = 8.0,
               max_offset: float = 45.0, dtype=jnp.float32) -> World:
    """Ground plane + 'buildings' lining a road along +x from 0 to
    ``length`` — the long-drive world for multi-minute soak runs (the
    reference's 5:45 Town01 bags drive kilometers of continuous street,
    sample_bags/README.md). Box density per road-meter is constant, so the
    sensors see town-like geometry for the whole drive."""
    if n_boxes is None:
        n_boxes = max(32, int(length / 2.5))
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cx = jax.random.uniform(k1, (n_boxes,), dtype, -20.0, length + 20.0)
    side = jnp.where(jax.random.bernoulli(k4, 0.5, (n_boxes,)), 1.0, -1.0)
    cy = side * jax.random.uniform(
        k2, (n_boxes,), dtype, lane_half_width, max_offset)
    centers = jnp.stack([cx, cy], axis=-1)
    sizes = jax.random.uniform(k3, (n_boxes, 2), dtype, 2.0, 8.0)
    heights = jax.random.uniform(
        jax.random.fold_in(k3, 1), (n_boxes,), dtype, 3.0, 12.0)
    bmin = jnp.concatenate(
        [centers - sizes / 2, jnp.zeros((n_boxes, 1), dtype)], axis=-1)
    bmax = jnp.concatenate(
        [centers + sizes / 2, heights[:, None]], axis=-1)
    n = jnp.array([[0.0, 0.0, 1.0]], dtype)
    d = jnp.array([0.0], dtype)
    return World(plane_n=n, plane_d=d, box_min=bmin, box_max=bmax)


def field_world(x0: float, x1: float, length: float, seed: int = 0,
                dtype=jnp.float32) -> World:
    """Road-lined drive with an OPEN FIELD spanning x ∈ [x0, x1]: buildings
    along the road outside, bare ground plane inside. Driving through
    produces well-conditioned → degenerate → well-conditioned, where the
    degenerate section starves BOTH yaw and x/y translation (the ground
    plane constrains only z/roll/pitch) — the structure of the reference's
    plane/open-road bags, which are labeled rot AND trans degenerate
    (SanRafael 35-85 s appears in both DEGEN_ROT and DEGEN_TRANS,
    make_prettier_graphs.py:46-120)."""
    import numpy as np
    base = road_world(length=length, seed=seed, dtype=dtype)
    bmin = np.asarray(base.box_min).copy()
    bmax = np.asarray(base.box_max).copy()
    bad = (bmax[:, 0] > x0) & (bmin[:, 0] < x1)
    # Keep static shapes: sink intruding buildings far below ground.
    bmin[bad, 2] = -100.0
    bmax[bad, 2] = -99.0
    return World(plane_n=base.plane_n, plane_d=base.plane_d,
                 box_min=jnp.asarray(bmin, dtype),
                 box_max=jnp.asarray(bmax, dtype))


def arena_world(radius: float = 9.0, faces: int = 96,
                dtype=jnp.float32) -> World:
    """Ground plane + a near-circular wall (``faces``-gon prism) around the
    origin — a surface of revolution about the z axis. For a sensor at the
    arena center, rotation about z (yaw) moves every wall point tangentially
    to its own surface, so the ICP Hessian's yaw direction collapses while
    all three translations stay strongly constrained (wall distance in x/y,
    ground in z): the *rotation-degenerate* counterpart of the corridor,
    isolating the rot half of the thesis gate
    (degerate_odometry_filter.cpp:32-45 rot_degen_threshold). With 96 faces
    the dihedral angle is ~3.75°, below the corner-curvature threshold, so
    the wall reads as smooth."""
    th = jnp.arange(faces, dtype=dtype) / faces * 2 * jnp.pi
    # Inward normals; wall plane: n·x + d = 0 with d = radius.
    n_wall = jnp.stack([-jnp.cos(th), -jnp.sin(th),
                        jnp.zeros_like(th)], axis=-1)
    n = jnp.concatenate([jnp.array([[0.0, 0.0, 1.0]], dtype), n_wall])
    d = jnp.concatenate([jnp.zeros((1,), dtype),
                         jnp.full((faces,), radius, dtype)])
    zero = jnp.zeros((0, 3), dtype)
    return World(plane_n=n, plane_d=d, box_min=zero, box_max=zero)


def tunnel_world(x0: float = 20.0, x1: float = 44.0, width: float = 8.0,
                 height: float = 5.0, n_boxes: int = 24, seed: int = 0,
                 extent: float = 60.0, road_length: float | None = None,
                 dtype=jnp.float32) -> World:
    """Town with a tunnel spanning x ∈ [x0, x1]: buildings outside, two long
    walls (thin boxes) + ceiling slab inside. Driving through produces a
    well-conditioned → degenerate → well-conditioned sequence — the bag
    structure behind the thesis's labeled windows ('Tunnel 25-35 s',
    make_prettier_graphs.py:46-120).

    ``road_length``: build on :func:`road_world` of that length instead of
    the ±``extent`` town — REQUIRED for reference-length drives: the town
    base scatters its buildings around the ORIGIN only, so any drive past
    x ≈ extent continues over bare ground plane — un-labeled but genuinely
    trans-degenerate, which both diverges the LiDAR and scrambles the ROC
    ground truth (measured: a 345 s drive on the town base gated out 91 %
    of its sweeps and drifted 200 m)."""
    if road_length is not None:
        base = road_world(length=road_length, seed=seed, dtype=dtype)
    else:
        base = town_world(n_boxes=n_boxes, seed=seed, extent=extent,
                          dtype=dtype)
    # Drop buildings that intrude into the tunnel's x-range (keep static
    # shapes by moving them far below ground instead of filtering).
    import numpy as np
    bmin = np.asarray(base.box_min).copy()
    bmax = np.asarray(base.box_max).copy()
    bad = (bmax[:, 0] > x0 - 4.0) & (bmin[:, 0] < x1 + 4.0)
    bmin[bad, 2] = -100.0
    bmax[bad, 2] = -99.0
    t = 0.5  # wall thickness
    walls = np.array([
        # left wall  y = -width/2
        [[x0, -width / 2 - t, 0.0], [x1, -width / 2, height]],
        # right wall y = +width/2
        [[x0, width / 2, 0.0], [x1, width / 2 + t, height]],
        # ceiling slab
        [[x0, -width / 2 - t, height], [x1, width / 2 + t, height + t]],
    ], dtype=np.float64)
    bmin = np.concatenate([bmin, walls[:, 0]], axis=0)
    bmax = np.concatenate([bmax, walls[:, 1]], axis=0)
    return World(plane_n=base.plane_n, plane_d=base.plane_d,
                 box_min=jnp.asarray(bmin, dtype),
                 box_max=jnp.asarray(bmax, dtype))


def cast(
    world: World,
    origin: jnp.ndarray,        # (3,) world-frame ray origin
    dirs: jnp.ndarray,          # (..., 3) world-frame unit directions
    min_range: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Core raycast: nearest hit distance t (inf = miss) and the surface
    normal at the hit (oriented against the ray). Shared by the LiDAR sweep
    raycaster and the camera renderer."""
    dtype = dirs.dtype
    o = origin
    inf = jnp.asarray(jnp.inf, dtype)
    batch = dirs.shape[:-1]

    # Planes: t = -(n·o + d) / (n·dir)
    if world.plane_n.shape[0]:
        num = -(world.plane_n @ o + world.plane_d)               # (P,)
        den = jnp.einsum("pk,...k->...p", world.plane_n, dirs)   # (..., P)
        t_pl = num / jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
        t_pl = jnp.where((t_pl > min_range) & (den != 0), t_pl, inf)
        i_pl = jnp.argmin(t_pl, axis=-1)                         # (...,)
        t_plane = jnp.take_along_axis(t_pl, i_pl[..., None], -1)[..., 0]
        n_plane = world.plane_n[i_pl]                            # (..., 3)
        # Orient against the ray.
        s = -jnp.sign(jnp.einsum("...k,...k->...", n_plane, dirs))
        n_plane = n_plane * s[..., None]
    else:
        t_plane = jnp.full(batch, jnp.inf, dtype)
        n_plane = jnp.zeros(batch + (3,), dtype)

    # Boxes: slab method; the entered face's axis is the arg-max slab.
    if world.box_min.shape[0]:
        safe = jnp.where(jnp.abs(dirs) < 1e-9, 1e-9, dirs)
        t1 = (world.box_min - o) / safe[..., None, :]            # (..., B, 3)
        t2 = (world.box_max - o) / safe[..., None, :]
        tlo = jnp.minimum(t1, t2)
        thi = jnp.maximum(t1, t2)
        tmin = jnp.max(tlo, axis=-1)                             # (..., B)
        tmax = jnp.min(thi, axis=-1)
        hit = (tmax >= tmin) & (tmin > min_range)
        t_bx = jnp.where(hit, tmin, inf)
        i_bx = jnp.argmin(t_bx, axis=-1)                         # (...,)
        t_box = jnp.take_along_axis(t_bx, i_bx[..., None], -1)[..., 0]
        # Face axis of the winning box = argmax slab entry.
        tlo_w = jnp.take_along_axis(
            tlo, i_bx[..., None, None], -2)[..., 0, :]           # (..., 3)
        axis = jnp.argmax(tlo_w, axis=-1)                        # (...,)
        n_box = jax.nn.one_hot(axis, 3, dtype=dtype)
        n_box = n_box * -jnp.sign(
            jnp.take_along_axis(dirs, axis[..., None], -1))
    else:
        t_box = jnp.full(batch, jnp.inf, dtype)
        n_box = jnp.zeros(batch + (3,), dtype)

    use_box = t_box < t_plane
    t = jnp.where(use_box, t_box, t_plane)
    n = jnp.where(use_box[..., None], n_box, n_plane)
    return t, n


def _procedural_intensity(p_world: jnp.ndarray, normal: jnp.ndarray,
                          dtype) -> jnp.ndarray:
    """World-anchored multi-scale texture + diffuse shading: gives every
    surface dense, geometrically consistent image gradients so corner
    detection and KLT have something to lock onto — the role Carla's textured
    meshes play for ROVIO in the reference rig (sensors.json front camera)."""
    x, y, z = p_world[..., 0], p_world[..., 1], p_world[..., 2]
    tex = (jnp.sin(2.1 * x + 0.7) * jnp.sin(1.7 * y + 1.3)
           + 0.6 * jnp.sin(5.3 * x + 2.9 * z + 0.5)
           * jnp.sin(4.1 * y - 1.9 * z)
           + 0.35 * jnp.sin(11.7 * y + 7.1 * z + 2.0)
           * jnp.sin(9.3 * x - 6.7 * z))
    sun = jnp.asarray([0.40824829, 0.40824829, -0.81649658], dtype)
    light = jnp.clip(-jnp.einsum("...k,k->...", normal, sun), 0.0, 1.0)
    return jnp.clip(0.45 + 0.25 * light + 0.13 * tex, 0.0, 1.0)


def render_camera(
    world: World,
    pose_wc: jnp.ndarray,       # (7,) world_T_camera (x right, y down, z fwd)
    cam,                        # frontends.vio.camera.Camera
    max_range: float = 200.0,
    sky_level: float = 0.85,
) -> jnp.ndarray:
    """Render a grayscale image (H, W) in [0, 255] from a camera pose.

    The synthetic substitute for the reference's Carla RGB camera
    (800×600, fov 100° — carla_tools/config/sensors.json): raycast every
    pixel against the world, shade with a world-anchored procedural texture.
    Feature tracks extracted from consecutive renders are geometrically exact
    — the image-driven VIO test substrate."""
    dtype = pose_wc.dtype
    H, W = cam.height, cam.width
    u = (jnp.arange(W, dtype=dtype) + 0.5 - cam.cx) / cam.fx
    v = (jnp.arange(H, dtype=dtype) + 0.5 - cam.cy) / cam.fy
    dirs_c = jnp.stack([
        jnp.broadcast_to(u[None, :], (H, W)),
        jnp.broadcast_to(v[:, None], (H, W)),
        jnp.ones((H, W), dtype),
    ], axis=-1)
    dirs_c = dirs_c / jnp.linalg.norm(dirs_c, axis=-1, keepdims=True)
    q = lie.pose_quat(pose_wc)
    o = lie.pose_trans(pose_wc)
    dirs_w = lie.quat_rotate(q[None, None, :], dirs_c)

    t, n = cast(world, o, dirs_w, min_range=0.05)
    hit = t < max_range
    t_safe = jnp.where(hit, t, 0.0)
    p_hit = o + t_safe[..., None] * dirs_w
    shade = _procedural_intensity(p_hit, n, dtype)
    img = jnp.where(hit, shade, jnp.asarray(sky_level, dtype))
    return img * 255.0


def render_camera_series(world: World, poses_wc: jnp.ndarray, cam,
                         **kw) -> jnp.ndarray:
    """(T, 7) camera poses → (T, H, W) rendered frames.

    Sequential ``lax.map`` rather than vmap: a vmapped render materializes
    (T, H, W, boxes, 3) ray-slab intermediates — gigabytes at real frame
    counts/resolutions — while per-frame HBM is a few tens of MB."""
    return jax.lax.map(lambda p: render_camera(world, p, cam, **kw),
                       poses_wc)


def _ray_dirs(dtype) -> jnp.ndarray:
    """(R, A, 3) unit ray directions in the sensor frame (VLP-16 grid)."""
    elev = jnp.radians(VLP16_ELEVATIONS_DEG.astype(dtype))      # (R,)
    az = (jnp.arange(AZIMUTH, dtype=dtype) + 0.5) / AZIMUTH * 2 * jnp.pi - jnp.pi
    ce, se = jnp.cos(elev)[:, None], jnp.sin(elev)[:, None]
    ca, sa = jnp.cos(az)[None, :], jnp.sin(az)[None, :]
    return jnp.stack([ce * ca, ce * sa, se * jnp.ones_like(ca)], axis=-1)


def raycast(world: World, pose: jnp.ndarray, max_range: float = 120.0,
            min_range: float = 0.5) -> Sweep:
    """Cast the full VLP-16 grid from ``pose`` (world_T_sensor); returns an
    organized :class:`Sweep` in the **sensor frame**."""
    dtype = pose.dtype
    dirs_s = _ray_dirs(dtype)                                    # (R, A, 3)
    q = lie.pose_quat(pose)
    o = lie.pose_trans(pose)
    dirs = lie.quat_rotate(q[None, None, :], dirs_s)             # world frame

    t, _ = cast(world, o, dirs, min_range=min_range)
    valid = (t < max_range).astype(dtype)
    t_safe = jnp.where(valid > 0, t, 0.0)
    pts_w = o + t_safe[..., None] * dirs
    # Back to sensor frame.
    pts_s = lie.quat_rotate(
        lie.quat_conjugate(q)[None, None, :], pts_w - o)
    return Sweep(xyz=pts_s * valid[..., None], rng=t_safe, mask=valid)


def sweep_series(world: World, poses: jnp.ndarray,
                 max_range: float = 120.0) -> Sweep:
    """Raycast a batch of poses → stacked Sweeps (T, R, A, ·). Sequential
    ``lax.map`` for the same HBM reason as render_camera_series."""
    return jax.lax.map(lambda p: raycast(world, p, max_range), poses)


def raycast_motion(world: World, pose_start: jnp.ndarray,
                   pose_end: jnp.ndarray, max_range: float = 120.0,
                   min_range: float = 0.5) -> Sweep:
    """Motion-DISTORTED sweep: azimuth column ``a`` is cast from the sensor
    pose at scan fraction (a+0.5)/A (constant-velocity screw interpolation
    start→end), and its points are expressed in the **end** sensor frame
    uncompensated — exactly the distortion a real spinning LiDAR records
    while moving (what loam_params.yaml ``undistortInputCloud``/`scanPeriod`
    exists to correct)."""
    dtype = pose_start.dtype
    dirs_s = _ray_dirs(dtype)                                    # (R, A, 3)
    A = dirs_s.shape[1]
    frac = (jnp.arange(A, dtype=dtype) + 0.5) / A
    xi = lie.se3_log(lie.pose_between(pose_start, pose_end))     # (6,)
    poses_t = jax.vmap(
        lambda f: lie.pose_compose(pose_start, lie.se3_exp(xi * f)))(frac)

    q_t = lie.pose_quat(poses_t)                                 # (A, 4)
    o_t = lie.pose_trans(poses_t)                                # (A, 3)
    dirs = lie.quat_rotate(q_t[None, :, :], dirs_s)              # world frame
    # cast() takes a single origin — vmap over azimuth columns, each with
    # its own interpolated sensor origin.
    t, _ = jax.vmap(
        lambda o_col, d_col: cast(world, o_col, d_col,
                                  min_range=min_range),
        in_axes=(0, 1), out_axes=1)(o_t, dirs)
    valid = (t < max_range).astype(dtype)
    t_safe = jnp.where(valid > 0, t, 0.0)
    pts_w = o_t[None, :, :] + t_safe[..., None] * dirs
    # Each column's points are recorded RAW in that column's instantaneous
    # sensor frame and the assembled cloud pretends they share one frame —
    # the uncompensated distortion undistort() must undo (each point is off
    # by end_T_capture).
    pts_s = lie.quat_rotate(
        lie.quat_conjugate(q_t)[None, :, :], pts_w - o_t[None, :, :])
    return Sweep(xyz=pts_s * valid[..., None], rng=t_safe, mask=valid)
