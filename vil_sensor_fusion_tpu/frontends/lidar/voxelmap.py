"""Fixed-capacity voxel feature map — the TPU-native replacement for LOAM's
cube-array map (loam_params.yaml LaserMapping block: ``mapCubeSize 10.0``,
``mapDimensionsInCubes [101,51,101]``, leaf sizes ``cornerFilterSize 0.2`` /
``surfaceFilterSize 0.4``, submap from ``numNeighborSubmapCubes 5``).

LOAM's CPU design (pointer array of PCL clouds + KD-trees per submap) is
replaced by two flat, fixed-capacity point buffers with 0/1 masks:

- **insert** voxel-downsamples (old ∪ new) by exact packed voxel keys
  relative to the current position (argsort + first-occurrence, static
  shapes) and keeps the ``capacity`` points nearest the sensor — together
  these reproduce the leaf-size downsample and the bounded map residency of
  the cube array (far cubes fall out as the robot moves).
- **submap** selects the nearest ``budget`` points for registration — the
  analog of gathering the 11³ neighbor cubes around the robot.

Everything is jit-stable; the map state is a pytree carried through
``lax.scan`` over sweeps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VoxelMapConfig(NamedTuple):
    capacity: int = 32768
    leaf: float = 0.4            # voxel edge (m)
    keep_radius: float = 120.0   # points beyond this of the sensor are evicted
    grid_half_extent: int = 512  # packed-key range: ±half_extent voxels


class VoxelMap(NamedTuple):
    points: jnp.ndarray   # (C, 3)
    mask: jnp.ndarray     # (C,)


def empty(cfg: VoxelMapConfig, dtype=jnp.float32) -> VoxelMap:
    return VoxelMap(
        points=jnp.zeros((cfg.capacity, 3), dtype),
        mask=jnp.zeros((cfg.capacity,), dtype),
    )


def _voxel_keys(pts: jnp.ndarray, center: jnp.ndarray, cfg: VoxelMapConfig):
    """Exact packed voxel key relative to ``center`` (no hash collisions
    within ±half_extent·leaf of the sensor; outside, coordinates clamp and
    merge — those points are beyond keep_radius anyway)."""
    H = cfg.grid_half_extent
    g = jnp.floor((pts - center[None, :]) / cfg.leaf).astype(jnp.int32)
    g = jnp.clip(g, -H, H - 1) + H
    return (g[:, 0] * (2 * H) + g[:, 1]) * (2 * H) + g[:, 2]


def insert(
    m: VoxelMap,
    new_pts: jnp.ndarray,
    new_mask: jnp.ndarray,
    center: jnp.ndarray,
    cfg: VoxelMapConfig,
) -> VoxelMap:
    """Merge new points into the map: voxel-dedup (old points win their
    voxel — matching LOAM, where the map absorbs the scan after its own
    downsample) then keep the ``capacity`` nearest-to-sensor survivors."""
    dtype = m.points.dtype
    C = cfg.capacity
    pts = jnp.concatenate([m.points, new_pts.astype(dtype)], axis=0)
    ok = jnp.concatenate([m.mask, new_mask.astype(dtype)], axis=0)
    N = pts.shape[0]

    keys = _voxel_keys(pts, center, cfg)
    # Invalid points get a unique sentinel key range so they never block a
    # real voxel; priority: old points (lower index) win via stable sort.
    big = jnp.asarray(2_000_000_000, jnp.int32)
    keys = jnp.where(ok > 0, keys, big - jnp.arange(N, dtype=jnp.int32))
    order = jnp.argsort(keys, stable=True)
    sorted_keys = keys[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]])
    keep_sorted = first & (ok[order] > 0)

    # Score: valid & dedup'd, nearest to sensor first.
    d = jnp.linalg.norm(pts[order] - center[None, :], axis=-1)
    in_range = d < cfg.keep_radius
    score = jnp.where(keep_sorted & in_range, -d, -jnp.inf)
    top, sel = jax.lax.top_k(score, C)
    idx = order[sel]
    new_mask_out = (top > -jnp.inf).astype(dtype)
    return VoxelMap(
        points=pts[idx] * new_mask_out[:, None],
        mask=new_mask_out,
    )


def submap(
    m: VoxelMap,
    center: jnp.ndarray,
    budget: int,
    radius: float = 100.0,
) -> VoxelMap:
    """Nearest-``budget`` points within ``radius`` of the sensor — the
    registration target set (LOAM's neighbor-cube submap)."""
    d = jnp.linalg.norm(m.points - center[None, :], axis=-1)
    score = jnp.where((m.mask > 0) & (d < radius), -d, -jnp.inf)
    top, idx = jax.lax.top_k(score, budget)
    ok = (top > -jnp.inf).astype(m.points.dtype)
    return VoxelMap(points=m.points[idx] * ok[:, None], mask=ok)
