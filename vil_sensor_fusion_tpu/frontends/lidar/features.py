"""LOAM-style curvature feature extraction, fully vectorized.

Semantics follow the reference's MultiScanRegistration configuration
(gtsam_fusion/config/carla/loam_params.yaml):

- ``curvatureRegion: 5``      — ±5 ring neighbors in the curvature sum
- ``featureRegions: 6``       — 6 azimuth regions per ring
- ``maxCornerSharp: 2``       — top-2 sharp corners per (ring, region)
- ``maxCornerLessSharp: 20``  — top-20 less-sharp corners
- ``maxSurfaceFlat: 4``       — top-4 flat surface points
- ``surfaceCurvatureThreshold: 0.1``
- less-flat = the downsampled remainder (``lessFlatFilterSize``), here a
  strided subsample of valid smooth points.

Where LOAM walks each ring with index bookkeeping and neighbor-picked flags,
this computes curvature for the whole (R, A) grid at once and selects with
masked ``top_k`` per region — one fused XLA computation per sweep, identical
selection criteria.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rangeimage import Sweep

CURVATURE_REGION = 5     # neighbors each side
FEATURE_REGIONS = 6
MAX_SHARP = 2
MAX_LESS_SHARP = 20
MAX_FLAT = 4
CURV_THRESHOLD = 0.1
LESS_FLAT_STRIDE = 8


class FeatureSet(NamedTuple):
    """Fixed-size feature clouds in the sensor frame (points + 0/1 masks)."""

    sharp: jnp.ndarray         # (Ns, 3) strongest corners
    sharp_mask: jnp.ndarray    # (Ns,)
    less_sharp: jnp.ndarray    # (Nl, 3) corner pool (matching targets)
    less_sharp_mask: jnp.ndarray
    flat: jnp.ndarray          # (Nf, 3) flattest surface points
    flat_mask: jnp.ndarray
    less_flat: jnp.ndarray     # (Np, 3) surface pool (matching targets)
    less_flat_mask: jnp.ndarray


def pool_sizes(rings: int, azimuth: int) -> tuple[int, int]:
    """Static sizes of the (corner pool, surface pool) clouds extract()
    produces for an (R, A) sweep — what scan-to-scan registration stores as
    the previous sweep's matching targets."""
    n_corner = rings * FEATURE_REGIONS * MAX_LESS_SHARP
    n_surf = (rings * FEATURE_REGIONS * MAX_FLAT
              + rings * ((azimuth + LESS_FLAT_STRIDE - 1)
                         // LESS_FLAT_STRIDE))
    return n_corner, n_surf


def curvature(sweep: Sweep) -> tuple[jnp.ndarray, jnp.ndarray]:
    """LOAM curvature: c_i = ‖Σ_{k=±1..±K}(p_{i+k} − p_i)‖² per ring point,
    normalized by range (scale invariance). Returns (curv (R,A), valid (R,A))
    where valid requires the full ±K neighborhood present."""
    K = CURVATURE_REGION
    xyz = sweep.xyz
    acc = jnp.zeros_like(xyz)
    nvalid = jnp.ones_like(sweep.mask)
    for k in range(1, K + 1):
        for s in (-k, k):
            acc = acc + jnp.roll(xyz, s, axis=1) - xyz
            nvalid = nvalid * jnp.roll(sweep.mask, s, axis=1)
    c = jnp.sum(acc * acc, axis=-1)
    denom = jnp.maximum(sweep.rng * sweep.rng, 1e-6)
    valid = sweep.mask * nvalid
    return c / denom, valid


def _occlusion_mask(sweep: Sweep) -> jnp.ndarray:
    """Suppress points likely occluded or on near-parallel surfaces — LOAM's
    two exclusion rules: a large range jump to an azimuth neighbor means the
    nearer side of the jump borders an occlusion; near-parallel surfaces have
    range varying rapidly relative to range."""
    r = sweep.rng
    r_next = jnp.roll(r, -1, axis=1)
    r_prev = jnp.roll(r, 1, axis=1)
    m_next = jnp.roll(sweep.mask, -1, axis=1)
    m_prev = jnp.roll(sweep.mask, 1, axis=1)
    # Occlusion: neighbor more than 0.3 m closer → this point is the far edge.
    occl = ((r - r_next > 0.3) & (m_next > 0)) | ((r - r_prev > 0.3) & (m_prev > 0))
    # Parallel beam: both neighbor diffs large relative to range.
    par = (jnp.abs(r_next - r) > 0.02 * r) & (jnp.abs(r_prev - r) > 0.02 * r)
    return (~(occl | par)).astype(r.dtype)


def _select_region_topk(
    score: jnp.ndarray,     # (R, A) selection score (higher = better)
    ok: jnp.ndarray,        # (R, A) eligibility
    k_per_region: int,
) -> jnp.ndarray:
    """(R, regions, k) flat grid indices of the top-k eligible per region."""
    R, A = score.shape
    reg = score.reshape(R, FEATURE_REGIONS, A // FEATURE_REGIONS)
    okr = ok.reshape(R, FEATURE_REGIONS, A // FEATURE_REGIONS)
    neg = jnp.full_like(reg, -jnp.inf)
    masked = jnp.where(okr > 0, reg, neg)
    _, idx = jax.lax.top_k(masked, k_per_region)        # (R, regions, k)
    # Convert region-local column to flat (R, A) index.
    width = A // FEATURE_REGIONS
    col = idx + jnp.arange(FEATURE_REGIONS)[None, :, None] * width
    row = jnp.broadcast_to(
        jnp.arange(R)[:, None, None], col.shape)
    flat = row * A + col
    picked_ok = jnp.take_along_axis(okr, idx, axis=-1) > 0
    return flat.reshape(-1), picked_ok.reshape(-1)


def extract(sweep: Sweep) -> FeatureSet:
    """Extract all four feature clouds from an organized sweep."""
    R, A, _ = sweep.xyz.shape
    c, valid = curvature(sweep)
    keep = valid * _occlusion_mask(sweep)
    pts = sweep.xyz.reshape(-1, 3)

    # Corners: highest curvature above threshold.
    corner_ok = (keep > 0) & (c > CURV_THRESHOLD)
    sharp_idx, sharp_ok = _select_region_topk(c, corner_ok, MAX_SHARP)
    ls_idx, ls_ok = _select_region_topk(c, corner_ok, MAX_LESS_SHARP)

    # Surfaces: lowest curvature below threshold (score = -c).
    surf_ok = (keep > 0) & (c < CURV_THRESHOLD)
    flat_idx, flat_ok = _select_region_topk(-c, surf_ok, MAX_FLAT)

    dtype = sweep.xyz.dtype
    # Less-flat: strided subsample of all smooth valid points.
    lf = sweep.xyz[:, ::LESS_FLAT_STRIDE, :].reshape(-1, 3)
    lf_ok = (surf_ok[:, ::LESS_FLAT_STRIDE]).reshape(-1)

    return FeatureSet(
        sharp=pts[sharp_idx],
        sharp_mask=sharp_ok.astype(dtype),
        less_sharp=pts[ls_idx],
        less_sharp_mask=ls_ok.astype(dtype),
        flat=pts[flat_idx],
        flat_mask=flat_ok.astype(dtype),
        less_flat=lf,
        less_flat_mask=lf_ok.astype(dtype),
    )
