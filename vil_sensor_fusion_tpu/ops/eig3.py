"""Closed-form eigendecomposition of batched symmetric 3×3 matrices.

``jnp.linalg.eigh`` lowers to an iterative QR/Jacobi routine that is
catastrophically slow for large batches of tiny matrices on TPU (measured
~10.6 ms for (3984, 3, 3) on v5e — per-sweep ICP calls it twice per GN
iteration for the 5-NN neighbor scatters). The analytic path (Smith's
trigonometric method for the eigenvalues + cross-product eigenvectors) is
a few dozen fused elementwise ops on the VPU — orders of magnitude faster
and fully batched.

Accuracy: exact in exact arithmetic; in f32 the eigenvalues are accurate to
~1e-6·‖A‖ and eigenvectors degrade as eigenvalues coalesce — exactly the
matrices the ICP eligibility gates (line_eig_ratio / plane_eig_ratio)
discard anyway, so the consumer is insensitive to the degenerate corner.

Reference use sites: frontends/lidar/icp.py line_fits/plane_fits (the LOAM
fork's per-correspondence PCA, LaserMapping corner/surface matching).
"""

from __future__ import annotations

import jax.numpy as jnp

_TWO_PI_3 = 2.0943951023931953  # 2π/3


def eigvals3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric (..., 3, 3) matrices, ascending (..., 3)."""
    dtype = A.dtype
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    b00 = a00 - q
    b11 = a11 - q
    b22 = a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, jnp.asarray(1e-20, dtype))
    # det(B)/2 with B = (A - qI)/p
    detB = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02))
    r = jnp.clip(detB / (2.0 * safe_p * safe_p * safe_p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_max = q + 2.0 * p * jnp.cos(phi)
    e_min = q + 2.0 * p * jnp.cos(phi + _TWO_PI_3)
    e_mid = 3.0 * q - e_max - e_min
    return jnp.stack([e_min, e_mid, e_max], axis=-1)


def _eigvec(A: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of symmetric (..., 3, 3) A for eigenvalue lam:
    the null direction of (A − λI), taken as the largest cross product of
    its rows (branch-free; falls back to e_x for fully degenerate rows,
    which the callers' eligibility gates discard)."""
    dtype = A.dtype
    M = A - lam[..., None, None] * jnp.eye(3, dtype=dtype)
    r0 = M[..., 0, :]
    r1 = M[..., 1, :]
    r2 = M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best12 = (n12 >= n01) & (n12 >= n02)
    best02 = (~best12) & (n02 >= n01)
    v = jnp.where(best12[..., None], c12,
                  jnp.where(best02[..., None], c02, c01))
    nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
    v = jnp.where(nrm > 1e-20, v / jnp.maximum(nrm, 1e-20), fallback)
    return v


def eigh3(A: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ``jnp.linalg.eigh`` on symmetric (..., 3, 3) batches:
    returns (eigenvalues ascending (..., 3), eigenvectors (..., 3, 3) with
    ``v[..., :, i]`` the i-th eigenvector) — closed form, no iteration."""
    w = eigvals3(A)
    v_min = _eigvec(A, w[..., 0])
    v_max = _eigvec(A, w[..., 2])
    # Middle vector: orthogonal complement (exact for distinct eigenvalues;
    # degenerate cases are gated out by the callers).
    v_mid = jnp.cross(v_max, v_min)
    nrm = jnp.linalg.norm(v_mid, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(v_mid).at[..., 1].set(1.0)
    v_mid = jnp.where(nrm > 1e-20, v_mid / jnp.maximum(nrm, 1e-20),
                      fallback)
    V = jnp.stack([v_min, v_mid, v_max], axis=-1)
    return w, V
