"""Degeneracy-detection metric library — batched JAX port of the semantics of
the reference's two metric collections:

- node version: vil_fusion/src/vil_fusion/degeneracy_detection_functions.py:34-145
- research superset: vil_fusion/python/degeneracy_detection_functions.py:38-303

Every function here takes batched matrices ``(..., n, n)`` (covariance or
Hessian, 6x6 or 3x3 sub-blocks) and returns batched scalars ``(...)`` — so a
whole trajectory's metrics evaluate as ONE fused XLA computation instead of a
per-message Python callback. All matrices handled by these metrics are
symmetric (covariances / Gauss-Newton Hessians), so eigenvalues use
``eigvalsh``.

Reference quirks, handled deliberately:

- ``jensen_bregman`` in the reference computes ``logdet((A+B)/2) - 0.5*det(AB)``
  (a raw determinant where the JBLD formula wants a log-determinant,
  vil_fusion/python/degeneracy_detection_functions.py:131-137). We provide
  the *correct* JBLD here and keep the reference's variant as
  ``jensen_bregman_ref`` for bit-parity studies.
- ``correlation_matrix_distance`` in the reference normalizes with an
  *elementwise* product (``d_inv * mat * d_inv`` on np arrays, :31-37), which
  zeroes all off-diagonal entries and makes the metric identically 0 for SPD
  inputs. We implement the actual correlation-matrix distance.
- ``condition_number`` returns the NEGATED condition number (:262-266) so
  that "smaller = more degenerate" matches the other metrics' polarity;
  ``condition_cov`` is the positive version. Both kept.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_E = 2.718281828459045
_TWO_PI_E = 2.0 * jnp.pi * _E


def _logabsdet(m: jnp.ndarray) -> jnp.ndarray:
    sign, logdet = jnp.linalg.slogdet(m)
    return logdet


def _inv(m: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.inv(m)


def _dim(m: jnp.ndarray) -> float:
    return float(m.shape[-1])


# ---------------------------------------------------------------------------
# Single-matrix metrics
# ---------------------------------------------------------------------------

def d_opt(mat_now: jnp.ndarray, **_) -> jnp.ndarray:
    """D-optimality: exp(logdet(M)/n) — the generalized-variance geometric
    mean of the eigenvalues."""
    return jnp.exp(_logabsdet(mat_now) / _dim(mat_now))


def a_opt(mat_now: jnp.ndarray, **_) -> jnp.ndarray:
    """A-optimality: trace."""
    return jnp.trace(mat_now, axis1=-2, axis2=-1)


def e_opt(mat_now: jnp.ndarray, **_) -> jnp.ndarray:
    """E-optimality: minimum eigenvalue."""
    return jnp.min(jnp.linalg.eigvalsh(mat_now), axis=-1)


def max_eigen(mat_now: jnp.ndarray, **_) -> jnp.ndarray:
    return jnp.max(jnp.linalg.eigvalsh(mat_now), axis=-1)


def differential_entropy(mat_now: jnp.ndarray, **_) -> jnp.ndarray:
    """0.5·log((2πe)^n · det(M))."""
    n = _dim(mat_now)
    return 0.5 * (n * jnp.log(_TWO_PI_E) + _logabsdet(mat_now))


def condition_number(mat_now: jnp.ndarray, **_) -> jnp.ndarray:
    """NEGATED 2-norm condition number (reference polarity: low = degenerate)."""
    return -condition_cov(mat_now)


def condition_cov(mat_now: jnp.ndarray, **_) -> jnp.ndarray:
    s = jnp.linalg.svd(mat_now, compute_uv=False)
    return s[..., 0] / s[..., -1]


def norm_frobenius(mat_now: jnp.ndarray, **_) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(mat_now * mat_now, axis=(-2, -1)))


def norm_nuclear(mat_now: jnp.ndarray, **_) -> jnp.ndarray:
    return jnp.sum(jnp.linalg.svd(mat_now, compute_uv=False), axis=-1)


def norm_1(mat_now: jnp.ndarray, **_) -> jnp.ndarray:
    """Induced 1-norm: max column absolute sum."""
    return jnp.max(jnp.sum(jnp.abs(mat_now), axis=-2), axis=-1)


def norm_2(mat_now: jnp.ndarray, **_) -> jnp.ndarray:
    """Spectral norm: largest singular value."""
    return jnp.max(jnp.linalg.svd(mat_now, compute_uv=False), axis=-1)


# ---------------------------------------------------------------------------
# Ratio variants: metric(M_now · M_prev⁻¹)
# ---------------------------------------------------------------------------

def _ratio(mat_now, mat_prev):
    return mat_now @ _inv(mat_prev)


def d_opt_ratio(mat_now, mat_prev, **_):
    r = _ratio(mat_now, mat_prev)
    return jnp.exp(_logabsdet(r) / _dim(r))


def a_opt_ratio(mat_now, mat_prev, **_):
    return jnp.trace(_ratio(mat_now, mat_prev), axis1=-2, axis2=-1)


def e_opt_ratio(mat_now, mat_prev, **_):
    # The ratio matrix is similar to the SPD matrix P⁻¹ᐟ² N P⁻¹ᐟ², so its
    # eigenvalues are real; eigvalsh of the symmetrized ratio matches the
    # reference's min(eigvals).
    r = _ratio(mat_now, mat_prev)
    return jnp.min(jnp.linalg.eigvalsh(0.5 * (r + jnp.swapaxes(r, -1, -2))), axis=-1)


def max_eigen_ratio(mat_now, mat_prev, **_):
    r = _ratio(mat_now, mat_prev)
    return jnp.max(jnp.linalg.eigvalsh(0.5 * (r + jnp.swapaxes(r, -1, -2))), axis=-1)


def norm_frobenius_ratio(mat_now, mat_prev, **_):
    return norm_frobenius(_ratio(mat_now, mat_prev))


def norm_nuclear_ratio(mat_now, mat_prev, **_):
    return norm_nuclear(_ratio(mat_now, mat_prev))


def norm_1_ratio(mat_now, mat_prev, **_):
    return norm_1(_ratio(mat_now, mat_prev))


def norm_2_ratio(mat_now, mat_prev, **_):
    return norm_2(_ratio(mat_now, mat_prev))


# ---------------------------------------------------------------------------
# Divergences between consecutive distributions
# ---------------------------------------------------------------------------

def jensen_bregman(mat_now, mat_prev, **_):
    """Jensen-Bregman LogDet divergence:
    logdet((A+B)/2) − ½·logdet(A·B)."""
    return _logabsdet(0.5 * (mat_now + mat_prev)) \
        - 0.5 * _logabsdet(mat_now @ mat_prev)


def jensen_bregman_ref(mat_now, mat_prev, **_):
    """The reference's literal computation (raw det in the second term)."""
    return _logabsdet(0.5 * (mat_now + mat_prev)) \
        - 0.5 * jnp.linalg.det(mat_now @ mat_prev)


def correlation_matrix_distance(mat_now, mat_prev, **_):
    """CMD(A,B) = 1 − tr(corr(A)·corr(B)) / (‖corr(A)‖_F ‖corr(B)‖_F)."""
    def corr(m):
        d = jnp.sqrt(jnp.clip(jnp.diagonal(m, axis1=-2, axis2=-1), 1e-30))
        return m / (d[..., :, None] * d[..., None, :])

    ca, cb = corr(mat_now), corr(mat_prev)
    tr = jnp.trace(ca @ cb, axis1=-2, axis2=-1)
    return 1.0 - tr / (norm_frobenius(ca) * norm_frobenius(cb))


def kullback_leibler(mat_now, mat_prev, pose_now=None, pose_prev=None, **_):
    """Gaussian KL(N(u1,E1) ‖ N(u2,E2)) with E1=prev, E2=now — the exact
    formula at vil_fusion/python/degeneracy_detection_functions.py:153-186."""
    n = _dim(mat_now)
    E1, E2 = mat_prev, mat_now
    E2i = _inv(E2)
    a = jnp.trace(E2i @ E1, axis1=-2, axis2=-1) - n
    if pose_now is None:
        b = 0.0
    else:
        du = pose_prev - pose_now
        b = jnp.einsum("...i,...ij,...j->...", du, E2i, du)
    c = jnp.log(jnp.abs(jnp.linalg.det(E2)) / jnp.abs(jnp.linalg.det(E1)))
    return 0.5 * (a + b + c)


def kullback_leibler_0pose(mat_now, mat_prev, **_):
    return kullback_leibler(mat_now, mat_prev)


def kullback_leibler_0cov(mat_now, mat_prev, **_):
    """Reference passes a zero E1 (always singular ⇒ NaN there); here the
    meaningful analog is KL against an identity-covariance reference."""
    return kullback_leibler(mat_now, jnp.broadcast_to(
        jnp.eye(mat_now.shape[-1], dtype=mat_now.dtype), mat_now.shape))


# ---------------------------------------------------------------------------
# Correspondence-distance slope metrics (LOAM perturbation sweep)
# ---------------------------------------------------------------------------

def dist_slope(dists: jnp.ndarray, shifts: jnp.ndarray) -> jnp.ndarray:
    """Least-squares slope of correspondence distance vs. perturbation shift
    (scipy.stats.linregress slope, degeneracy_detection_functions.py:269-303).

    Args:
      dists: (..., K) mean correspondence distances at K pose perturbations.
      shifts: (..., K) the perturbation magnitudes.
    """
    sx = jnp.mean(shifts, axis=-1, keepdims=True)
    sy = jnp.mean(dists, axis=-1, keepdims=True)
    dx = shifts - sx
    dy = dists - sy
    return jnp.sum(dx * dy, axis=-1) / jnp.maximum(jnp.sum(dx * dx, axis=-1), 1e-30)


def dist_slopes_6dof(dists_6k: jnp.ndarray, shifts_trans: jnp.ndarray,
                     shifts_rot: jnp.ndarray) -> jnp.ndarray:
    """All six dist_slope_{tx,ty,tz,rx,ry,rz} at once.

    Args:
      dists_6k: (..., 6, K) distances per perturbed DOF (LOAM's
        OdometryWithHessian dists array reshaped, make_prettier_graphs.py:429-446).
      shifts_trans/shifts_rot: (..., K).
    """
    st = jnp.broadcast_to(shifts_trans[..., None, :], dists_6k[..., :3, :].shape)
    sr = jnp.broadcast_to(shifts_rot[..., None, :], dists_6k[..., 3:, :].shape)
    return jnp.concatenate([
        dist_slope(dists_6k[..., :3, :], st),
        dist_slope(dists_6k[..., 3:, :], sr),
    ], axis=-1)


# Registry mirroring the reference's `degen_funcs` export list (:287-303) —
# lookup by name replicates the rosparam-driven function selection of
# degeneracy_detection.py:45-58.
METRICS = {
    "d_opt": d_opt,
    "d_opt_ratio": d_opt_ratio,
    "a_opt": a_opt,
    "a_opt_ratio": a_opt_ratio,
    "e_opt": e_opt,
    "e_opt_ratio": e_opt_ratio,
    "max_eigen": max_eigen,
    "max_eigen_ratio": max_eigen_ratio,
    "jensen_bregman": jensen_bregman,
    "jensen_bregman_ref": jensen_bregman_ref,
    "correlation_matrix_distance": correlation_matrix_distance,
    "kullback_leibler": kullback_leibler,
    "kullback_leibler_0pose": kullback_leibler_0pose,
    "kullback_leibler_0cov": kullback_leibler_0cov,
    "differential_entropy": differential_entropy,
    "condition_number": condition_number,
    "condition_cov": condition_cov,
    "norm_frobenius": norm_frobenius,
    "norm_frobenius_ratio": norm_frobenius_ratio,
    "norm_nuclear": norm_nuclear,
    "norm_nuclear_ratio": norm_nuclear_ratio,
    "norm_1": norm_1,
    "norm_1_ratio": norm_1_ratio,
    "norm_2": norm_2,
    "norm_2_ratio": norm_2_ratio,
}
