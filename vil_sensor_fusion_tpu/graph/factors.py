"""Factor residuals for the fixed-lag smoother — the TPU-native replacement
for GTSAM's factor types used by the reference:

- ``CombinedImuFactor`` (built in gtsam_fusion/src/gtsam_fusion/IMUManager.cpp:68-73)
- ``BetweenFactor<Pose3>`` (added in GraphManager.cpp:83-88 with the odometry
  delta computed by SensorManagerRos::poseDiff, SensorManagerRos.cpp:122-158)
- priors on X(0)/V(0)/B(0) (GraphManager.cpp:20-35)

Everything here is a pure, batched, jit-friendly JAX function. Jacobians are
obtained with ``jax.jacfwd`` over tangent-space perturbations (exact to
machine precision; XLA fuses the forward passes), so there is no hand-derived
Jacobian to get wrong.

State & tangent conventions
---------------------------
A keyframe state is ``(pose[7], vel[3], bias[6])`` where pose packs
``(qw,qx,qy,qz, tx,ty,tz)`` and bias packs ``(b_acc[3], b_gyro[3])``.
The per-keyframe tangent vector is 15-dimensional, ordered::

    [ rho(3) | theta(3) | dvel(3) | dba(3) | dbg(3) ]

with (rho, theta) the SE(3) right-retraction tangent of :mod:`..core.lie`.

IMU-factor residuals are ordered ``(r_theta, r_pos, r_vel, r_ba, r_bg)`` to
match the 15x15 covariance layout of
:func:`..core.preintegration.combined_covariance_15`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core import preintegration as pre

STATE_DIM = 15  # per-keyframe tangent dimension


class KeyframeStates(NamedTuple):
    """A window of W keyframe states (struct-of-arrays)."""

    poses: jnp.ndarray   # (W, 7)
    vels: jnp.ndarray    # (W, 3)
    biases: jnp.ndarray  # (W, 6)

    @property
    def window(self) -> int:
        return self.poses.shape[-2]


def retract_state(pose, vel, bias, delta):
    """Apply a 15-dim tangent update to one keyframe state."""
    pose_n = lie.pose_retract(pose, delta[..., 0:6])
    return pose_n, vel + delta[..., 6:9], bias + delta[..., 9:15]


def retract_window(states: KeyframeStates, delta: jnp.ndarray) -> KeyframeStates:
    """Apply a (W, 15) tangent update to the whole window."""
    poses = lie.pose_retract(states.poses, delta[..., 0:6])
    return KeyframeStates(
        poses=poses,
        vels=states.vels + delta[..., 6:9],
        biases=states.biases + delta[..., 9:15],
    )


def local_window(ref: KeyframeStates, x: KeyframeStates) -> jnp.ndarray:
    """(W, 15) tangent of x relative to ref: x = ref ⊞ local(ref, x)."""
    dpose = lie.pose_local(ref.poses, x.poses)
    return jnp.concatenate(
        [dpose, x.vels - ref.vels, x.biases - ref.biases], axis=-1
    )


# ---------------------------------------------------------------------------
# Residuals (unwhitened)
# ---------------------------------------------------------------------------

def imu_residual(
    pose_i, vel_i, bias_i,
    pose_j, vel_j, bias_j,
    pim: pre.PreintegratedImu,
    gravity: jnp.ndarray,
) -> jnp.ndarray:
    """CombinedImuFactor 15-dim residual (Forster et al. RSS'15 eq. 45 plus
    bias random-walk rows), ordered (r_theta, r_pos, r_vel, r_ba, r_bg).

    Bias correction is first-order around ``pim.bias_hat`` — same structure
    GTSAM applies inside PreintegrationBase::computeError.
    """
    db = bias_i - pim.bias_hat
    dba, dbg = db[..., :3], db[..., 3:6]

    dR_corr = pim.delta_R @ lie.so3_exp(
        jnp.einsum("...ij,...j->...i", pim.dR_dbg, dbg))
    dv_corr = pim.delta_v + jnp.einsum("...ij,...j->...i", pim.dv_dba, dba) \
        + jnp.einsum("...ij,...j->...i", pim.dv_dbg, dbg)
    dp_corr = pim.delta_p + jnp.einsum("...ij,...j->...i", pim.dp_dba, dba) \
        + jnp.einsum("...ij,...j->...i", pim.dp_dbg, dbg)

    Ri = lie.quat_to_rot(lie.pose_quat(pose_i))
    RiT = jnp.swapaxes(Ri, -1, -2)
    Rj = lie.quat_to_rot(lie.pose_quat(pose_j))
    pi = lie.pose_trans(pose_i)
    pj = lie.pose_trans(pose_j)
    dt = pim.delta_t[..., None]

    r_theta = lie.so3_log(jnp.swapaxes(dR_corr, -1, -2) @ RiT @ Rj)
    r_vel = jnp.einsum("...ij,...j->...i", RiT, vel_j - vel_i - gravity * dt) - dv_corr
    r_pos = jnp.einsum(
        "...ij,...j->...i", RiT,
        pj - pi - vel_i * dt - 0.5 * gravity * dt * dt) - dp_corr
    r_bias = bias_j - bias_i
    return jnp.concatenate([r_theta, r_pos, r_vel, r_bias], axis=-1)


def between_residual(pose_i, pose_j, measured) -> jnp.ndarray:
    """BetweenFactor<Pose3> 6-dim residual: Log(measured⁻¹ · (Tᵢ⁻¹ Tⱼ)),
    ordered (rho, theta). The *measurement* in parity mode is the reference's
    poseDiff quantity (lie.pose_ref_delta), fed to the same between-residual —
    exactly what GraphManager::addBetweenFactor does with poseDiff's output.
    """
    pred = lie.pose_between(pose_i, pose_j)
    return lie.se3_log(lie.pose_compose(lie.pose_inverse(measured), pred))


def prior_residual(pose, vel, bias, prior_pose, prior_vel, prior_bias):
    """15-dim prior residual ordered like the state tangent
    (rho, theta, dvel, dba, dbg)."""
    dpose = lie.pose_local(prior_pose, pose)
    return jnp.concatenate([dpose, vel - prior_vel, bias - prior_bias], axis=-1)


# ---------------------------------------------------------------------------
# Linearization: residual + Jacobians wrt the two endpoint tangents
# ---------------------------------------------------------------------------

def linearize_imu_factor(
    pose_i, vel_i, bias_i, pose_j, vel_j, bias_j,
    pim: pre.PreintegratedImu, gravity,
):
    """Returns (r[15], A_i[15,15], A_j[15,15]) at the current estimates."""

    def r_of(di, dj):
        pi, vi, bi = retract_state(pose_i, vel_i, bias_i, di)
        pj, vj, bj = retract_state(pose_j, vel_j, bias_j, dj)
        return imu_residual(pi, vi, bi, pj, vj, bj, pim, gravity)

    z = jnp.zeros((STATE_DIM,), dtype=pose_i.dtype)
    r = r_of(z, z)
    A_i = jax.jacfwd(r_of, argnums=0)(z, z)
    A_j = jax.jacfwd(r_of, argnums=1)(z, z)
    return r, A_i, A_j


def linearize_between_factor(pose_i, pose_j, measured):
    """Returns (r[6], A_i[6,15], A_j[6,15])."""

    def r_of(di, dj):
        pi = lie.pose_retract(pose_i, di[0:6])
        pj = lie.pose_retract(pose_j, dj[0:6])
        return between_residual(pi, pj, measured)

    z = jnp.zeros((STATE_DIM,), dtype=pose_i.dtype)
    r = r_of(z, z)
    A_i = jax.jacfwd(r_of, argnums=0)(z, z)
    A_j = jax.jacfwd(r_of, argnums=1)(z, z)
    return r, A_i, A_j


def pose_prior_residual(pose, measured) -> jnp.ndarray:
    """6-dim unary pose residual Log(measured⁻¹ · T), ordered (rho, theta)
    — PriorFactor<Pose3>: the absolute map-anchored measurement (a
    scan-to-map registration's world-frame pose carries the voxel map's
    absolute information, which the between-factor chain discards)."""
    return lie.pose_local(measured, pose)


def linearize_pose_prior(pose, measured):
    """Returns (r[6], A[6,15]) for a unary pose prior on one keyframe."""

    def r_of(d):
        return pose_prior_residual(lie.pose_retract(pose, d[0:6]), measured)

    z = jnp.zeros((STATE_DIM,), dtype=pose.dtype)
    return r_of(z), jax.jacfwd(r_of)(z)


def linearize_prior_factor(pose, vel, bias, prior_pose, prior_vel, prior_bias):
    """Returns (r[15], A[15,15])."""

    def r_of(d):
        p, v, b = retract_state(pose, vel, bias, d)
        return prior_residual(p, v, b, prior_pose, prior_vel, prior_bias)

    z = jnp.zeros((STATE_DIM,), dtype=pose.dtype)
    return r_of(z), jax.jacfwd(r_of)(z)


def info_from_cov(cov: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Information matrix Λ = Σ⁻¹ via Cholesky (symmetrized)."""
    n = cov.shape[-1]
    eye = jnp.eye(n, dtype=cov.dtype)
    covs = 0.5 * (cov + jnp.swapaxes(cov, -1, -2)) + jitter * eye
    L = jnp.linalg.cholesky(covs)
    eye_b = jnp.broadcast_to(eye, L.shape)
    Linv = jax.scipy.linalg.solve_triangular(L, eye_b, lower=True)
    return jnp.swapaxes(Linv, -1, -2) @ Linv
