"""Batched SO(3) / SE(3) Lie-group operations in JAX.

Replaces the reference's scattered pose math: Eigen quaternion arithmetic in
``gtsam_fusion/src/gtsam_fusion/SensorManagerRos.cpp`` (poseDiff, lines
122-158), ``tf.transformations`` usage in the Python nodes, and the axis
convention rotations of ``carla_tools/src/transform_helper.py``.

Conventions
-----------
- Quaternions are Hamilton convention, stored ``(w, x, y, z)`` (matches the
  Eigen/GTSAM constructor order used throughout the reference).
- Rotation matrices act on column vectors: ``v_world = R @ v_body``.
- SE(3) tangent vectors are ordered ``(rho[3], theta[3])`` = (translation,
  rotation); se3 exp/log use the full SE(3) exponential with the V-matrix.
- All ops broadcast over arbitrary leading batch dimensions.
- dtype follows the inputs (tests run f64 on CPU; TPU runs f32/bf16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.stack([w, -x, -y, -z], axis=-1)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q: R(q) @ v."""
    qv = q[..., 1:]
    qw = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    r = jnp.stack(
        [
            1.0 - (tyy + tzz), txy - twz, txz + twy,
            txy + twz, 1.0 - (txx + tzz), tyz - twx,
            txz - twy, tyz + twx, 1.0 - (txx + tyy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> unit quaternion (w,x,y,z), branchless.

    Uses the four-branch Shepperd method expressed with jnp.where so it is
    jit/vmap friendly and numerically stable for all rotations.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    one = jnp.ones_like(tr)

    # Candidate 0: trace-dominant
    s0 = jnp.sqrt(jnp.maximum(one + tr, _EPS)) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0], axis=-1)
    # Candidate 1: m00 dominant
    s1 = jnp.sqrt(jnp.maximum(one + m00 - m11 - m22, _EPS)) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)
    # Candidate 2: m11 dominant
    s2 = jnp.sqrt(jnp.maximum(one - m00 + m11 - m22, _EPS)) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], axis=-1)
    # Candidate 3: m22 dominant
    s3 = jnp.sqrt(jnp.maximum(one - m00 - m11 + m22, _EPS)) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], axis=-1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    # Canonicalize sign (w >= 0) and normalize.
    q = jnp.where(q[..., :1] < 0.0, -q, q)
    return quat_normalize(q)


def quat_canonical(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so w >= 0 (double cover canonicalization)."""
    return jnp.where(q[..., :1] < 0.0, -q, q)


# ---------------------------------------------------------------------------
# SO(3) exp / log and Jacobians
# ---------------------------------------------------------------------------

def hat(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector -> skew-symmetric matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def vee(M: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


def so3_exp_quat(theta: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector -> unit quaternion, Taylor-safe near 0."""
    angle_sq = jnp.sum(theta * theta, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle_sq, 0.0))
    half = 0.5 * angle
    small = angle_sq < _EPS
    # sin(half)/angle with Taylor fallback: 0.5 - angle^2/48
    k = jnp.where(small, 0.5 - angle_sq / 48.0,
                  jnp.sin(half) / jnp.where(small, 1.0, angle))
    w = jnp.where(small, 1.0 - angle_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * theta], axis=-1)


def so3_exp(theta: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector -> rotation matrix (Rodrigues), Taylor-safe."""
    angle_sq = jnp.sum(theta * theta, axis=-1)[..., None, None]
    angle = jnp.sqrt(jnp.maximum(angle_sq, 0.0))
    small = angle_sq < _EPS
    safe = jnp.where(small, 1.0, angle)
    A = jnp.where(small, 1.0 - angle_sq / 6.0, jnp.sin(angle) / safe)
    B = jnp.where(small, 0.5 - angle_sq / 24.0,
                  (1.0 - jnp.cos(angle)) / (safe * safe))
    K = hat(theta)
    I = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), K.shape)
    return I + A * K + B * (K @ K)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> rotation vector, via quaternion (stable)."""
    return quat_log(rot_to_quat(R))


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation vector, Taylor-safe; handles double cover."""
    q = quat_canonical(q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vnorm_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    vnorm = jnp.sqrt(jnp.maximum(vnorm_sq, 0.0))
    small = vnorm_sq < _EPS
    angle = 2.0 * jnp.arctan2(vnorm, w)
    # theta = angle * v / |v|; near zero use 2/w * v (since angle ≈ 2|v|/w)
    k = jnp.where(small, 2.0 / jnp.maximum(w, 0.5),
                  angle / jnp.where(small, 1.0, vnorm))
    return k * v


def so3_left_jacobian(theta: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3): exp(theta+d) ≈ exp(J_l d) exp(theta)."""
    angle_sq = jnp.sum(theta * theta, axis=-1)[..., None, None]
    angle = jnp.sqrt(jnp.maximum(angle_sq, 0.0))
    small = angle_sq < _EPS
    safe = jnp.where(small, 1.0, angle)
    B = jnp.where(small, 0.5 - angle_sq / 24.0,
                  (1.0 - jnp.cos(angle)) / (safe * safe))
    C = jnp.where(small, 1.0 / 6.0 - angle_sq / 120.0,
                  (safe - jnp.sin(angle)) / (safe * safe * safe))
    K = hat(theta)
    I = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), K.shape)
    return I + B * K + C * (K @ K)


def so3_right_jacobian(theta: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian J_r(theta) = J_l(-theta)."""
    return so3_left_jacobian(-theta)


def so3_left_jacobian_inv(theta: jnp.ndarray) -> jnp.ndarray:
    angle_sq = jnp.sum(theta * theta, axis=-1)[..., None, None]
    angle = jnp.sqrt(jnp.maximum(angle_sq, 0.0))
    small = angle_sq < _EPS
    safe = jnp.where(small, 1.0, angle)
    half = 0.5 * safe
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + angle_sq / 720.0,
        (1.0 / (safe * safe)) - (1.0 + jnp.cos(angle)) / (2.0 * safe * jnp.sin(angle) + _EPS * jnp.asarray(small, theta.dtype)),
    )
    K = hat(theta)
    I = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), K.shape)
    return I - 0.5 * K + cot_term * (K @ K)


def so3_right_jacobian_inv(theta: jnp.ndarray) -> jnp.ndarray:
    return so3_left_jacobian_inv(-theta)


# ---------------------------------------------------------------------------
# SE(3): pose = (q[4], t[3]) packed as a 7-vector [qw qx qy qz tx ty tz]
# ---------------------------------------------------------------------------

def pose_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=dtype)


def pose_make(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q, t], axis=-1)


def pose_quat(p: jnp.ndarray) -> jnp.ndarray:
    return p[..., :4]


def pose_trans(p: jnp.ndarray) -> jnp.ndarray:
    return p[..., 4:7]


def pose_compose(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """T1 * T2 : first apply T2, then T1 (world_T_a ∘ a_T_b = world_T_b)."""
    q = quat_mul(pose_quat(p1), pose_quat(p2))
    t = pose_trans(p1) + quat_rotate(pose_quat(p1), pose_trans(p2))
    return pose_make(quat_normalize(q), t)


def pose_inverse(p: jnp.ndarray) -> jnp.ndarray:
    qi = quat_conjugate(pose_quat(p))
    ti = -quat_rotate(qi, pose_trans(p))
    return pose_make(qi, ti)


def pose_between(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """T1^-1 * T2 — GTSAM's Pose3::between, used by BetweenFactor."""
    return pose_compose(pose_inverse(p1), p2)


def pose_transform_points(p: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to points: R @ x + t, broadcasting pose over points."""
    return quat_rotate(pose_quat(p)[..., None, :], pts) + pose_trans(p)[..., None, :]


def pose_ref_delta(before: jnp.ndarray, after: jnp.ndarray) -> jnp.ndarray:
    """The reference's ad-hoc 'poseDiff' (SensorManagerRos.cpp:122-158).

    NOT the SE(3) between: translation is rotated into the *before* body
    frame (q1^-1 (x2-x1)) but rotation is composed as q2 * q1^-1 (a
    world-frame/left delta). We reproduce it exactly for parity mode.
    """
    q1, q2 = pose_quat(before), pose_quat(after)
    x1, x2 = pose_trans(before), pose_trans(after)
    dxr = quat_rotate(quat_conjugate(q1), x2 - x1)
    qr = quat_mul(q2, quat_conjugate(q1))
    return pose_make(quat_normalize(qr), dxr)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential. xi = (rho[3], theta[3]) -> pose 7-vector."""
    rho, theta = xi[..., :3], xi[..., 3:6]
    q = so3_exp_quat(theta)
    V = so3_left_jacobian(theta)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return pose_make(q, t)


def se3_log(p: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm. pose -> (rho[3], theta[3])."""
    theta = quat_log(pose_quat(p))
    Vinv = so3_left_jacobian_inv(theta)
    rho = jnp.einsum("...ij,...j->...i", Vinv, pose_trans(p))
    return jnp.concatenate([rho, theta], axis=-1)


def pose_retract(p: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Right retraction: p ⊞ xi = p * Exp(xi)  (GTSAM Pose3::retract EXPMAP)."""
    return pose_compose(p, se3_exp(xi))


def pose_local(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Local coordinates: Log(p1^-1 * p2) (right-invariant error)."""
    return se3_log(pose_between(p1, p2))


def pose_adjoint(p: jnp.ndarray) -> jnp.ndarray:
    """6x6 Adjoint of SE(3) with (rho, theta) ordering:
    Ad = [[R, [t]x R], [0, R]].
    """
    R = quat_to_rot(pose_quat(p))
    tR = hat(pose_trans(p)) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# Euler angles (XYZ fixed-axis roll/pitch/yaw, matching tf.transformations
# euler_from_quaternion default 'sxyz' used by degeneracy_detection.py)
# ---------------------------------------------------------------------------

def quat_to_euler(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> (roll, pitch, yaw), ZYX intrinsic == sxyz static."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_to_quat(rpy: jnp.ndarray) -> jnp.ndarray:
    roll, pitch, yaw = jnp.moveaxis(rpy, -1, 0)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def rotation_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Absolute rotation angle = 2*acos(|w|) (diagnostics.py:114 semantics)."""
    w = jnp.clip(jnp.abs(q[..., 0]), 0.0, 1.0)
    return 2.0 * jnp.arccos(w)
