"""Trajectory diagnostics — vectorized equivalents of the reference's online
diagnostics node (gtsam_fusion/python/diagnostics.py:33-141, publishing
gtsam_fusion/msg/DiagnosticMessage) plus the standard ATE/RPE metrics the
offline evaluation suite computes from results bags.

Where the reference runs one thread per estimator doing TF lookups at a
paced rate, here the whole error series is one batched computation over
aligned (estimate, ground-truth) pose arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class DiagnosticSeries(NamedTuple):
    """All DiagnosticMessage fields as (T,) arrays (field-for-field match
    with gtsam_fusion/msg/DiagnosticMessage.msg)."""

    times: jnp.ndarray
    gt_distance: jnp.ndarray         # cumulative GT distance travelled
    abs_dist_err: jnp.ndarray        # |t_est - t_gt| at each time
    abs_rot_err: jnp.ndarray         # 2·acos(|w|) of the error quaternion
    relative_dist_err: jnp.ndarray   # abs_dist_err / gt_distance
    abs_linear_vel_err: jnp.ndarray  # |Δt_est - Δt_gt| per step
    abs_rot_vel_err: jnp.ndarray     # angle of ΔR_gt · ΔR_est⁻¹ per step
    rel_linear_vel_err: jnp.ndarray
    rel_rot_vel_err: jnp.ndarray
    err_pose: jnp.ndarray            # (T, 7) gt⁻¹ · est


def diagnostics(
    times: jnp.ndarray,
    est_poses: jnp.ndarray,
    gt_poses: jnp.ndarray,
) -> DiagnosticSeries:
    """Compute the DiagnosticMessage stream over an aligned trajectory.

    The reference's per-window transforms (lookupTransformFull over
    (last, now), diagnostics.py:84-101) become first differences here; its
    `Inf` sentinels for zero denominators are reproduced with jnp.inf.
    """
    dtype = est_poses.dtype
    # Absolute pose error: transform gt <- est at each time
    err = lie.pose_between(gt_poses, est_poses)
    abs_dist = jnp.linalg.norm(lie.pose_trans(err), axis=-1)
    abs_rot = lie.rotation_angle(lie.pose_quat(err))

    # Per-step deltas (window = consecutive samples)
    def deltas(poses):
        d = lie.pose_between(poses[:-1], poses[1:])
        dt_ = jnp.linalg.norm(lie.pose_trans(d), axis=-1)
        dr = lie.rotation_angle(lie.pose_quat(d))
        zero = jnp.zeros((1,), dtype)
        return jnp.concatenate([zero, dt_]), jnp.concatenate([zero, dr]), d

    gt_step_dist, gt_step_rot, gt_d = deltas(gt_poses)
    est_step_dist, est_step_rot, est_d = deltas(est_poses)

    gt_distance = jnp.cumsum(gt_step_dist)

    # Velocity errors: difference of the per-window motion deltas
    dvel = lie.pose_trans(est_d) - lie.pose_trans(gt_d)
    lin_vel_err = jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.linalg.norm(dvel, axis=-1)])
    dq = lie.quat_mul(lie.pose_quat(gt_d),
                      lie.quat_conjugate(lie.pose_quat(est_d)))
    rot_vel_err = jnp.concatenate(
        [jnp.zeros((1,), dtype), lie.rotation_angle(dq)])

    def safe_div(a, b):
        return jnp.where(b == 0, jnp.inf, a / jnp.where(b == 0, 1.0, b))

    return DiagnosticSeries(
        times=times,
        gt_distance=gt_distance,
        abs_dist_err=abs_dist,
        abs_rot_err=abs_rot,
        relative_dist_err=safe_div(abs_dist, gt_distance),
        abs_linear_vel_err=lin_vel_err,
        abs_rot_vel_err=rot_vel_err,
        rel_linear_vel_err=safe_div(lin_vel_err, gt_step_dist),
        rel_rot_vel_err=safe_div(rot_vel_err, gt_step_rot),
        err_pose=err,
    )


def anchor_first_pose(est_poses: jnp.ndarray,
                      gt_poses: jnp.ndarray) -> jnp.ndarray:
    """Re-anchor an estimated trajectory so its FIRST pose coincides with
    the ground truth's first pose: est'ₖ = (gt₀ ∘ est₀⁻¹) ∘ estₖ.

    This is exactly the reference's frame-anchoring mechanism — it links the
    estimator's world frame to the GT frame at the initial sensor pose
    (carla_frame_transforms.py:32-86 publishes that static TF; the EuRoC
    adapter gt_transform.py:36-76 does the same via extrinsics). Use this
    for reference-parity comparisons; use :func:`umeyama_alignment` for the
    gauge-optimal (evo/TUM-style) alignment."""
    g = lie.pose_compose(gt_poses[0], lie.pose_inverse(est_poses[0]))
    return jax.vmap(lambda p: lie.pose_compose(g, p))(est_poses)


def umeyama_alignment(
    est_t: jnp.ndarray,     # (T, 3) estimated translations
    gt_t: jnp.ndarray,      # (T, 3) ground-truth translations
    with_scale: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closed-form SE(3) (optionally Sim(3)) alignment est → gt (Umeyama
    1991): returns (R (3,3), t (3,), s scalar) minimizing
    Σ‖gt − (s·R·est + t)‖². The gauge-freedom fix every odometry-vs-GT
    comparison needs — the reference anchors frames by hand instead
    (carla_frame_transforms.py:32-86); this is the principled equivalent."""
    dtype = est_t.dtype
    mu_e = jnp.mean(est_t, axis=0)
    mu_g = jnp.mean(gt_t, axis=0)
    xe = est_t - mu_e
    xg = gt_t - mu_g
    # precision='highest': TPU matmuls default to bf16 inputs, which turns
    # a ~1e-6 alignment residual into ~0.4 % of the trajectory scale.
    cov = jnp.matmul(xg.T, xe, precision="highest") / est_t.shape[0]
    U, d, Vt = jnp.linalg.svd(cov)
    s_fix = jnp.where(jnp.linalg.det(U) * jnp.linalg.det(Vt) < 0,
                      jnp.asarray(-1.0, dtype), jnp.asarray(1.0, dtype))
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype)).at[2, 2].set(s_fix)
    R = U @ S @ Vt
    if with_scale:
        var_e = jnp.mean(jnp.sum(xe * xe, axis=-1))
        s = jnp.sum(d * jnp.diagonal(S)) / jnp.maximum(var_e, 1e-12)
    else:
        s = jnp.ones((), dtype)
    t = mu_g - s * (R @ mu_e)
    return R, t, s


def ate_rmse(est_poses: jnp.ndarray, gt_poses: jnp.ndarray,
             align: bool = False) -> jnp.ndarray:
    """Absolute trajectory error RMSE (translation) — the headline metric
    (BASELINE.json: 'ATE RMSE on Carla bags').

    ``align``: Umeyama SE(3)-align the estimate to GT first — required
    whenever the estimator's world frame is gauge-free (pure odometry with
    arbitrary anchoring), the convention standard ATE tooling (evo/TUM)
    uses."""
    est_t = lie.pose_trans(est_poses)
    gt_t = lie.pose_trans(gt_poses)
    if align:
        R, t, s = umeyama_alignment(est_t, gt_t)
        est_t = s * jnp.matmul(est_t, R.T, precision="highest") + t
    err = est_t - gt_t
    return jnp.sqrt(jnp.mean(jnp.sum(err * err, axis=-1)))


def rpe(
    est_poses: jnp.ndarray,
    gt_poses: jnp.ndarray,
    stride: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Relative pose error over a fixed stride: (trans RMSE, rot RMSE)."""
    ed = lie.pose_between(est_poses[:-stride], est_poses[stride:])
    gd = lie.pose_between(gt_poses[:-stride], gt_poses[stride:])
    rel = lie.pose_between(gd, ed)
    t_err = jnp.linalg.norm(lie.pose_trans(rel), axis=-1)
    r_err = lie.rotation_angle(lie.pose_quat(rel))
    return (jnp.sqrt(jnp.mean(t_err * t_err)),
            jnp.sqrt(jnp.mean(r_err * r_err)))
