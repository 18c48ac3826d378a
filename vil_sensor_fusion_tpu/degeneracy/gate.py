"""Degeneracy gating — on-device replacements for the reference's two gates:

1. The **final log-det gate** (gtsam_fusion/src/degerate_odometry_filter.cpp:29-48):
   from the 6x6 ICP Hessian, ``log(det(H[3:6,3:6]))`` (rotation) and
   ``log(det(H[0:3,0:3]))`` (translation) are compared against config
   thresholds (rot 11.5 / trans 28.9, fusion_params.yaml:35-36); the odometry
   is DROPPED if either falls below. Here the drop becomes a 0/1 weight that
   multiplies the between-factor information in the smoother — jit-stable,
   vectorizable over a whole trajectory, and differentiable-friendly.

2. The **experimental score node** (vil_fusion/src/vil_fusion/degeneracy_detection.py):
   a configurable list of metric functions applied to the all/trans/rot
   sub-blocks of covariance or Hessian, with score derivatives. Here that is
   :func:`score_series` — one vmapped pass over the full trajectory.
"""

from __future__ import annotations

from typing import Mapping, NamedTuple, Sequence

import jax.numpy as jnp

from . import metrics as M


class GateConfig(NamedTuple):
    """Thresholds of fusion_params.yaml:35-36.

    ``normalize_per_corr``: the reference's raw log-det thresholds only
    transfer between ICP implementations if the Hessian scale matches — and
    log det(H) grows with the correspondence count (H = Σ w JᵀJ over points).
    With normalization on, the gate scores log det(H_block / n_corr) — the
    *average information per correspondence* — which is invariant to sweep
    density and transfers across scenes. Raw mode (default) keeps exact
    reference semantics (degerate_odometry_filter.cpp:32-45) for parity runs.
    """

    rot_threshold: float = 11.5
    trans_threshold: float = 28.9
    normalize_per_corr: bool = False


class GateResult(NamedTuple):
    rot_d_opt: jnp.ndarray     # log det of the 3x3 rotation Hessian block
    trans_d_opt: jnp.ndarray   # log det of the 3x3 translation Hessian block
    keep: jnp.ndarray          # 1.0 = pass, 0.0 = drop (batched)
    valid: jnp.ndarray         # 1.0 = scores finite (an empty Hessian — the
                               # map-seeding first sweep — yields -inf
                               # log-dets; consumers filter on this instead
                               # of each re-deriving the sentinel rule)


def _logdet3(m: jnp.ndarray) -> jnp.ndarray:
    """log det of batched 3x3 blocks, closed form (cofactor expansion).
    slogdet's LU lowering costs ~0.5 ms *per call* on TPU for these tiny
    matrices; the closed form is a handful of fused multiplies. Non-positive
    determinants (empty Hessian) map to -inf, matching slogdet's log|det|
    semantics at the only case the gate meets (PSD blocks)."""
    det = (m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2]
                           - m[..., 1, 2] * m[..., 2, 1])
           - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2]
                             - m[..., 1, 2] * m[..., 2, 0])
           + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1]
                             - m[..., 1, 1] * m[..., 2, 0]))
    return jnp.where(det > 0, jnp.log(jnp.maximum(det, 1e-30)), -jnp.inf)


def logdet_gate(
    hessian: jnp.ndarray,
    cfg: GateConfig = GateConfig(),
    n_corr: jnp.ndarray | None = None,
) -> GateResult:
    """The final thesis gate over batched 6x6 Hessians (rho/theta order:
    translation block [0:3,0:3], rotation block [3:6,3:6] — identical layout
    to LOAM's OptStatus hessian as consumed at degerate_odometry_filter.cpp:32-36).

    ``n_corr``: per-measurement valid-correspondence counts (IcpResult.n_corr),
    required when ``cfg.normalize_per_corr`` — log det(H/n) = log det(H)
    − 3·log(n) for the 3×3 blocks."""
    trans = hessian[..., 0:3, 0:3]
    rot = hessian[..., 3:6, 3:6]
    ld_rot = _logdet3(rot)
    ld_trans = _logdet3(trans)
    if cfg.normalize_per_corr:
        if n_corr is None:
            raise ValueError("normalize_per_corr requires n_corr")
        shift = 3.0 * jnp.log(jnp.maximum(n_corr, 1.0))
        ld_rot = ld_rot - shift
        ld_trans = ld_trans - shift
    keep = ((ld_rot >= cfg.rot_threshold) & (ld_trans >= cfg.trans_threshold))
    valid = jnp.isfinite(ld_rot) & jnp.isfinite(ld_trans)
    return GateResult(rot_d_opt=ld_rot, trans_d_opt=ld_trans,
                      keep=keep.astype(hessian.dtype),
                      valid=valid.astype(hessian.dtype))


def calibrate_threshold(
    scores: jnp.ndarray,
    degenerate: jnp.ndarray,
) -> jnp.ndarray:
    """Pick the gate threshold from labeled windows: the score value
    maximizing Youden's J (TPR − FPR) when dropping everything *below* it —
    the ROC-knee calibration the reference does by hand from its labeled
    degenerate windows (make_prettier_graphs.py:46-120 + the hand-tuned
    11.5/28.9 of fusion_params.yaml).

    Args:
      scores: (T,) gate scores (lower = more degenerate).
      degenerate: (T,) bool/0-1 labels (1 = inside a labeled degenerate window).

    Returns the scalar threshold (drop iff score < threshold).
    """
    scores = jnp.asarray(scores)
    lab = jnp.asarray(degenerate).astype(bool)
    finite = jnp.isfinite(scores)
    n_pos = jnp.maximum(jnp.sum(lab & finite), 1)          # degenerate
    n_neg = jnp.maximum(jnp.sum(~lab & finite), 1)         # healthy
    order = jnp.argsort(scores)
    s_sorted = scores[order]
    l_sorted = lab[order] & finite[order]
    h_sorted = (~lab[order]) & finite[order]
    # Dropping everything <= s_sorted[i]:
    tp = jnp.cumsum(l_sorted)                # degenerate correctly dropped
    fp = jnp.cumsum(h_sorted)                # healthy wrongly dropped
    J = tp / n_pos - fp / n_neg
    best = jnp.argmax(J)
    # Threshold just above the best cut point (midpoint to the next score).
    s_next = jnp.concatenate([s_sorted[1:], s_sorted[-1:] + 1.0])
    return 0.5 * (s_sorted[best] + s_next[best])


class DegeneracyScores(NamedTuple):
    """Per-metric score streams — the DegeneracyScore msg fields
    (vil_fusion/msg/DegeneracyScore.msg) as arrays over the trajectory."""

    score_all: jnp.ndarray        # (T,)
    score_trans: jnp.ndarray      # (T,)
    score_rot: jnp.ndarray        # (T,)
    derivative_all: jnp.ndarray   # (T,) first difference (prev score = 0 at t=0)
    derivative_trans: jnp.ndarray
    derivative_rot: jnp.ndarray


def _diff0(x: jnp.ndarray) -> jnp.ndarray:
    """score[t] - score[t-1] with score[-1] = 0 (the node's init state,
    degeneracy_detection.py:52-57,125-127)."""
    return x - jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)


def score_series(
    names: Sequence[str],
    mats: jnp.ndarray,
    poses: jnp.ndarray | None = None,
) -> Mapping[str, DegeneracyScores]:
    """Evaluate named metrics over a trajectory of 6x6 matrices.

    Args:
      names: metric names from :data:`metrics.METRICS` (rosparam-equivalent
        of ~loam_degen_funcs / ~rovio_degen_funcs).
      mats: (T, 6, 6) covariance or Hessian series.
      poses: optional (T, 6) pose series (x,y,z,roll,pitch,yaw) for the
        KL-style metrics — the euler conversion the node does at
        degeneracy_detection.py:68-81.

    Returns {name: DegeneracyScores} with all/trans/rot sub-block scores and
    first-difference derivatives, matching shared_callback's outputs
    (degeneracy_detection.py:115-130). mat_prev / pose_prev use the previous
    element (identity / zeros at t=0, matching the node's init state).
    """
    T = mats.shape[0]
    eye = jnp.broadcast_to(jnp.eye(6, dtype=mats.dtype), (1, 6, 6))
    prev = jnp.concatenate([eye, mats[:-1]], axis=0)
    if poses is None:
        poses = jnp.zeros((T, 6), dtype=mats.dtype)
    pose_prev = jnp.concatenate([jnp.zeros_like(poses[:1]), poses[:-1]], axis=0)

    blocks = {
        "all": (mats, prev, poses, pose_prev),
        "trans": (mats[:, 0:3, 0:3], prev[:, 0:3, 0:3],
                  poses[:, 0:3], pose_prev[:, 0:3]),
        "rot": (mats[:, 3:6, 3:6], prev[:, 3:6, 3:6],
                poses[:, 3:6], pose_prev[:, 3:6]),
    }

    out = {}
    for name in names:
        fn = M.METRICS[name]
        s = {}
        for k, (mn, mp, pn, pp) in blocks.items():
            s[k] = fn(mat_now=mn, mat_prev=mp, pose_now=pn, pose_prev=pp)
        out[name] = DegeneracyScores(
            score_all=s["all"], score_trans=s["trans"], score_rot=s["rot"],
            derivative_all=_diff0(s["all"]),
            derivative_trans=_diff0(s["trans"]),
            derivative_rot=_diff0(s["rot"]),
        )
    return out
