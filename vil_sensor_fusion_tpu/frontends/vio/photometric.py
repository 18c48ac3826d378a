"""ROVIO-style direct photometric patch updates for the VIO EKF.

The reference's ROVIO (RSL fork `tim-experimental`, configured by
gtsam_fusion/config/carla/rovio.cfg) is a *direct* visual-inertial filter:
each landmark carries a multi-level image patch template, and the iterated
EKF update minimizes the raw intensity difference between that template and
the current image at the landmark's predicted projection — there is no
separate feature-tracking measurement (rovio.cfg patchSize/nLevels/
startLevel/endLevel parameters; the Update block's UpdateNoise.pix is the
per-pixel intensity noise).

This module is that capability, TPU-native:

- Patch sampling is the tracker's zero-gather formulation: one
  ``dynamic_slice`` window per landmark per level, then bilinear patch
  values *and* ±0.5 px central-difference intensity gradients as tiny
  hat-matrix matmuls (tracker.py:_hat_mat) — dense VMEM arithmetic.
- The measurement stack is huge (M landmarks × L levels × P pixels rows),
  so the iterated update runs in **QR-compressed square-root form**: whiten
  and mask the rows, one reduced QR turns the (M·L·P × D) Jacobian into a
  (D × D) equivalent measurement, and the standard S-form/Joseph update
  proceeds at state dimension — an MXU-shaped contraction instead of a
  (M·L·P)² innovation solve.
- Per-landmark χ² gating over the patch rows replicates ROVIO's
  Mahalanobis outlier rejection (MahalanobisTh0) at patch granularity.

The geometric (reprojection-on-KLT-tracks) update in ekf.py remains the
default production path; ``VioConfig.use_photometric=True`` switches the
image-driven pipeline to this direct formulation (see
frontend.photometric_frames / run below).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import lie  # noqa: F401  (re-exported pattern parity)
from . import ekf as E
from . import tracker as T
from .pipeline import VioOutput
from ..._precision import estimation_precision


# ---------------------------------------------------------------------------
# Patch sampling (value + gradient, zero gathers)
# ---------------------------------------------------------------------------

def _sample_patch_grad(
    img: jnp.ndarray,          # (H, W) one pyramid level
    uv: jnp.ndarray,           # (2,) center in THIS level's pixel scale
    radius: int,
    margin: int = 2,
):
    """Bilinear patch + intensity gradients at ``uv``.

    Returns (patch (P,), gx (P,), gy (P,), ok) with P = (2·radius+1)²;
    ``ok`` is False when the patch would leave the image."""
    dtype = uv.dtype
    H, W = img.shape
    r = radius
    win = 2 * (r + margin) + 1
    c = jnp.round(uv).astype(jnp.int32) - (r + margin)
    cx = jnp.clip(c[0], 0, max(W - win, 0))
    cy = jnp.clip(c[1], 0, max(H - win, 0))
    Wimg = jax.lax.dynamic_slice(img, (cy, cx), (win, win))
    corner = jnp.stack([cx, cy]).astype(dtype)
    lp = uv - corner
    offs = jnp.arange(-r, r + 1, dtype=dtype)
    eps = jnp.asarray(0.5, dtype)
    Au0 = T._hat_mat(lp[0], offs, win, dtype)
    Av0 = T._hat_mat(lp[1], offs, win, dtype)
    Au_p = T._hat_mat(lp[0] + eps, offs, win, dtype)
    Au_m = T._hat_mat(lp[0] - eps, offs, win, dtype)
    Av_p = T._hat_mat(lp[1] + eps, offs, win, dtype)
    Av_m = T._hat_mat(lp[1] - eps, offs, win, dtype)
    patch = (Av0 @ Wimg @ Au0.T).reshape(-1)
    gx = (Av0 @ Wimg @ (Au_p - Au_m).T).reshape(-1) / (2 * eps)
    gy = ((Av_p - Av_m) @ Wimg @ Au0.T).reshape(-1) / (2 * eps)
    # The hat matrices interpolate correctly only while every sample point
    # lies inside the (clamped) window: require the full footprint inside
    # the image with one spare pixel for the ±0.5 gradient probes.
    lo = r + margin
    ok = ((uv[0] > lo) & (uv[0] < W - 1 - lo)
          & (uv[1] > lo) & (uv[1] < H - 1 - lo))
    return patch, gx, gy, ok


def patch_dim(cfg: E.VioConfig) -> int:
    return (2 * cfg.patch_radius + 1) ** 2


def extract_templates(
    cfg: E.VioConfig,
    pyr: tuple,                # L × (H_l, W_l)
    uv: jnp.ndarray,           # (M, 2) full-resolution pixels
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Capture each landmark's multi-level template at ``uv``.

    Returns (templates (M, L, P), ok (M, L))."""
    L = cfg.photo_levels
    tmpl, oks = [], []
    for lvl in range(L):
        s = 2.0 ** lvl
        p, _, _, ok = jax.vmap(
            lambda u: _sample_patch_grad(pyr[lvl], u / s, cfg.patch_radius))(uv)
        tmpl.append(p)
        oks.append(ok)
    return (jnp.stack(tmpl, axis=1),
            jnp.stack(oks, axis=1).astype(uv.dtype))


# ---------------------------------------------------------------------------
# The direct photometric iterated EKF update
# ---------------------------------------------------------------------------

@estimation_precision
def photometric_update(
    cfg: E.VioConfig,
    s: E.VioState,
    pyr: tuple,                 # current frame's pyramid, L levels
    templates: jnp.ndarray,     # (M, L, P)
    tmpl_ok: jnp.ndarray,       # (M, L)
) -> tuple[E.VioState, jnp.ndarray]:
    """Iterated EKF update from direct multi-level patch intensity errors.

    Returns ``(state, chi2_ok (M,))`` — the per-landmark χ² gate verdict of
    the final iteration, so the pipeline can retire landmarks whose patch
    persistently fails the gate (occlusion/appearance change; ROVIO retires
    such features via its tracking-quality bounds).

    Measurement model per landmark j, level l, patch pixel i:
        z = template[j,l,i],  h(x) = I_l(π(x, l_j)/2^l + off_i)
    linearized through the image gradient and the projection Jacobian
    (ROVIO's innovation; rovio.cfg Update block). Rows are whitened by
    ``photo_sigma``, masked rows get zero weight, and one reduced QR
    compresses the stack to a (D × D) equivalent measurement before the
    S-form solve — the Bell–Cathey IEKF step and final Joseph covariance
    then run exactly like ekf.update."""
    dtype = s.pose.dtype
    M = cfg.num_landmarks
    D = E._dim(cfg)
    L = cfg.photo_levels
    if len(pyr) < L:
        raise ValueError(
            f"photo_levels={L} exceeds the provided pyramid depth "
            f"{len(pyr)}; set VioConfig.photo_levels <= "
            f"FrontendConfig.pyramid_levels")
    P = patch_dim(cfg)
    sig = cfg.photo_sigma
    s0 = s

    def uv_of(dx):
        uv, _ = E._predict_pixels(cfg, E._retract(cfg, s0, dx))
        return uv.reshape(-1)

    def measurement(s_i):
        dx_i = E._boxminus(cfg, s_i, s0)
        uv_pred = uv_of(dx_i).reshape(M, 2)
        J_uv = jax.jacfwd(uv_of)(dx_i).reshape(M, 2, D)
        _, vis = E._predict_pixels(cfg, s_i)

        rs, Hs, ws = [], [], []
        for lvl in range(L):
            scale = 2.0 ** lvl
            patch, gx, gy, ok = jax.vmap(
                lambda u: _sample_patch_grad(
                    pyr[lvl], u / scale, cfg.patch_radius))(uv_pred)
            r_l = templates[:, lvl, :] - patch                    # (M, P)
            g = jnp.stack([gx, gy], axis=-1) / scale              # (M, P, 2)
            H_l = jnp.einsum("mpc,mcd->mpd", g, J_uv)             # (M, P, D)
            w_l = (s.lm_valid * vis.astype(dtype)
                   * ok.astype(dtype) * tmpl_ok[:, lvl])          # (M,)
            rs.append(r_l)
            Hs.append(H_l)
            ws.append(jnp.repeat(w_l[:, None], P, axis=1))
        r = jnp.stack(rs, axis=1).reshape(-1)                     # (M·L·P,)
        H = jnp.stack(Hs, axis=1).reshape(-1, D)
        w = jnp.stack(ws, axis=1).reshape(-1)

        # Per-landmark χ² gate over the patch rows (ROVIO MahalanobisTh0
        # at patch granularity): normalized squared residual per live row.
        HP = H @ s0.cov
        S_diag = jnp.einsum("nd,nd->n", HP, H) + sig ** 2
        chi2_rows = (r * r / S_diag * w).reshape(M, -1)
        dof = jnp.maximum(jnp.sum(w.reshape(M, -1), axis=1), 1.0)
        chi2_ok = (jnp.sum(chi2_rows, axis=1) / dof
                   < cfg.photo_chi2_per_dof).astype(dtype)
        w = (w.reshape(M, -1) * chi2_ok[:, None]).reshape(-1)

        # Whiten + mask, compress with one reduced QR: A = Q·Rt, so the
        # (rows × D) system becomes the D-row system (Rt, Qᵀb, I).
        A = H * (w / sig)[:, None]
        b_vec = r * (w / sig)
        Q, Rt = jnp.linalg.qr(A, mode="reduced")
        return Rt, Q.T @ b_vec, Q.T @ (A @ dx_i), dx_i, chi2_ok

    def one_iter(_, s_i):
        Rt, c, Adx, _dx, _g = measurement(s_i)
        S = Rt @ s0.cov @ Rt.T + jnp.eye(D, dtype=dtype)
        K = jnp.linalg.solve(S, Rt @ s0.cov).T
        return E._retract(cfg, s0, K @ (c + Adx))

    s_new = jax.lax.fori_loop(0, cfg.update_iters, one_iter, s)

    Rt, _c, _adx, _dx, chi2_ok = measurement(s_new)
    S = Rt @ s0.cov @ Rt.T + jnp.eye(D, dtype=dtype)
    K = jnp.linalg.solve(S, Rt @ s0.cov).T
    I_KH = jnp.eye(D, dtype=dtype) - K @ Rt
    cov = I_KH @ s0.cov @ I_KH.T + K @ K.T
    return s_new._replace(cov=0.5 * (cov + cov.T)), chi2_ok


# ---------------------------------------------------------------------------
# Direct pipeline: propagate → photometric update → depth anchor → replenish
# ---------------------------------------------------------------------------

class PhotoState(NamedTuple):
    """EKF state + per-landmark multi-level patch templates."""
    ekf: E.VioState
    templates: jnp.ndarray     # (M, L, P)
    tmpl_ok: jnp.ndarray       # (M, L)
    # Consecutive χ²-gate failures per landmark. A landmark whose patch
    # persistently fails the gate (occlusion, appearance change — templates
    # are never refreshed) contributes zero information but would otherwise
    # hold its slot forever; after PHOTO_MAX_FAIL consecutive failures the
    # slot is retired so assign_candidates can refill it — the counterpart
    # of ROVIO's tracking-quality feature retirement.
    fail_count: jnp.ndarray    # (M,)


PHOTO_MAX_FAIL = 3


def init_photo(cfg: E.VioConfig, s: E.VioState) -> PhotoState:
    M, L, P = cfg.num_landmarks, cfg.photo_levels, patch_dim(cfg)
    dtype = s.pose.dtype
    return PhotoState(ekf=s,
                      templates=jnp.zeros((M, L, P), dtype),
                      tmpl_ok=jnp.zeros((M, L), dtype),
                      fail_count=jnp.zeros((M,), dtype))


def step(
    cfg: E.VioConfig,
    fcfg,                       # frontend.FrontendConfig
    ps: PhotoState,
    pyr: tuple,                 # this frame's pyramid (L+ levels)
    cand_uv: jnp.ndarray,       # (C, 2) detection candidates
    cand_score: jnp.ndarray,    # (C,)
    cand_depth: jnp.ndarray,    # (C,)
    proj: jnp.ndarray,          # (P_pts, 3) projected sweep (frontend.project_sweep)
    accel: jnp.ndarray, gyro: jnp.ndarray, dts: jnp.ndarray,
    depth_sigma: float = 0.1,
) -> tuple[PhotoState, VioOutput]:
    """One frame of the direct pipeline — ROVIO's loop shape: there is no
    separate tracking stage; the photometric update IS the tracker
    (alignment happens inside the iterated filter update). LiDAR depth at
    the predicted pixels then anchors scale (useDepthFromLiDAR), and freed
    slots are refilled from the detection candidates with fresh templates."""
    from . import frontend as F

    dtype = ps.ekf.pose.dtype
    s = E.propagate(cfg, ps.ekf, accel, gyro, dts)
    if cfg.use_gravity_update or cfg.use_zero_velocity_update:
        static = E.detect_no_motion(cfg, accel, gyro, dts)
    if cfg.use_gravity_update:
        live = (dts > 0).astype(dtype)
        n = jnp.maximum(jnp.sum(live), 1.0)
        accel_mean = jnp.sum(accel * live[:, None], axis=0) / n
        s = E.gravity_update(cfg, s, accel_mean, is_static=static)
    if cfg.use_zero_velocity_update:
        s = E.zero_velocity_update(cfg, s, static)

    s, chi2_ok = photometric_update(cfg, s, pyr, ps.templates, ps.tmpl_ok)

    # Landmark death: projection left the image (ROVIO drops features at
    # the border), or the patch failed the χ² gate PHOTO_MAX_FAIL frames in
    # a row (occlusion/appearance change — the slot contributes nothing and
    # must be freed for replenishment); covariance keeps the slot's block
    # until re-init.
    uv_pred, vis = E._predict_pixels(cfg, s)
    fail_count = jnp.where((chi2_ok > 0) | (s.lm_valid <= 0),
                           0.0, ps.fail_count + 1.0).astype(dtype)
    alive = (fail_count < PHOTO_MAX_FAIL).astype(dtype)
    s = s._replace(lm_valid=s.lm_valid * vis.astype(dtype) * alive)

    if cfg.use_depth_update:
        d = F.depth_at(fcfg, proj, uv_pred) * s.lm_valid
        s = E.depth_update(cfg, s, d)
        uv_pred, _ = E._predict_pixels(cfg, s)

    # Replenish freed slots + capture their templates.
    new_uv, new_depth, new_enable = F.assign_candidates(
        fcfg, uv_pred, s.lm_valid, cand_uv, cand_score, cand_depth)

    def repl(i, st):
        return E.init_landmark(
            cfg, st, jnp.asarray(i, jnp.int32), new_uv[i], new_depth[i],
            jnp.asarray(depth_sigma, dtype), new_enable[i] > 0)

    s = jax.lax.fori_loop(0, cfg.num_landmarks, repl, s)

    tmpl_new, tok_new = extract_templates(cfg, pyr, new_uv)
    en = new_enable[:, None, None]
    templates = jnp.where(en > 0, tmpl_new, ps.templates)
    tmpl_ok = jnp.where(new_enable[:, None] > 0, tok_new, ps.tmpl_ok)
    fail_count = jnp.where(new_enable > 0, 0.0, fail_count)

    out = VioOutput(pose=s.pose, vel=s.vel,
                    cov=E.pose_covariance(cfg, s),
                    twist_cov=E.twist_covariance(cfg, s))
    return PhotoState(ekf=s, templates=templates, tmpl_ok=tmpl_ok,
                      fail_count=fail_count), out


def run(
    cfg: E.VioConfig,
    fcfg,
    ps0: PhotoState,
    pyrs: tuple,                # L × (T, H_l, W_l) batched pyramids
    cand_uv: jnp.ndarray,       # (T, C, 2)
    cand_score: jnp.ndarray,    # (T, C)
    cand_depth: jnp.ndarray,    # (T, C)
    projs: jnp.ndarray,         # (T, P_pts, 3)
    imu_windows: tuple,         # (accel (T,N,3), gyro (T,N,3), dts (T,N))
    depth_sigma: float = 0.1,
) -> tuple[PhotoState, VioOutput]:
    """Scan the direct pipeline over a frame stream (the photometric
    counterpart of pipeline.run; feed it frontend.precompute_frames'
    batched candidates/pyramids)."""
    accel, gyro, dts = imu_windows

    def body(ps, x):
        pyr_t, cuv, cs, cd, proj, a, g, dt = x
        return step(cfg, fcfg, ps, tuple(pyr_t), cuv, cs, cd, proj,
                    a, g, dt, depth_sigma)

    return jax.lax.scan(
        body, ps0,
        (tuple(pyrs), cand_uv, cand_score, cand_depth, projs,
         accel, gyro, dts))
