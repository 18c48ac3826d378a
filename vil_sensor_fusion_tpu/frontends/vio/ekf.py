"""Visual-inertial EKF — the capability-parity replacement for ROVIO
(RSL fork `tim-experimental`, configured by
gtsam_fusion/config/carla/rovio.cfg): IMU-propagated error-state EKF with
landmarks in the state, iterated camera updates, and **LiDAR-provided
feature depth** for landmark initialization (the thesis's customization,
rovio.cfg:133-138 ``useDepthFromLiDAR true``).

Two innovation styles are available (same estimator structure — iterated
update, landmark states — same outputs: 20 Hz odometry + 6×6 pose
covariance for the degeneracy metrics):

- **geometric** (this module's :func:`update`, the default production
  path): reprojection residuals on KLT-tracked features — dense linear
  algebra on a ~100-dim state, the best fit to batched TPU execution;
- **direct photometric** (``use_photometric=True`` →
  :mod:`.photometric`): ROVIO's own multi-level patch-intensity
  innovation (rovio.cfg ``useDirectMethod``/patchSize/nLevels) — the
  filter-internals parity mode.

State: pose (q wxyz, p), vel, bias(ba, bg), M landmark world points.
Error order: [δθ(3) | δp(3) | δv(3) | δba(3) | δbg(3) | δl₁(3) … δl_M(3)],
right perturbation on rotation (R ≈ R̂·Exp(δθ)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import lie
from . import camera as C
from ..._precision import estimation_precision

IMU_DIM = 15


class VioConfig(NamedTuple):
    num_landmarks: int = 32
    # Continuous-time noise densities (same scalars the reference's IMU
    # config exposes, fusion_params.yaml:24-29).
    cov_accel: float = 1e-3
    cov_gyro: float = 1e-5
    cov_bias_acc: float = 1e-6
    cov_bias_omega: float = 1e-8
    gravity: float = 9.81
    pixel_sigma: float = 1.0
    update_iters: int = 2            # iterated EKF passes (ROVIO-style)
    chi2_gate: float = 9.21          # 2-dof 99% gate per feature
    # Continuous LiDAR depth updates (the full useDepthFromLiDAR story):
    # besides seeding new landmarks, every frame the sweep's depth at each
    # TRACKED feature enters the update as a range measurement along the
    # camera ray — the absolute-scale anchor that stops the monocular-style
    # scale drift a forward-motion VIO otherwise accumulates.
    use_depth_update: bool = True
    depth_sigma_update: float = 0.5  # per-measurement σ (m)
    depth_chi2_gate: float = 6.63    # 1-dof 99% gate
    # Gravity/attitude anchoring: while STATIONARY the window-mean
    # accelerometer reading measures b_a + g·Rᵀe_z, observing roll/pitch
    # (yaw stays unobservable — H's attitude block has a null space along
    # gravity). STRICTLY a stationary-mode aid (gated by the no-motion
    # detector like the zero-velocity update): during smooth driving the
    # accelerometer also carries vehicle acceleration — e.g. a gentle
    # 0.13 m/s² lane-weave — which this model would misread as ~0.7° of
    # roll, a SYSTEMATIC attitude bias whose correlated odometry deltas
    # poison the fusion chain far more than random drift (measured: 3.5×
    # fused ATE at 230 s when this fired while moving). In motion, gravity
    # stays observable through the EKF's own propagation/update structure,
    # exactly as in ROVIO.
    use_gravity_update: bool = True
    gravity_sigma: float = 0.3       # m/s² measurement σ (deliberately wide)
    gravity_accel_gate: float = 0.4  # |‖f‖ − g| beyond this ⇒ skip (dynamic)
    # Zero-velocity update (ROVIO's ZeroVelocityUpdate block,
    # rovio.cfg:... isEnabled/UpdateNoise.vel 0.01/MahalanobisTh0): when
    # the IMU window shows no motion (gyro magnitude and accel deviation
    # from gravity both below threshold), measure velocity = 0 — kills
    # the velocity/position random walk on a stationary platform (the
    # reference's evaluation set includes a stationary bag).
    use_zero_velocity_update: bool = True
    zuv_sigma: float = 0.1           # m/s measurement σ (vel cov 0.01)
    zuv_gyro_th: float = 0.02        # rad/s max mean |ω| for "no motion"
    zuv_accel_th: float = 0.15       # m/s² max std of ‖accel‖ for "no motion"
    # Mahalanobis gate (ROVIO's MahalanobisTh0 7.69): IMU statistics alone
    # cannot distinguish standstill from smooth CONSTANT-VELOCITY motion
    # (|ω| and accel variance both ~0 on a straight glide) — without this
    # gate the update would drag a moving filter's velocity toward zero.
    # With it, a confident nonzero velocity estimate rejects the v=0
    # measurement; only a filter that genuinely believes it may be
    # stationary accepts it.
    zuv_chi2_gate: float = 7.69
    # Direct photometric patch updates (ROVIO's native measurement —
    # rovio.cfg patchSize 8 / nLevels / startLevel..endLevel, UpdateNoise.pix):
    # landmark templates are multi-level intensity patches and the iterated
    # update minimizes raw intensity error at the predicted projection
    # (photometric.photometric_update). Off by default: the geometric
    # reprojection update is the production path; this is the
    # filter-internals parity mode.
    use_photometric: bool = False
    patch_radius: int = 3            # (2r+1)² patch ≈ ROVIO's 8×8 (patchSize)
    photo_levels: int = 2            # pyramid levels used (nLevels span)
    photo_sigma: float = 4.0         # per-pixel intensity σ, 0–255 scale
    photo_chi2_per_dof: float = 4.0  # per-landmark patch gate (MahalanobisTh0)
    cam: C.Camera = C.carla_camera()
    # camera-from-imu extrinsics (identity: camera at the IMU, z forward)
    pose_ic: tuple = (1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)


class VioState(NamedTuple):
    pose: jnp.ndarray       # (7,) world_T_imu
    vel: jnp.ndarray        # (3,)
    bias: jnp.ndarray       # (6,) (ba, bg)
    landmarks: jnp.ndarray  # (M, 3) world points
    lm_valid: jnp.ndarray   # (M,) 0/1
    cov: jnp.ndarray        # (D, D), D = 15 + 3M


def _dim(cfg: VioConfig) -> int:
    return IMU_DIM + 3 * cfg.num_landmarks


def init(
    cfg: VioConfig,
    pose0: jnp.ndarray,
    vel0: jnp.ndarray,
    bias0: jnp.ndarray,
    sigmas: tuple = (1e-3, 1e-3, 1e-2, 1e-2, 1e-3),
) -> VioState:
    """sigmas: (rot, pos, vel, ba, bg) initial standard deviations."""
    dtype = pose0.dtype
    M = cfg.num_landmarks
    D = _dim(cfg)
    sr, sp, sv, sba, sbg = sigmas
    diag = jnp.concatenate([
        jnp.full((3,), sr ** 2), jnp.full((3,), sp ** 2),
        jnp.full((3,), sv ** 2), jnp.full((3,), sba ** 2),
        jnp.full((3,), sbg ** 2), jnp.full((3 * M,), 1e4),
    ]).astype(dtype)
    return VioState(
        pose=pose0, vel=vel0, bias=bias0,
        landmarks=jnp.zeros((M, 3), dtype),
        lm_valid=jnp.zeros((M,), dtype),
        cov=jnp.diag(diag),
    )


# ---------------------------------------------------------------------------
# IMU propagation
# ---------------------------------------------------------------------------

@estimation_precision
def propagate(
    cfg: VioConfig,
    s: VioState,
    accel: jnp.ndarray,     # (N, 3)
    gyro: jnp.ndarray,      # (N, 3)
    dts: jnp.ndarray,       # (N,) (0 ⇒ masked sample)
) -> VioState:
    """Error-state EKF propagation over an IMU window (lax.scan).

    Landmarks are static: only the 15 IMU rows/cols of the covariance move
    (P_II ← F P_II Fᵀ + Q; P_IL ← F P_IL) — O(D·15) per sample instead of
    O(D²)."""
    dtype = s.pose.dtype
    g_w = jnp.array([0.0, 0.0, -cfg.gravity], dtype)
    M = cfg.num_landmarks

    P_II = s.cov[:IMU_DIM, :IMU_DIM]
    P_IL = s.cov[:IMU_DIM, IMU_DIM:]
    P_LL = s.cov[IMU_DIM:, IMU_DIM:]

    def step(carry, x):
        q, p, v, bias, P_II, P_IL = carry
        a_m, w_m, dt = x
        live = (dt > 0).astype(dtype)
        dt = jnp.maximum(dt, 1e-12)
        ba, bg = bias[:3], bias[3:6]
        a_c = a_m - ba
        w_c = w_m - bg
        R = lie.quat_to_rot(q)
        a_w = R @ a_c + g_w

        # Mean propagation.
        q_new = lie.quat_mul(q, lie.so3_exp_quat(w_c * dt))
        p_new = p + v * dt + 0.5 * a_w * dt * dt
        v_new = v + a_w * dt

        # Error-state transition.
        theta = w_c * dt
        dRk = lie.so3_exp(theta)
        Jr = lie.so3_right_jacobian(theta)
        I3 = jnp.eye(3, dtype=dtype)
        Z3 = jnp.zeros((3, 3), dtype=dtype)
        Ra = R @ lie.hat(a_c)
        F = jnp.block([
            [dRk.T,            Z3, Z3,      Z3,       -Jr * dt],
            [-0.5 * Ra * dt * dt, I3, I3 * dt, -0.5 * R * dt * dt, Z3],
            [-Ra * dt,          Z3, I3,      -R * dt,  Z3],
            [Z3, Z3, Z3, I3, Z3],
            [Z3, Z3, Z3, Z3, I3],
        ])
        q_g = cfg.cov_gyro / dt
        q_a = cfg.cov_accel / dt
        G = jnp.block([
            [Jr * dt, Z3],
            [Z3, 0.5 * R * dt * dt],
            [Z3, R * dt],
            [Z3, Z3],
            [Z3, Z3],
        ])
        Qin = jnp.block([[I3 * q_g, Z3], [Z3, I3 * q_a]])
        Q = G @ Qin @ G.T
        Q = Q.at[9:12, 9:12].add(I3 * cfg.cov_bias_acc * dt)
        Q = Q.at[12:15, 12:15].add(I3 * cfg.cov_bias_omega * dt)

        P_II_new = F @ P_II @ F.T + Q
        P_IL_new = F @ P_IL

        def sel(n, o):
            return live * n + (1.0 - live) * o

        return (lie.quat_normalize(sel(q_new, q)), sel(p_new, p),
                sel(v_new, v), bias, sel(P_II_new, P_II),
                sel(P_IL_new, P_IL)), None

    q0 = lie.pose_quat(s.pose)
    p0 = lie.pose_trans(s.pose)
    # unroll=4: the per-sample body is tiny 3x3/15x15 algebra — unrolling
    # cuts the TPU sequential-loop overhead that dominates this scan.
    (q, p, v, bias, P_II, P_IL), _ = jax.lax.scan(
        step, (q0, p0, s.vel, s.bias, P_II, P_IL), (accel, gyro, dts),
        unroll=4)

    cov = jnp.zeros_like(s.cov)
    cov = cov.at[:IMU_DIM, :IMU_DIM].set(P_II)
    cov = cov.at[:IMU_DIM, IMU_DIM:].set(P_IL)
    cov = cov.at[IMU_DIM:, :IMU_DIM].set(P_IL.T)
    cov = cov.at[IMU_DIM:, IMU_DIM:].set(P_LL)
    return s._replace(pose=lie.pose_make(q, p), vel=v, cov=cov)


# ---------------------------------------------------------------------------
# Camera update
# ---------------------------------------------------------------------------

def _retract(cfg: VioConfig, s: VioState, dx: jnp.ndarray) -> VioState:
    q = lie.quat_mul(lie.pose_quat(s.pose), lie.so3_exp_quat(dx[0:3]))
    p = lie.pose_trans(s.pose) + dx[3:6]
    M = cfg.num_landmarks
    return s._replace(
        pose=lie.pose_make(lie.quat_normalize(q), p),
        vel=s.vel + dx[6:9],
        bias=s.bias + dx[9:15],
        landmarks=s.landmarks + dx[IMU_DIM:].reshape(M, 3),
    )


def _predict_pixels(cfg: VioConfig, s: VioState):
    """Project all landmarks into the camera: (M, 2) pixels + visibility."""
    pose_wc = lie.pose_compose(s.pose, jnp.asarray(cfg.pose_ic, s.pose.dtype))
    p_cam = lie.quat_rotate(
        lie.quat_conjugate(lie.pose_quat(pose_wc))[None],
        s.landmarks - lie.pose_trans(pose_wc)[None])
    return C.project(cfg.cam, p_cam)


def _predict_cam_z(cfg: VioConfig, s: VioState) -> jnp.ndarray:
    """Per-landmark depth along the camera optical axis (M,)."""
    pose_wc = lie.pose_compose(s.pose, jnp.asarray(cfg.pose_ic, s.pose.dtype))
    p_cam = lie.quat_rotate(
        lie.quat_conjugate(lie.pose_quat(pose_wc))[None],
        s.landmarks - lie.pose_trans(pose_wc)[None])
    return p_cam[..., 2]


@estimation_precision
def update(
    cfg: VioConfig,
    s: VioState,
    obs_uv: jnp.ndarray,     # (M, 2) measured pixels per landmark slot
    obs_valid: jnp.ndarray,  # (M,) 0/1
    obs_depth: jnp.ndarray | None = None,   # (M,) LiDAR depth, 0 = none
) -> VioState:
    """Iterated EKF update from tracked-feature observations, plus (when
    ``obs_depth`` is given and cfg.use_depth_update) per-feature LiDAR
    range measurements along the camera axis — the continuous
    useDepthFromLiDAR scale anchor.

    Masked features get effectively infinite measurement variance; χ²
    gates additionally drop outlier tracks / depths (ROVIO's Mahalanobis
    check)."""
    dtype = s.pose.dtype
    M = cfg.num_landmarks
    D = _dim(cfg)
    R_pix = cfg.pixel_sigma ** 2
    R_dep = cfg.depth_sigma_update ** 2
    use_d = cfg.use_depth_update and obs_depth is not None
    s0 = s
    big = jnp.asarray(1e12, dtype)

    def h_of(dx):
        sp = _retract(cfg, s0, dx)
        uv, _ = _predict_pixels(cfg, sp)
        if use_d:
            return jnp.concatenate([uv.reshape(-1),
                                    _predict_cam_z(cfg, sp)])
        return uv.reshape(-1)

    def measurement(s_i):
        """(r, H, R_eff) at linearization point s_i (gating included)."""
        dx_i = _boxminus(cfg, s_i, s0)
        pred = h_of(dx_i)
        H = jax.jacfwd(h_of)(dx_i)                    # (2M[+M], D)
        r_uv = (obs_uv - pred[:2 * M].reshape(M, 2)).reshape(-1)

        _, vis = _predict_pixels(cfg, s_i)
        w = obs_valid * s.lm_valid * vis.astype(dtype)

        HP = H @ s0.cov                               # (2M[+M], D)
        S_diag = jnp.einsum("md,md->m", HP, H)
        r2 = r_uv * r_uv
        chi2 = (r2[0::2] / (S_diag[0:2 * M:2] + R_pix)
                + r2[1::2] / (S_diag[1:2 * M:2] + R_pix))
        w_pix = w * (chi2 < cfg.chi2_gate).astype(dtype)
        if use_d:
            r_d = obs_depth - pred[2 * M:]
            chi2_d = r_d * r_d / (S_diag[2 * M:] + R_dep)
            w_d = (w_pix * (obs_depth > 0)
                   * (chi2_d < cfg.depth_chi2_gate).astype(dtype))
            r = jnp.concatenate([r_uv, r_d])
            w_rows = jnp.concatenate([jnp.repeat(w_pix, 2), w_d])
            R_rows = jnp.concatenate([jnp.full((2 * M,), R_pix, dtype),
                                      jnp.full((M,), R_dep, dtype)])
        else:
            r = r_uv
            w_rows = jnp.repeat(w_pix, 2)
            R_rows = jnp.full((2 * M,), R_pix, dtype)
        R_eff = jnp.where(w_rows > 0, R_rows, big)
        return r, H, HP, R_eff, dx_i

    def one_iter(_, s_i):
        r, H, HP, R_eff, dx_i = measurement(s_i)
        S = HP @ H.T + jnp.diag(R_eff)
        K = jnp.linalg.solve(S, HP).T
        # IEKF (Bell–Cathey): minimize ‖dx‖²_{P0} + ‖z − h(s0⊞dx)‖²_R with h
        # linearized at the current iterate: dx* = K (r + H·dx_i).
        return _retract(cfg, s0, K @ (r + H @ dx_i))

    s_new = jax.lax.fori_loop(0, cfg.update_iters, one_iter, s)

    # Covariance update (Joseph) at the final linearization point.
    r, H, HP, R_eff, _ = measurement(s_new)
    S = HP @ H.T + jnp.diag(R_eff)
    K = jnp.linalg.solve(S, HP).T
    I_KH = jnp.eye(D, dtype=dtype) - K @ H
    cov = I_KH @ s0.cov @ I_KH.T + K @ jnp.diag(R_eff) @ K.T
    return s_new._replace(cov=0.5 * (cov + cov.T))


@estimation_precision
def depth_update(
    cfg: VioConfig,
    s: VioState,
    obs_depth: jnp.ndarray,     # (M,) LiDAR depth at the PREDICTED pixels
) -> VioState:
    """Standalone per-landmark LiDAR range update (camera-axis depth) —
    the continuous useDepthFromLiDAR scale anchor for the photometric
    pipeline, where there is no tracked-pixel measurement to piggyback on
    (the geometric path fuses these rows jointly inside :func:`update`).
    Same model: z = depth, h(x) = camera-frame z of the landmark; χ²-gated
    per row, masked rows get effectively infinite variance."""
    dtype = s.pose.dtype
    M = cfg.num_landmarks
    D = _dim(cfg)
    R_dep = cfg.depth_sigma_update ** 2
    big = jnp.asarray(1e12, dtype)
    s0 = s

    def h_of(dx):
        return _predict_cam_z(cfg, _retract(cfg, s0, dx))

    dx0 = jnp.zeros((D,), dtype)
    pred = h_of(dx0)
    H = jax.jacfwd(h_of)(dx0)                        # (M, D)
    _, vis = _predict_pixels(cfg, s0)
    r = obs_depth - pred
    HP = H @ s0.cov
    S_diag = jnp.einsum("md,md->m", HP, H)
    chi2 = r * r / (S_diag + R_dep)
    w = (s.lm_valid * vis.astype(dtype) * (obs_depth > 0)
         * (chi2 < cfg.depth_chi2_gate).astype(dtype))
    R_eff = jnp.where(w > 0, R_dep, big)
    S = HP @ H.T + jnp.diag(R_eff)
    K = jnp.linalg.solve(S, HP).T
    s_new = _retract(cfg, s0, K @ r)
    I_KH = jnp.eye(D, dtype=dtype) - K @ H
    cov = I_KH @ s0.cov @ I_KH.T + K @ jnp.diag(R_eff) @ K.T
    return s_new._replace(cov=0.5 * (cov + cov.T))


@estimation_precision
def gravity_update(
    cfg: VioConfig,
    s: VioState,
    accel_mean: jnp.ndarray,    # (3,) window-mean raw accelerometer reading
    is_static: jnp.ndarray | float = 1.0,   # no-motion detector verdict
) -> VioState:
    """Accelerometer-referenced roll/pitch pseudo-measurement (see
    VioConfig.use_gravity_update — STATIONARY-mode only). Measurement
    model: z = accel_mean, h(x) = b_a + g·Rᵀe_z; applied only when the
    no-motion detector fires AND ‖accel_mean − b_a‖ is within
    ``gravity_accel_gate`` of g (masked rows get effectively infinite
    variance, exactly like gated features in :func:`update`)."""
    dtype = s.pose.dtype
    D = s.cov.shape[0]
    e_z = jnp.array([0.0, 0.0, 1.0], dtype)
    R = lie.quat_to_rot(lie.pose_quat(s.pose))
    u = R.T @ e_z                              # gravity direction in body
    ba = s.bias[:3]
    pred = ba + cfg.gravity * u
    r = accel_mean - pred

    # Static + low-dynamics gate, PLUS the filter's own velocity
    # Mahalanobis check (the same protection zero_velocity_update has):
    # window IMU statistics cannot distinguish standstill from smooth
    # cruise — a 0.125 m/s² lane-weave at 4 m/s reads as "static"
    # (mean|ω|≈0, std‖f‖≈0, ‖f‖≈g) yet carries vehicle acceleration the
    # gravity model would misread as ~0.7° of roll, a time-correlated
    # odometry bias that compounded to ~7× fused ATE over a 345 s soak.
    # A filter confident it is MOVING must reject the stationary-gravity
    # interpretation regardless of how quiet the IMU window looks.
    f_norm = jnp.linalg.norm(accel_mean - ba)
    P_vv = s.cov[6:9, 6:9]
    S_v = P_vv + cfg.zuv_sigma ** 2 * jnp.eye(3, dtype=dtype)
    chi2_v = s.vel @ jnp.linalg.solve(S_v, s.vel)
    ok = ((jnp.abs(f_norm - cfg.gravity) < cfg.gravity_accel_gate)
          & (chi2_v < cfg.zuv_chi2_gate)
          & (jnp.asarray(is_static, dtype) > 0)).astype(dtype)
    big = jnp.asarray(1e12, dtype)
    R_eff = jnp.where(ok > 0, cfg.gravity_sigma ** 2, big) \
        * jnp.ones((3,), dtype)

    # h(x ⊞ dx): right-perturbation R ← R·Exp(δθ) gives
    # h ≈ pred + g·[u]× δθ + δb_a.
    H = jnp.zeros((3, D), dtype)
    H = H.at[:, 0:3].set(cfg.gravity * lie.hat(u))
    H = H.at[:, 9:12].set(jnp.eye(3, dtype=dtype))

    HP = H @ s.cov
    S = HP @ H.T + jnp.diag(R_eff)
    K = jnp.linalg.solve(S, HP).T
    s_new = _retract(cfg, s, K @ r)
    I_KH = jnp.eye(D, dtype=dtype) - K @ H
    cov = I_KH @ s.cov @ I_KH.T + K @ jnp.diag(R_eff) @ K.T
    return s_new._replace(cov=0.5 * (cov + cov.T))


@estimation_precision
def zero_velocity_update(
    cfg: VioConfig,
    s: VioState,
    is_static: jnp.ndarray,       # scalar 0/1 motion-detection verdict
) -> VioState:
    """ROVIO's ZeroVelocityUpdate: measure v = 0 when the motion detector
    says the platform is static AND the measurement passes the
    Mahalanobis check (cfg.zuv_chi2_gate — see config comment: the χ²
    gate is what stops smooth constant-velocity motion, which is
    IMU-indistinguishable from standstill, from being dragged to zero).
    Gated rows get effectively infinite variance (same masking pattern as
    the other updates)."""
    dtype = s.pose.dtype
    D = s.cov.shape[0]
    big = jnp.asarray(1e12, dtype)
    H = jnp.zeros((3, D), dtype).at[:, 6:9].set(jnp.eye(3, dtype=dtype))
    r = -s.vel
    HP = H @ s.cov
    S_nom = HP @ H.T + cfg.zuv_sigma ** 2 * jnp.eye(3, dtype=dtype)
    chi2 = r @ jnp.linalg.solve(S_nom, r)
    ok = (is_static > 0) & (chi2 < cfg.zuv_chi2_gate)
    R_eff = jnp.where(ok, cfg.zuv_sigma ** 2, big) * jnp.ones((3,), dtype)
    S = HP @ H.T + jnp.diag(R_eff)
    K = jnp.linalg.solve(S, HP).T
    s_new = _retract(cfg, s, K @ r)
    I_KH = jnp.eye(D, dtype=dtype) - K @ H
    cov = I_KH @ s.cov @ I_KH.T + K @ jnp.diag(R_eff) @ K.T
    return s_new._replace(cov=0.5 * (cov + cov.T))


def detect_no_motion(cfg: VioConfig, accel, gyro, dts) -> jnp.ndarray:
    """Window-level motion detection (ROVIO MotionDetection block): static
    iff mean |ω| and the std of ‖accel‖ are both under threshold."""
    live = (dts > 0).astype(accel.dtype)
    n = jnp.maximum(jnp.sum(live), 1.0)
    gyro_mag = jnp.linalg.norm(gyro, axis=-1)
    mean_w = jnp.sum(gyro_mag * live) / n
    a_mag = jnp.linalg.norm(accel, axis=-1)
    mean_a = jnp.sum(a_mag * live) / n
    var_a = jnp.sum((a_mag - mean_a) ** 2 * live) / n
    return ((mean_w < cfg.zuv_gyro_th)
            & (jnp.sqrt(var_a) < cfg.zuv_accel_th)).astype(accel.dtype)


def _boxminus(cfg: VioConfig, s_a: VioState, s_b: VioState) -> jnp.ndarray:
    """Error vector of a relative to b (right convention)."""
    dq = lie.quat_log(lie.quat_mul(
        lie.quat_conjugate(lie.pose_quat(s_b.pose)), lie.pose_quat(s_a.pose)))
    return jnp.concatenate([
        dq,
        lie.pose_trans(s_a.pose) - lie.pose_trans(s_b.pose),
        s_a.vel - s_b.vel,
        s_a.bias - s_b.bias,
        (s_a.landmarks - s_b.landmarks).reshape(-1),
    ])


# ---------------------------------------------------------------------------
# Landmark lifecycle
# ---------------------------------------------------------------------------

@estimation_precision
def init_landmark(
    cfg: VioConfig,
    s: VioState,
    slot: jnp.ndarray,
    uv: jnp.ndarray,
    depth: jnp.ndarray,
    depth_sigma: jnp.ndarray,
    enable: jnp.ndarray,
) -> VioState:
    """(Re-)initialize landmark ``slot`` from a pixel + depth — the
    useDepthFromLiDAR path (rovio.cfg:133-138): depth from the LiDAR sweep,
    pixel from the tracker. Covariance rows/cols of the slot are reset from
    the backprojection Jacobian; cross terms to the pose are kept zero
    (conservative, consistent)."""
    dtype = s.pose.dtype
    pose_wc = lie.pose_compose(s.pose, jnp.asarray(cfg.pose_ic, dtype))
    p_cam = C.backproject(cfg.cam, uv, depth)
    l_w = lie.quat_rotate(lie.pose_quat(pose_wc), p_cam) \
        + lie.pose_trans(pose_wc)

    # J of l_w wrt (u, v, depth)
    def bp(x):
        return lie.quat_rotate(
            lie.pose_quat(pose_wc), C.backproject(cfg.cam, x[:2], x[2]))

    x0 = jnp.concatenate([uv, depth[None]])
    J = jax.jacfwd(bp)(x0)
    Rm = jnp.diag(jnp.array([cfg.pixel_sigma ** 2, cfg.pixel_sigma ** 2,
                             1.0], dtype) * jnp.array([1.0, 1.0, depth_sigma ** 2], dtype))
    P_l = J @ Rm @ J.T + 1e-6 * jnp.eye(3, dtype=dtype)

    i = IMU_DIM + 3 * slot
    e = enable.astype(dtype)
    lm = s.landmarks.at[slot].set(e * l_w + (1 - e) * s.landmarks[slot])
    valid = s.lm_valid.at[slot].set(
        jnp.where(enable, 1.0, s.lm_valid[slot]))

    D = _dim(cfg)
    cov = s.cov
    # Zero the slot's rows/cols, then set the block — only when enabled.
    row_idx = i + jnp.arange(3)
    mask = jnp.any(
        jnp.arange(D)[None, :] == row_idx[:, None], axis=0).astype(dtype)
    keep = 1.0 - e * mask
    cov = cov * keep[None, :] * keep[:, None]
    cov = jax.lax.dynamic_update_slice(
        cov,
        e * P_l + (1 - e) * jax.lax.dynamic_slice(cov, (i, i), (3, 3)),
        (i, i))
    return s._replace(landmarks=lm, lm_valid=valid, cov=cov)


@estimation_precision
def twist_covariance(cfg: VioConfig, s: VioState) -> jnp.ndarray:
    """6×6 twist covariance (v_body, ω_body) in nav_msgs order
    (vx,vy,vz, wx,wy,wz) — the block the reference copies verbatim into the
    between-factor noise when use_odom_covariance is set (poseDiff copies
    after->twist.covariance, SensorManagerRos.cpp:154-156). Linear part:
    the filter's world-frame velocity marginal rotated into the body frame
    (nav_msgs twist is child-frame). Angular part: rate = gyro − b_g, so
    the gyro white noise plus the current gyro-bias marginal."""
    dtype = s.pose.dtype
    q = lie.pose_quat(s.pose)
    R = jax.vmap(lambda e: lie.quat_rotate(q, e))(
        jnp.eye(3, dtype=dtype)).T            # columns = rotated basis
    Pv = s.cov[6:9, 6:9]
    Pv_body = R.T @ Pv @ R
    Pw = s.cov[12:15, 12:15] + cfg.cov_gyro * jnp.eye(3, dtype=dtype)
    out = jnp.zeros((6, 6), dtype)
    out = out.at[:3, :3].set(Pv_body)
    out = out.at[3:, 3:].set(Pw)
    return out


def pose_covariance(cfg: VioConfig, s: VioState) -> jnp.ndarray:
    """6×6 pose covariance in (trans, rot) order — the block the degeneracy
    metrics consume from /rovio/odometry (degeneracy_detection.py:82-113)."""
    P = s.cov[:6, :6]
    # internal order (θ, p) → output (p, θ)
    out = jnp.zeros_like(P)
    out = out.at[:3, :3].set(P[3:6, 3:6])
    out = out.at[3:6, 3:6].set(P[0:3, 0:3])
    out = out.at[:3, 3:6].set(P[3:6, 0:3])
    out = out.at[3:6, :3].set(P[0:3, 3:6])
    return out
