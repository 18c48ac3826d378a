"""Fixed-lag factor-graph smoother — the TPU-native replacement for the
reference's GTSAM iSAM2 back-end (gtsam_fusion/src/gtsam_fusion/GraphManager.cpp).

Design (SURVEY.md §7 item 3): instead of incremental sparse factorization
(iSAM2, host-sequential by construction) we keep a **fixed-size window of W
keyframe states** and run on-manifold Gauss-Newton with a dense marginal
prior. Sliding the window Schur-eliminates the oldest state *with exactly the
factors in its Markov blanket*, folding their information into the dense
prior — statistically the same marginal the reference's smoother maintains,
but with every step a static-shape jitted computation:

- the whole estimator state is one pytree of fixed-shape arrays,
- ``add_keyframe`` / ``add_between`` / ``solve`` are pure functions,
- an entire trajectory run is ``lax.scan(step, state, timeline)``.

Semantics replicated from the reference:
- priors on the initial X/V/B with the ctor's sigmas (GraphManager.cpp:26-31),
- one CombinedImuFactor per consecutive keyframe pair, created at node
  reservation time (GraphManager.cpp:56-66),
- SE(3) between-factors from any odometry source attached to arbitrary
  (older_key → newer_key) pairs (GraphManager.cpp:83-88),
- IMU-predicted initial values for new states (emptyImuQueue,
  GraphManager.cpp:143-162).

Matrix sizes: D = W·15 (≤ 240 for W=16), so the normal-equation solve is a
small dense Cholesky — tiny per step, and the batched/vmapped evaluation
path (many bags / segments in parallel) is where the TPU earns its keep.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core import preintegration as pre
from . import factors as F
from .._precision import estimation_precision

STATE_DIM = F.STATE_DIM


class SmootherConfig(NamedTuple):
    """Static configuration (all fields shape-determining or numeric)."""

    window: int = 8                  # W keyframes kept live
    between_slots: int = 16          # pool size for active between-factors
    unary_slots: int = 8             # pool size for absolute pose anchors
    gn_iters: int = 8                # Gauss-Newton iterations per solve
    damping: float = 1e-9            # Levenberg damping added to H's diagonal
    # Per-factor information ceiling: any factor whose information matrix has
    # a diagonal entry above this is scaled down to it. Claims of information
    # beyond ~1e6 are numerically meaningless in f32 (the TPU compute dtype)
    # and only destroy the conditioning of the normal equations; the
    # reference's GTSAM runs in f64 where its hardcoded 1e-6-sigma priors
    # (GraphManager.cpp:26-31) are representable.
    info_cap: float = 1e6
    # Initial prior sigmas — reference hardcodes these in the GraphManager
    # ctor (GraphManager.cpp:26-31): rot 1e-6 rad, trans 5e-5 m, vel 1e-5,
    # bias 1e-7.
    prior_rot_sigma: float = 1e-6
    prior_trans_sigma: float = 5e-5
    prior_vel_sigma: float = 1e-5
    prior_bias_sigma: float = 1e-7
    imu: pre.ImuParams = pre.ImuParams()


class SmootherState(NamedTuple):
    """Complete smoother state: one fixed-shape pytree (scan-carry safe)."""

    states: F.KeyframeStates          # current estimates, (W, ·)
    times: jnp.ndarray                # (W,) keyframe times
    key0: jnp.ndarray                 # global key index of window slot 0
    # Dense marginal prior in tangent space around `prior_lin`:
    #   E(x) ≈ const + g·δ + ½ δᵀ H δ,  δ = x ⊟ prior_lin  (stacked (W·15,))
    prior_H: jnp.ndarray              # (D, D)
    prior_g: jnp.ndarray              # (D,)
    prior_lin: F.KeyframeStates
    # IMU factor slots: slot s connects keyframes (s, s+1).
    imu: pre.PreintegratedImu         # stacked, leading dim W-1
    imu_valid: jnp.ndarray            # (W-1,)
    # Between-factor pool (ring buffer).
    btw_i: jnp.ndarray                # (B,) int32, window-relative older key
    btw_j: jnp.ndarray                # (B,) int32, window-relative newer key
    btw_meas: jnp.ndarray             # (B, 7) measured relative pose
    btw_info: jnp.ndarray             # (B, 6, 6) information (Σ⁻¹)
    btw_valid: jnp.ndarray            # (B,)
    btw_next: jnp.ndarray             # scalar int32 ring pointer
    # Unary absolute-pose anchor pool (PriorFactor<Pose3> ring buffer):
    # the map-anchored measurements (scan-to-map world poses) that bound
    # the fused trajectory to the voxel map's frame.
    una_slot: jnp.ndarray             # (U,) int32 window-relative key
    una_meas: jnp.ndarray             # (U, 7) measured absolute pose
    una_info: jnp.ndarray             # (U, 6, 6) information
    una_valid: jnp.ndarray            # (U,)
    una_next: jnp.ndarray             # scalar int32 ring pointer


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------

def _cap_info(info: jnp.ndarray, cap: float) -> jnp.ndarray:
    """Scale an information matrix down so its max diagonal ≤ cap (keeps the
    factor's internal structure; only its overall confidence saturates)."""
    d = jnp.max(jnp.diagonal(info, axis1=-2, axis2=-1), axis=-1)
    s = jnp.minimum(1.0, cap / jnp.maximum(d, 1e-30))
    return info * s[..., None, None]


def _jacobi_solve(H: jnp.ndarray, b: jnp.ndarray, lam) -> jnp.ndarray:
    """Solve H x = b with Jacobi (diagonal) preconditioning — the factor
    information spans ~8 orders of magnitude, which plain f32 Cholesky/LU
    cannot survive; symmetric diagonal scaling restores it.

    The scaled system is symmetric PSD (GN normal matrix + marginal prior)
    with unit diagonal plus lam·I, so Cholesky applies — measured 2×
    faster than the pivoted LU of ``jnp.linalg.solve`` at the window size
    (52 vs 103 µs per 90×90 solve inside the engine scan, v5e)."""
    d = jnp.sqrt(jnp.clip(jnp.diagonal(H), 1e-12, None))
    s = 1.0 / d
    Hs = H * s[:, None] * s[None, :]
    Hs = Hs + lam * jnp.eye(H.shape[0], dtype=H.dtype)
    L = jnp.linalg.cholesky(Hs)
    y = jax.lax.linalg.triangular_solve(L, (s * b)[:, None],
                                        left_side=True, lower=True)
    x = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                        transpose_a=True)
    return s * x[:, 0]


def _imu_scatter_const(W: int, dtype) -> jnp.ndarray:
    """(W-1, D, 30) constant selection tensor: slot s maps its 30-dim
    (state_s, state_{s+1}) tangent block onto rows [s·15, (s+2)·15) of the
    stacked window vector. Compile-time constant under jit."""
    import numpy as np

    S = STATE_DIM
    P = np.zeros((W - 1, W * S, 2 * S), np.float64)
    for s_ in range(W - 1):
        P[s_, s_ * S:(s_ + 2) * S, :] = np.eye(2 * S)
    return jnp.asarray(P, dtype)


def _state_prior_info(cfg: SmootherConfig, dtype) -> jnp.ndarray:
    """15x15 information of the initial prior (tangent order rho,theta,v,b)."""
    sig = jnp.array(
        [cfg.prior_trans_sigma] * 3 + [cfg.prior_rot_sigma] * 3
        + [cfg.prior_vel_sigma] * 3 + [cfg.prior_bias_sigma] * 6,
        dtype=dtype,
    )
    return jnp.diag(jnp.minimum(1.0 / (sig * sig),
                                jnp.asarray(cfg.info_cap, dtype)))


def _empty_pim(cfg: SmootherConfig, n: int, dtype) -> pre.PreintegratedImu:
    """Stack of n zero (invalid) preintegration results."""
    def z(*shape):
        return jnp.zeros((n,) + shape, dtype=dtype)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3))
    return pre.PreintegratedImu(
        delta_t=z(), delta_R=eye, delta_v=z(3), delta_p=z(3),
        cov=z(9, 9), dR_dbg=z(3, 3), dv_dba=z(3, 3), dv_dbg=z(3, 3),
        dp_dba=z(3, 3), dp_dbg=z(3, 3), bias_hat=z(6),
    )


def init(
    cfg: SmootherConfig,
    pose0: jnp.ndarray,
    vel0: jnp.ndarray,
    bias0: jnp.ndarray,
    t0: jnp.ndarray,
) -> SmootherState:
    """Initialize the window with W pinned copies of the initial state.

    Warm-up trick: rather than masking a partially-filled window (dynamic
    shapes), every slot starts as a duplicate of the initial state pinned by
    the initial prior. Each duplicate is uncoupled from the others, so
    sliding one out marginalizes exactly its own prior — the estimator is
    identical to the reference's single-prior graph once real keyframes fill
    the window.
    """
    dtype = pose0.dtype
    W = cfg.window
    D = W * STATE_DIM
    B = cfg.between_slots

    states = F.KeyframeStates(
        poses=jnp.broadcast_to(pose0, (W, 7)).astype(dtype),
        vels=jnp.broadcast_to(vel0, (W, 3)).astype(dtype),
        biases=jnp.broadcast_to(bias0, (W, 6)).astype(dtype),
    )
    info15 = _state_prior_info(cfg, dtype)
    prior_H = jnp.zeros((D, D), dtype=dtype)
    for s in range(W):
        prior_H = prior_H.at[
            s * STATE_DIM:(s + 1) * STATE_DIM, s * STATE_DIM:(s + 1) * STATE_DIM
        ].set(info15)

    return SmootherState(
        states=states,
        times=jnp.full((W,), t0, dtype=dtype),
        key0=jnp.zeros((), jnp.int32),
        prior_H=prior_H,
        prior_g=jnp.zeros((D,), dtype=dtype),
        prior_lin=states,
        imu=_empty_pim(cfg, W - 1, dtype),
        imu_valid=jnp.zeros((W - 1,), dtype=dtype),
        btw_i=jnp.zeros((B,), jnp.int32),
        btw_j=jnp.zeros((B,), jnp.int32),
        btw_meas=jnp.broadcast_to(lie.pose_identity(dtype), (B, 7)),
        btw_info=jnp.zeros((B, 6, 6), dtype=dtype),
        btw_valid=jnp.zeros((B,), dtype=dtype),
        btw_next=jnp.zeros((), jnp.int32),
        una_slot=jnp.zeros((cfg.unary_slots,), jnp.int32),
        una_meas=jnp.broadcast_to(lie.pose_identity(dtype),
                                  (cfg.unary_slots, 7)),
        una_info=jnp.zeros((cfg.unary_slots, 6, 6), dtype=dtype),
        una_valid=jnp.zeros((cfg.unary_slots,), dtype=dtype),
        una_next=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Linearization / assembly of the normal equations
# ---------------------------------------------------------------------------

def _gravity_vec(cfg: SmootherConfig, dtype):
    return jnp.array([0.0, 0.0, -cfg.imu.gravity], dtype=dtype)


def _linearize_imu_slots(cfg: SmootherConfig, s: SmootherState, x: F.KeyframeStates):
    """vmapped linearization of all W-1 consecutive IMU factors."""
    g = _gravity_vec(cfg, x.poses.dtype)

    def one(pose_i, vel_i, bias_i, pose_j, vel_j, bias_j, pim):
        return F.linearize_imu_factor(
            pose_i, vel_i, bias_i, pose_j, vel_j, bias_j, pim, g)

    r, A_i, A_j = jax.vmap(one)(
        x.poses[:-1], x.vels[:-1], x.biases[:-1],
        x.poses[1:], x.vels[1:], x.biases[1:],
        s.imu,
    )
    cov15 = jax.vmap(lambda p: pre.combined_covariance_15(p, cfg.imu))(s.imu)
    # Invalid slots have zero covariance — jitter makes the inverse finite,
    # and the validity mask zeroes the information afterwards.
    info = F.info_from_cov(cov15, jitter=1e-12)
    info = _cap_info(info, cfg.info_cap)
    info = info * s.imu_valid[:, None, None]
    return r, A_i, A_j, info


def _linearize_between_slots(s: SmootherState, x: F.KeyframeStates):
    """vmapped linearization of the between-factor pool."""
    W = x.poses.shape[0]
    ic = jnp.clip(s.btw_i, 0, W - 1)
    jc = jnp.clip(s.btw_j, 0, W - 1)

    def one(i, j, meas):
        return F.linearize_between_factor(x.poses[i], x.poses[j], meas)

    r, A_i, A_j = jax.vmap(one)(ic, jc, s.btw_meas)
    info = s.btw_info * s.btw_valid[:, None, None]
    return r, A_i, A_j, info


def _linearize_unary_slots(s: SmootherState, x: F.KeyframeStates):
    """vmapped linearization of the absolute-pose anchor pool."""
    W = x.poses.shape[0]
    kc = jnp.clip(s.una_slot, 0, W - 1)

    def one(k, meas):
        return F.linearize_pose_prior(x.poses[k], meas)

    r, A = jax.vmap(one)(kc, s.una_meas)
    info = s.una_info * s.una_valid[:, None, None]
    return r, A, info


def _assemble(
    cfg: SmootherConfig,
    s: SmootherState,
    x: F.KeyframeStates,
    include_prior: bool = True,
    imu_mask: jnp.ndarray | None = None,
    btw_mask: jnp.ndarray | None = None,
    una_mask: jnp.ndarray | None = None,
):
    """Build dense normal equations (H, b) of all active factors at x.

    b is the gradient: b = Σ AᵀΛ r (+ prior gradient), so the GN step is
    dx = -(H + λI)⁻¹ b.
    """
    dtype = x.poses.dtype
    W = x.poses.shape[0]
    D = W * STATE_DIM
    H = jnp.zeros((D, D), dtype=dtype)
    b = jnp.zeros((D,), dtype=dtype)

    if include_prior:
        d0 = F.local_window(s.prior_lin, x).reshape(-1)
        H = H + s.prior_H
        b = b + s.prior_g + s.prior_H @ d0

    # --- IMU factors: consecutive pairs, static block offsets -------------
    # Assembled as ONE dense contraction against a constant block-selection
    # tensor instead of a fori_loop of dynamic-slice updates: the loop was
    # ~20 serial tiny ops per slot (pure latency on TPU); the einsum is two
    # fused matmuls on the MXU.
    r, A_i, A_j, info = _linearize_imu_slots(cfg, s, x)
    if imu_mask is not None:
        info = info * imu_mask[:, None, None]
    A = jnp.concatenate([A_i, A_j], axis=-1)            # (W-1, 15, 30)
    Hc = jnp.einsum("sri,srq,sqk->sik", A, info, A)      # (W-1, 30, 30)
    bc = jnp.einsum("sri,srq,sq->si", A, info, r)        # (W-1, 30)

    P = _imu_scatter_const(W, dtype)                     # (W-1, D, 30)
    H = H + jnp.einsum("sdi,sij,sej->de", P, Hc, P)
    b = b + jnp.einsum("sdi,si->d", P, bc)

    # --- Between factors: arbitrary (i, j) pairs ---------------------------
    # Same idea with *dynamic* offsets: build one-hot column-selection
    # matrices from the slot indices and expand each 6x15 Jacobian to its
    # 6xD row in a batched matmul — no serial scatter at all. (For a slot
    # with i == j the expanded Jacobian is the sum A_i + A_j at that block,
    # algebraically identical to the four-block update.)
    rb, B_i, B_j, binfo = _linearize_between_slots(s, x)
    if btw_mask is not None:
        binfo = binfo * btw_mask[:, None, None]
    iw = jnp.clip(s.btw_i, 0, W - 1)
    jw = jnp.clip(s.btw_j, 0, W - 1)
    d_idx = jnp.arange(D)
    k15 = jnp.arange(STATE_DIM)
    Mi = (d_idx[None, :, None]
          == (iw * STATE_DIM)[:, None, None] + k15[None, None, :]
          ).astype(dtype)                                # (B, D, 15)
    Mj = (d_idx[None, :, None]
          == (jw * STATE_DIM)[:, None, None] + k15[None, None, :]
          ).astype(dtype)
    Afull = (jnp.einsum("brk,bdk->brd", B_i, Mi)
             + jnp.einsum("brk,bdk->brd", B_j, Mj))      # (B, 6, D)
    Lr = jnp.einsum("brq,bq->br", binfo, rb)
    H = H + jnp.einsum("brd,brq,bqe->de", Afull, binfo, Afull)
    b = b + jnp.einsum("brd,br->d", Afull, Lr)

    # --- Unary absolute anchors: same one-hot expansion, single endpoint --
    ru, U_A, uinfo = _linearize_unary_slots(s, x)
    if una_mask is not None:
        uinfo = uinfo * una_mask[:, None, None]
    kw = jnp.clip(s.una_slot, 0, W - 1)
    Mk = (d_idx[None, :, None]
          == (kw * STATE_DIM)[:, None, None] + k15[None, None, :]
          ).astype(dtype)                                # (U, D, 15)
    Ufull = jnp.einsum("urk,udk->urd", U_A, Mk)          # (U, 6, D)
    H = H + jnp.einsum("urd,urq,uqe->de", Ufull, uinfo, Ufull)
    b = b + jnp.einsum("urd,urq,uq->d", Ufull, uinfo, ru)
    return H, b


# ---------------------------------------------------------------------------
# Solve (Gauss-Newton with fixed iteration count — jit/scan friendly)
# ---------------------------------------------------------------------------

@estimation_precision
def solve(cfg: SmootherConfig, s: SmootherState) -> SmootherState:
    """Run cfg.gn_iters Gauss-Newton iterations, relinearizing each time.

    Replaces GraphManager::solve (GraphManager.cpp:101-141): where the
    reference calls _isam2.update + calculateEstimate, we re-solve the
    fixed-lag window to (numerical) convergence — same MAP estimate the
    incremental solver tracks.
    """
    dtype = s.states.poses.dtype
    W = s.states.poses.shape[0]
    lam = jnp.asarray(cfg.damping, dtype)

    def it(_, x):
        H, b = _assemble(cfg, s, x)
        dx = -_jacobi_solve(H, b, lam)
        return F.retract_window(x, dx.reshape(W, STATE_DIM))

    x = jax.lax.fori_loop(0, cfg.gn_iters, it, s.states)
    return s._replace(states=x)


@estimation_precision
def cost(cfg: SmootherConfig, s: SmootherState) -> jnp.ndarray:
    """Total weighted squared error at the current estimates (diagnostics)."""
    x = s.states
    d0 = F.local_window(s.prior_lin, x).reshape(-1)
    c = 0.5 * d0 @ s.prior_H @ d0 + s.prior_g @ d0
    r, _, _, info = _linearize_imu_slots(cfg, s, x)
    c = c + 0.5 * jnp.einsum("sr,srq,sq->", r, info, r)
    rb, _, _, binfo = _linearize_between_slots(s, x)
    c = c + 0.5 * jnp.einsum("sr,srq,sq->", rb, binfo, rb)
    ru, _, uinfo = _linearize_unary_slots(s, x)
    c = c + 0.5 * jnp.einsum("sr,srq,sq->", ru, uinfo, ru)
    return c


# ---------------------------------------------------------------------------
# Window management
# ---------------------------------------------------------------------------

def _shift_pim(pim: pre.PreintegratedImu, new_last: pre.PreintegratedImu):
    """Drop slot 0, append new_last at the end (leading axis = slots)."""
    def sh(a, n):
        return jnp.concatenate([a[1:], n[None]], axis=0)
    return jax.tree_util.tree_map(sh, pim, new_last)


@estimation_precision
def add_keyframe(
    cfg: SmootherConfig,
    s: SmootherState,
    t_new: jnp.ndarray,
    pim: pre.PreintegratedImu,
) -> SmootherState:
    """Slide the window and append a keyframe at time t_new.

    Combines the reference's reserveNode (GraphManager.cpp:51-69: new key +
    CombinedImuFactor from the IMU buffer) with fixed-lag marginalization
    (which iSAM2 does implicitly by keeping all history; we keep the exact
    marginal of the evicted state instead).

    ``pim`` must be the preintegration over (times[-1], t_new], computed with
    the *current last-state bias* as linearization point — mirroring
    getFactor(_lastPoseTime, time, getBias()) at GraphManager.cpp:60.
    """
    dtype = s.states.poses.dtype
    W = cfg.window
    D = W * STATE_DIM
    x = s.states

    # ---- 1. Linearize the Markov blanket of slot 0 ------------------------
    # The elimination is carried out in the PRIOR's frozen coordinates
    # (first-estimates / FEJ policy). The stored prior quadratic
    #   E(δ) = g·δ + ½ δᵀHδ,  δ = x' ⊟ prior_lin
    # is used AS IS — never re-centered. The blanket factors are linearized
    # at the current estimates x (full relinearization, matching the
    # reference's iSAM2 relinearizeSkip=1, GraphManager.cpp:39-41) and then
    # expressed in the prior's coordinates via the J≈I chart change
    #   r(x') ≈ r(x) + A·(δ' − d0),   δ' = x' ⊟ prior_lin,  d0 = x ⊟ prior_lin
    # i.e. H_f unchanged, g_f = AᵀΛr − H_f·d0. Each factor pays this O(‖d0‖²)
    # manifold approximation exactly ONCE — at its eviction. The previous
    # scheme instead re-centered the whole accumulated prior at the shifted
    # current estimates every slide (g ← g + H·d0, lin ← x), compounding the
    # chart-change error across the dense prior once per keyframe; measured
    # effect: ATE-vs-batch grew with the window (0.024 m @ W=4 → 0.055 m
    # @ W=10, ORACLE.json r4) — the opposite of correct marginalization.
    d0 = F.local_window(s.prior_lin, x).reshape(-1)
    # IMU factor slot 0 only:
    imu_mask = jnp.zeros((W - 1,), dtype).at[0].set(1.0)
    # Between factors with i == 0:
    btw_mask = (s.btw_i == 0).astype(dtype) * s.btw_valid
    # Unary anchors on slot 0:
    una_mask = (s.una_slot == 0).astype(dtype) * s.una_valid
    H_t, b_t = _assemble(
        cfg, s, x, include_prior=False,
        imu_mask=imu_mask * s.imu_valid,
        btw_mask=btw_mask,
        una_mask=una_mask,
    )
    H_m = s.prior_H + H_t
    b_m = s.prior_g + b_t - H_t @ d0

    # ---- 2. Schur-eliminate the first 15 rows/cols ------------------------
    Hmm = H_m[:STATE_DIM, :STATE_DIM]
    Hmr = H_m[:STATE_DIM, STATE_DIM:]
    Hrr = H_m[STATE_DIM:, STATE_DIM:]
    bm = b_m[:STATE_DIM]
    br = b_m[STATE_DIM:]
    # Jacobi-scaled Schur elimination (same conditioning issue as solve()).
    dmm = jnp.sqrt(jnp.clip(jnp.diagonal(Hmm), 1e-12, None))
    smm = 1.0 / dmm
    Hmm_s = Hmm * smm[:, None] * smm[None, :] \
        + 1e-7 * jnp.eye(STATE_DIM, dtype=dtype)
    rhs = jnp.concatenate([Hmr, bm[:, None]], axis=1) * smm[:, None]
    # Cholesky (SPD after scaling + damping) — same swap as _jacobi_solve.
    Lmm = jnp.linalg.cholesky(Hmm_s)
    K_y = jax.lax.linalg.triangular_solve(Lmm, rhs, left_side=True,
                                          lower=True)
    K = smm[:, None] * jax.lax.linalg.triangular_solve(
        Lmm, K_y, left_side=True, lower=True, transpose_a=True)
    S = Hrr - Hmr.T @ K[:, :-1]
    gs = br - Hmr.T @ K[:, -1]

    # ---- 3. Shift window down by one --------------------------------------
    def shift_states(st: F.KeyframeStates, new_pose, new_vel, new_bias):
        return F.KeyframeStates(
            poses=jnp.concatenate([st.poses[1:], new_pose[None]], axis=0),
            vels=jnp.concatenate([st.vels[1:], new_vel[None]], axis=0),
            biases=jnp.concatenate([st.biases[1:], new_bias[None]], axis=0),
        )

    # New state initialized by IMU prediction from the (old) last state —
    # emptyImuQueue's predict-forward insert (GraphManager.cpp:148-158).
    pose_prev = x.poses[-1]
    vel_prev = x.vels[-1]
    bias_prev = x.biases[-1]
    pose_new, vel_new = pre.predict(pim, pose_prev, vel_prev, bias_prev, cfg.imu)
    states_new = shift_states(x, pose_new, vel_new, bias_prev)

    prior_H_new = jnp.zeros((D, D), dtype=dtype)
    prior_H_new = prior_H_new.at[: D - STATE_DIM, : D - STATE_DIM].set(S)
    prior_g_new = jnp.zeros((D,), dtype=dtype)
    prior_g_new = prior_g_new.at[: D - STATE_DIM].set(gs)
    # First-estimates policy: the surviving slots KEEP their frozen prior
    # linearization points (the Schur result S/gs is expressed around them);
    # only the brand-new slot gets its lin point set — to its IMU-predicted
    # entry value, which is then frozen for its lifetime in the window.
    prior_lin_new = shift_states(s.prior_lin, pose_new, vel_new, bias_prev)

    # IMU slots shift; evicted slot 0 is now inside the prior. The new last
    # slot is the just-preintegrated window.
    imu_new = _shift_pim(s.imu, pim)
    imu_valid_new = jnp.concatenate(
        [s.imu_valid[1:], jnp.ones((1,), dtype)], axis=0)

    btw_i_new = s.btw_i - 1
    btw_j_new = s.btw_j - 1
    btw_valid_new = s.btw_valid * (btw_i_new >= 0).astype(dtype)
    una_slot_new = s.una_slot - 1
    una_valid_new = s.una_valid * (una_slot_new >= 0).astype(dtype)

    return SmootherState(
        states=states_new,
        times=jnp.concatenate([s.times[1:], jnp.asarray(t_new, dtype)[None]]),
        key0=s.key0 + 1,
        prior_H=prior_H_new,
        prior_g=prior_g_new,
        prior_lin=prior_lin_new,
        imu=imu_new,
        imu_valid=imu_valid_new,
        btw_i=btw_i_new,
        btw_j=btw_j_new,
        btw_meas=s.btw_meas,
        btw_info=s.btw_info,
        btw_valid=btw_valid_new,
        btw_next=s.btw_next,
        una_slot=jnp.maximum(una_slot_new, 0),
        una_meas=s.una_meas,
        una_info=s.una_info,
        una_valid=una_valid_new,
        una_next=s.una_next,
    )


def add_between(
    cfg: SmootherConfig,
    s: SmootherState,
    i_window: jnp.ndarray,
    j_window: jnp.ndarray,
    measured: jnp.ndarray,
    cov: jnp.ndarray,
    valid: jnp.ndarray,
) -> SmootherState:
    """Insert a between-factor into the ring pool (GraphManager.cpp:83-88).

    ``valid`` folds in every gate the reference applies upstream: the 1 ms
    key match (SensorManagerRos.cpp:34), max_time_skip (:47), the degeneracy
    filter drop (degerate_odometry_filter.cpp:39-46), and window residency
    (i_window >= 0).
    """
    dtype = s.states.poses.dtype
    k = s.btw_next % cfg.between_slots
    in_win = (i_window >= 0) & (i_window < j_window)
    v = valid.astype(dtype) * in_win.astype(dtype)
    info = _cap_info(F.info_from_cov(cov, jitter=1e-12), cfg.info_cap)
    return s._replace(
        btw_i=s.btw_i.at[k].set(jnp.maximum(i_window, 0).astype(jnp.int32)),
        btw_j=s.btw_j.at[k].set(j_window.astype(jnp.int32)),
        btw_meas=s.btw_meas.at[k].set(measured.astype(dtype)),
        btw_info=s.btw_info.at[k].set(info.astype(dtype)),
        btw_valid=s.btw_valid.at[k].set(v),
        btw_next=s.btw_next + 1,
    )


def add_unary(
    cfg: SmootherConfig,
    s: SmootherState,
    k_window: jnp.ndarray,
    measured: jnp.ndarray,
    cov: jnp.ndarray,
    valid: jnp.ndarray,
) -> SmootherState:
    """Insert an absolute pose anchor (PriorFactor<Pose3>) on window slot
    ``k_window`` into the ring pool. The reference's topology has no such
    factor — its LiDAR odometry enters only as between-factors, discarding
    the absolute information the scan-to-map registration carries about
    the map frame; the anchor restores it (enable per sensor via
    SensorSpec.absolute_anchor)."""
    dtype = s.states.poses.dtype
    k = s.una_next % cfg.unary_slots
    W = s.states.poses.shape[0]
    in_win = (k_window >= 0) & (k_window < W)
    v = valid.astype(dtype) * in_win.astype(dtype)
    info = _cap_info(F.info_from_cov(cov, jitter=1e-12), cfg.info_cap)
    return s._replace(
        una_slot=s.una_slot.at[k].set(
            jnp.clip(k_window, 0, W - 1).astype(jnp.int32)),
        una_meas=s.una_meas.at[k].set(measured.astype(dtype)),
        una_info=s.una_info.at[k].set(info.astype(dtype)),
        una_valid=s.una_valid.at[k].set(v),
        una_next=s.una_next + 1,
    )


def latest(s: SmootherState):
    """(pose, vel, bias, time) of the newest keyframe — what the reference
    publishes from its optimization callback (gtsam_fusion_node.cpp:64-98)."""
    return (s.states.poses[-1], s.states.vels[-1], s.states.biases[-1],
            s.times[-1])
