"""IMU preintegration as a ``lax.scan`` — the TPU-native replacement for
GTSAM's ``PreintegratedCombinedMeasurements`` used by the reference
(gtsam_fusion/src/gtsam_fusion/IMUManager.cpp:27-74).

Semantics replicated from the reference:

- Window extraction between arbitrary ``(startTime, endTime]`` with the final
  sample linearly interpolated to land exactly on ``endTime``
  (IMUManager.cpp:46-66). Here that becomes a *static-shape* gather + weight
  mask computed in :func:`extract_window`, so the scan itself is fixed-size.
- Preintegrated ΔR, Δv, Δp on the manifold, 15x15 covariance propagation in
  the order (δθ[3], δp[3], δv[3], δb_a[3], δb_g[3])  — matching GTSAM's
  ``PreintegrationBase`` error ordering (theta, pos, vel) plus bias blocks —
  and first-order bias-correction Jacobians.
- The combined-measurement noise model: accelerometer / gyroscope white
  noise, integration error, and bias random walk with the six scalar
  covariances the reference reads from config
  (ImuManagerRos.cpp:14-36 → cov_accel, cov_gyro, cov_integration,
  cov_bias_acc, cov_bias_omega, cov_bias_acc_omega_int).

The forward model (body frame b, world frame w, gravity g):

    R_{k+1} = R_k Exp((ω - b_g) Δt)
    v_{k+1} = v_k + R_k (a - b_a) Δt
    p_{k+1} = p_k + v_k Δt + 0.5 R_k (a - b_a) Δt²

accumulated in the frame of the first state, gravity applied at ``predict``
time — identical in structure to Forster et al. / GTSAM preintegration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie
from .._precision import estimation_precision


class ImuParams(NamedTuple):
    """Continuous-time IMU noise parameters (the reference's six config
    scalars, fusion_params.yaml:24-29)."""

    cov_accel: float = 1e-6          # accelerometer white noise density
    cov_gyro: float = 1e-6           # gyroscope white noise density
    cov_integration: float = 1e-8    # integration error
    cov_bias_acc: float = 1e-4       # accel bias random walk
    cov_bias_omega: float = 1e-6     # gyro bias random walk
    cov_bias_acc_omega_int: float = 1e-4  # initial bias uncertainty coupling
    gravity: float = 9.81            # +Z-up world; g vector is (0,0,-gravity)


class PreintegratedImu(NamedTuple):
    """Result of preintegrating one IMU window (all in the frame of state i).

    Attributes:
      delta_t: total integration time.
      delta_R: (3,3) rotation from body_j to body_i.
      delta_v: (3,) velocity change in body_i frame (gravity-free).
      delta_p: (3,) position change in body_i frame (gravity-free).
      cov: (9,9) covariance of (δθ, δp, δv) preintegration error.
      dR_dbg: (3,3) jacobian of delta_R wrt gyro bias.
      dv_dba, dv_dbg: (3,3) jacobians of delta_v wrt accel/gyro bias.
      dp_dba, dp_dbg: (3,3) jacobians of delta_p wrt accel/gyro bias.
      bias_hat: (6,) linearization bias (accel[3], gyro[3]).
    """

    delta_t: jnp.ndarray
    delta_R: jnp.ndarray
    delta_v: jnp.ndarray
    delta_p: jnp.ndarray
    cov: jnp.ndarray
    dR_dbg: jnp.ndarray
    dv_dba: jnp.ndarray
    dv_dbg: jnp.ndarray
    dp_dba: jnp.ndarray
    dp_dbg: jnp.ndarray
    bias_hat: jnp.ndarray


def _init_state(dtype):
    return dict(
        dR=jnp.eye(3, dtype=dtype),
        dv=jnp.zeros(3, dtype=dtype),
        dp=jnp.zeros(3, dtype=dtype),
        cov=jnp.zeros((9, 9), dtype=dtype),
        dR_dbg=jnp.zeros((3, 3), dtype=dtype),
        dv_dba=jnp.zeros((3, 3), dtype=dtype),
        dv_dbg=jnp.zeros((3, 3), dtype=dtype),
        dp_dba=jnp.zeros((3, 3), dtype=dtype),
        dp_dbg=jnp.zeros((3, 3), dtype=dtype),
        dt_sum=jnp.zeros((), dtype=dtype),
    )


@estimation_precision
def preintegrate(
    accel: jnp.ndarray,
    gyro: jnp.ndarray,
    dts: jnp.ndarray,
    bias: jnp.ndarray,
    params: ImuParams,
    mask: jnp.ndarray | None = None,
) -> PreintegratedImu:
    """Preintegrate a fixed-length window of IMU samples.

    Args:
      accel: (N,3) accelerometer samples (m/s²), bias-uncorrected.
      gyro: (N,3) gyroscope samples (rad/s).
      dts: (N,) integration interval per sample (s). Masked-out samples must
        have dt == 0 (handled by :func:`extract_window`).
      bias: (6,) linearization bias (b_a[3], b_g[3]).
      params: IMU noise parameters.
      mask: optional (N,) {0,1} validity mask; dt is multiplied by it.

    This mirrors the loop at IMUManager.cpp:46-54 followed by the
    interpolated final sample (:57-66), but as a single static-shape scan.
    """
    dtype = accel.dtype
    ba, bg = bias[:3], bias[3:6]
    if mask is not None:
        dts = dts * mask.astype(dtype)

    sig_a = jnp.asarray(params.cov_accel, dtype)
    sig_g = jnp.asarray(params.cov_gyro, dtype)
    sig_int = jnp.asarray(params.cov_integration, dtype)

    def step(s, x):
        a, w, dt = x
        live = (dt > 0).astype(dtype)
        dt = jnp.maximum(dt, jnp.asarray(1e-12, dtype))  # avoid 0-div; gated by `live`
        a_c = a - ba
        w_c = w - bg
        theta = w_c * dt
        dRk = lie.so3_exp(theta)          # incremental rotation this step
        Jr = lie.so3_right_jacobian(theta)
        R = s["dR"]
        Ra = R @ a_c
        a_hat = lie.hat(a_c)

        dv_new = s["dv"] + Ra * dt
        dp_new = s["dp"] + s["dv"] * dt + 0.5 * Ra * dt * dt
        dR_new = R @ dRk

        # Error-state transition for (δθ, δp, δv):
        #   δθ' = dRk^T δθ + Jr dt δw
        #   δp' = δp + δv dt - 0.5 R a^ δθ dt² + 0.5 R dt² δa
        #   δv' = δv - R a^ δθ dt + R dt δa
        I3 = jnp.eye(3, dtype=dtype)
        Z3 = jnp.zeros((3, 3), dtype=dtype)
        Rahat = R @ a_hat
        A = jnp.block([
            [dRk.T,                    Z3, Z3],
            [-0.5 * Rahat * dt * dt,   I3, I3 * dt],
            [-Rahat * dt,              Z3, I3],
        ])
        # Noise input: gyro white noise (→δθ), accel white noise (→δp,δv),
        # integration noise (→δp).
        B = jnp.block([
            [Jr * dt,          Z3],
            [Z3,               0.5 * R * dt * dt],
            [Z3,               R * dt],
        ])
        Q_in = jnp.block([
            [I3 * (sig_g / dt), Z3],
            [Z3, I3 * (sig_a / dt)],
        ])
        Q_int = jnp.zeros((9, 9), dtype=dtype).at[3:6, 3:6].set(I3 * sig_int * dt)
        cov_new = A @ s["cov"] @ A.T + B @ Q_in @ B.T + Q_int

        # Bias jacobians (Forster et al. eq. 44-46 recursions).
        dR_dbg_new = dRk.T @ s["dR_dbg"] - Jr * dt
        dv_dba_new = s["dv_dba"] - R * dt
        dv_dbg_new = s["dv_dbg"] - Rahat @ s["dR_dbg"] * dt
        dp_dba_new = s["dp_dba"] + s["dv_dba"] * dt - 0.5 * R * dt * dt
        dp_dbg_new = s["dp_dbg"] + s["dv_dbg"] * dt - 0.5 * Rahat @ s["dR_dbg"] * dt * dt

        def sel(new, old):
            return live * new + (1.0 - live) * old

        s_new = dict(
            dR=sel(dR_new, s["dR"]),
            dv=sel(dv_new, s["dv"]),
            dp=sel(dp_new, s["dp"]),
            cov=sel(cov_new, s["cov"]),
            dR_dbg=sel(dR_dbg_new, s["dR_dbg"]),
            dv_dba=sel(dv_dba_new, s["dv_dba"]),
            dv_dbg=sel(dv_dbg_new, s["dv_dbg"]),
            dp_dba=sel(dp_dba_new, s["dp_dba"]),
            dp_dbg=sel(dp_dbg_new, s["dp_dbg"]),
            dt_sum=s["dt_sum"] + live * dt,
        )
        return s_new, None

    init = _init_state(dtype)
    # unroll: each step is ~30 tiny 3x3 ops — unrolling lets XLA pipeline
    # across steps and quarters the sequential-loop overhead on TPU.
    final, _ = jax.lax.scan(step, init, (accel, gyro, dts), unroll=4)
    return PreintegratedImu(
        delta_t=final["dt_sum"],
        delta_R=final["dR"],
        delta_v=final["dv"],
        delta_p=final["dp"],
        cov=final["cov"],
        dR_dbg=final["dR_dbg"],
        dv_dba=final["dv_dba"],
        dv_dbg=final["dv_dbg"],
        dp_dba=final["dp_dba"],
        dp_dbg=final["dp_dbg"],
        bias_hat=bias,
    )


@estimation_precision
def predict(
    pim: PreintegratedImu,
    pose_i: jnp.ndarray,
    vel_i: jnp.ndarray,
    bias: jnp.ndarray,
    params: ImuParams,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """NavState prediction — GTSAM's ``PreintegratedMeasurements::predict``
    as used in GraphManager::emptyImuQueue (GraphManager.cpp:148-152).

    Applies first-order bias correction around ``pim.bias_hat`` then composes
    with gravity.  Returns (pose_j, vel_j).
    """
    dtype = pim.delta_v.dtype
    g = jnp.array([0.0, 0.0, -params.gravity], dtype=dtype)
    db = bias - pim.bias_hat
    dba, dbg = db[:3], db[3:6]

    dR = pim.delta_R @ lie.so3_exp(pim.dR_dbg @ dbg)
    dv = pim.delta_v + pim.dv_dba @ dba + pim.dv_dbg @ dbg
    dp = pim.delta_p + pim.dp_dba @ dba + pim.dp_dbg @ dbg

    Ri = lie.quat_to_rot(lie.pose_quat(pose_i))
    pi = lie.pose_trans(pose_i)
    dt = pim.delta_t

    Rj = Ri @ dR
    vj = vel_i + Ri @ dv + g * dt
    pj = pi + vel_i * dt + Ri @ dp + 0.5 * g * dt * dt
    pose_j = lie.pose_make(lie.rot_to_quat(Rj), pj)
    return pose_j, vj


def extract_window(
    times: jnp.ndarray,
    accel: jnp.ndarray,
    gyro: jnp.ndarray,
    start: jnp.ndarray,
    end: jnp.ndarray,
    max_samples: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-shape equivalent of IMUManager::getFactor's buffer walk
    (IMUManager.cpp:35-66): select samples with start < t < end, integrate
    each over (prev_t - t), and linearly interpolate a final virtual sample
    at exactly ``end``.

    Args:
      times: (M,) sorted sample times of the full IMU stream.
      accel/gyro: (M,3) samples.
      start, end: scalars, window bounds.
      max_samples: static output length N (pad with dt=0).

    Returns (accel_w, gyro_w, dts) each with leading dim ``max_samples + 1``
    (the +1 slot holds the interpolated end sample).
    """
    dtype = accel.dtype
    M = times.shape[0]
    # Index of first sample with t > start  (samples at exactly start belong
    # to the previous window, mirroring `front().time <= startTime` pops).
    i0 = jnp.searchsorted(times, start, side="right")
    idx = i0 + jnp.arange(max_samples)
    idx_c = jnp.clip(idx, 0, M - 1)
    t_k = times[idx_c]
    in_window = (idx < M) & (t_k < end)

    a_k = accel[idx_c]
    g_k = gyro[idx_c]

    # prev time for each sample: previous in-window sample or `start`.
    t_prev = jnp.where(jnp.arange(max_samples) == 0, start, times[jnp.clip(idx - 1, 0, M - 1)])
    t_prev = jnp.where(jnp.arange(max_samples) == 0, start, jnp.maximum(t_prev, start))
    dts = jnp.where(in_window, t_k - t_prev, 0.0).astype(dtype)

    # Interpolated final sample: between last in-window sample (or start) and
    # the first sample >= end.
    n_in = jnp.sum(in_window)
    last_idx = jnp.clip(i0 + n_in - 1, 0, M - 1)
    last_t = jnp.where(n_in > 0, times[last_idx], start)
    last_a = jnp.where(n_in > 0, accel[last_idx], accel[jnp.clip(i0 - 1, 0, M - 1)])
    last_g = jnp.where(n_in > 0, gyro[last_idx], gyro[jnp.clip(i0 - 1, 0, M - 1)])
    nxt = jnp.clip(i0 + n_in, 0, M - 1)
    has_next = (i0 + n_in) < M
    t_next = times[nxt]
    denom = jnp.maximum(t_next - last_t, 1e-12)
    alpha = jnp.clip((end - last_t) / denom, 0.0, 1.0)
    a_interp = alpha * accel[nxt] + (1.0 - alpha) * last_a
    g_interp = alpha * gyro[nxt] + (1.0 - alpha) * last_g
    dt_final = jnp.where(has_next, end - last_t, 0.0).astype(dtype)

    accel_w = jnp.concatenate([a_k, a_interp[None]], axis=0)
    gyro_w = jnp.concatenate([g_k, g_interp[None]], axis=0)
    dts_all = jnp.concatenate([dts, dt_final[None]], axis=0)
    return accel_w, gyro_w, dts_all


@estimation_precision
def preintegrate_window(
    times: jnp.ndarray,
    accel: jnp.ndarray,
    gyro: jnp.ndarray,
    start: jnp.ndarray,
    end: jnp.ndarray,
    bias: jnp.ndarray,
    params: ImuParams,
    max_samples: int = 64,
) -> PreintegratedImu:
    """extract_window + preintegrate in one call (the getFactor equivalent)."""
    a, g, dts = extract_window(times, accel, gyro, start, end, max_samples)
    return preintegrate(a, g, dts, bias, params)


@estimation_precision
def combined_covariance_15(pim: PreintegratedImu, params: ImuParams) -> jnp.ndarray:
    """15x15 covariance of (δθ, δp, δv, δb_a, δb_g) for the combined factor:
    preintegration covariance plus bias random-walk over the window —
    the structure CombinedImuFactor adds over the plain ImuFactor."""
    dtype = pim.cov.dtype
    dt = pim.delta_t
    cov = jnp.zeros((15, 15), dtype=dtype)
    cov = cov.at[:9, :9].set(pim.cov)
    I3 = jnp.eye(3, dtype=dtype)
    cov = cov.at[9:12, 9:12].set(I3 * params.cov_bias_acc * jnp.maximum(dt, 1e-12))
    cov = cov.at[12:15, 12:15].set(I3 * params.cov_bias_omega * jnp.maximum(dt, 1e-12))
    return cov
