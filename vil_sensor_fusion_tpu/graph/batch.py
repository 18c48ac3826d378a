"""Full-batch MAP oracle: an offline f64 Gauss-Newton over an ENTIRE event
timeline, solving every keyframe jointly.

Purpose (reference-free GTSAM-parity substitute): the streaming engine is a
fixed-lag smoother — old states are Schur-marginalized into a dense prior
(graph/smoother.py:add_keyframe), whereas the reference's iSAM2 keeps the
full history and relinearizes it (GraphManager.cpp:101-141,
relinearizeThreshold 1e-4 / relinearizeSkip 1). This module computes the
full-history MAP with the *same factor semantics* (initial prior, one
CombinedImu-equivalent factor per event gap, per-source between-factor
chains with the engine's arrival/gap gates), in float64 on CPU, so the
fixed-lag trajectory can be compared against the estimate an
infinite-memory solver would produce. ``scripts/oracle_report.py`` runs
the comparison end-to-end and ``tests/test_batch_oracle.py`` bounds it.

Implementation notes: factor linearizations reuse graph/factors.py (vmapped
under f64); the dense (N·15)² normal equations are assembled host-side in
numpy (block scatter — no XLA round-trips for a one-shot offline solve) and
solved with LAPACK via a Jacobi-scaled damped solve, exactly the
conditioning treatment the streaming solver applies (smoother._jacobi_solve).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core import preintegration as pre
from . import factors as F
from .factors import STATE_DIM
from ..fusion import engine as E


class BatchSolution(NamedTuple):
    poses: jnp.ndarray      # (N, 7) all keyframes incl. the initial state
    vels: jnp.ndarray       # (N, 3)
    biases: jnp.ndarray     # (N, 6)
    times: jnp.ndarray      # (N,)
    cost: float             # final total weighted squared error
    n_between: int          # between-factors that passed the engine's gates


def _timeline_structure(cfg: E.FusionConfig, tl: E.Timeline, t0: float):
    """Replay the engine's bookkeeping host-side: per event, the between
    factor's (i_state, j_state, valid) under the arrival/gap/chain gates
    (engine.step's factor_valid) — state 0 is the initial state, event e
    creates state e+1."""
    times = np.asarray(tl.times, np.float64)
    source = np.asarray(tl.source)
    keep = np.asarray(tl.keep, np.float64)
    valid = np.asarray(tl.valid, np.float64)
    nS = len(cfg.sensors)
    max_skip = [s.max_time_skip for s in cfg.sensors]
    last_state = np.zeros(nS, np.int64)
    last_time = np.full(nS, t0, np.float64)
    has_last = np.zeros(nS, bool)
    btw = []
    for e in range(len(times)):
        sid = int(source[e])
        arrived = keep[e] * valid[e] > 0
        gap_ok = (times[e] - last_time[sid]) < max_skip[sid]
        if arrived and has_last[sid] and gap_ok:
            btw.append((last_state[sid], e + 1, sid, e))
        if arrived:
            last_state[sid] = e + 1
            last_time[sid] = times[e]
            has_last[sid] = True
    return btw


def solve_batch(
    cfg: E.FusionConfig,
    tl: E.Timeline,
    imu_times: jnp.ndarray,
    imu_accel: jnp.ndarray,
    imu_gyro: jnp.ndarray,
    pose0: jnp.ndarray,
    vel0: jnp.ndarray,
    bias0: jnp.ndarray,
    t0: float,
    iters: int = 20,
    damping: float = 1e-6,
) -> BatchSolution:
    """Joint MAP over all E+1 states (f64, dense). See module docstring."""
    f64 = jnp.float64
    if not jax.config.read("jax_enable_x64"):
        raise RuntimeError("solve_batch needs jax_enable_x64 (CPU oracle)")
    times_np = np.concatenate([[t0], np.asarray(tl.times, np.float64)])
    N = len(times_np)
    D = N * STATE_DIM

    imu_times = jnp.asarray(imu_times, f64)
    imu_accel = jnp.asarray(imu_accel, f64)
    imu_gyro = jnp.asarray(imu_gyro, f64)
    pose0 = jnp.asarray(pose0, f64)
    vel0 = jnp.asarray(vel0, f64)
    bias0 = jnp.asarray(bias0, f64)

    # --- factors -----------------------------------------------------------
    # IMU: one per consecutive state pair, preintegrated at the initial
    # bias (bias Jacobians carry the first-order correction — the batch
    # linearization-point convention; the engine instead re-preintegrates
    # at each step's running bias estimate).
    starts = jnp.asarray(times_np[:-1], f64)
    ends = jnp.asarray(times_np[1:], f64)
    pim = jax.vmap(lambda s, e: pre.preintegrate_window(
        imu_times, imu_accel, imu_gyro, s, e, bias0,
        cfg.smoother.imu, max_samples=cfg.max_imu_per_gap))(starts, ends)
    cov15 = jax.vmap(
        lambda p: pre.combined_covariance_15(p, cfg.smoother.imu))(pim)
    imu_info = np.asarray(F.info_from_cov(cov15, jitter=1e-18))

    btw = _timeline_structure(cfg, tl, t0)
    bi = np.array([b[0] for b in btw], np.int64)
    bj = np.array([b[1] for b in btw], np.int64)
    bev = np.array([b[3] for b in btw], np.int64)
    bsid = np.array([b[2] for b in btw], np.int64)
    odo_pose = jnp.asarray(np.asarray(tl.odo_pose, np.float64)[bev], f64)
    odo_cov_tl = np.asarray(tl.odo_cov, np.float64)[bev]
    odo_twist_tl = np.asarray(tl.odo_twist_cov, np.float64)[bev]
    # Covariance selection (engine.step): twist channel for the literal
    # use_odom_covariance mode (SensorManagerRos.cpp:84-99), pose channel
    # for the adaptive use_pose_covariance extension, else fixed diag.
    covs = []
    for k in range(len(btw)):
        sp = cfg.sensors[bsid[k]]
        if sp.use_odom_covariance:
            covs.append(odo_twist_tl[k])
        elif sp.use_pose_covariance:
            covs.append(odo_cov_tl[k])
        else:
            covs.append(np.diag([sp.covariance_linear] * 3
                                + [sp.covariance_angular] * 3))
    btw_cov = jnp.asarray(np.array(covs).reshape(-1, 6, 6), f64)
    btw_info = np.asarray(jax.vmap(
        lambda c: F.info_from_cov(c, jitter=1e-18))(btw_cov))
    # Between measurement from the engine's delta convention.
    prev_pose = jnp.asarray(np.asarray(tl.odo_pose, np.float64))
    prev_sel = jnp.where(
        (bi[:, None] == 0), pose0[None, :],
        prev_pose[np.maximum(bi - 1, 0)])
    if cfg.ref_pose_delta:
        meas = jax.vmap(lie.pose_ref_delta)(prev_sel, odo_pose)
    else:
        meas = jax.vmap(lie.pose_between)(prev_sel, odo_pose)

    prior_info = np.zeros((STATE_DIM, STATE_DIM))
    sig = np.array([cfg.smoother.prior_trans_sigma] * 3
                   + [cfg.smoother.prior_rot_sigma] * 3
                   + [cfg.smoother.prior_vel_sigma] * 3
                   + [cfg.smoother.prior_bias_sigma] * 6)
    np.fill_diagonal(prior_info, np.minimum(1.0 / sig ** 2,
                                            cfg.smoother.info_cap))

    g_vec = jnp.array([0.0, 0.0, -cfg.smoother.imu.gravity], f64)

    # --- initial states: dead-reckon the IMU chain -------------------------
    poses = [pose0]
    vels = [vel0]
    for k in range(N - 1):
        p_k = jax.tree_util.tree_map(lambda a, kk=k: a[kk], pim)
        p_new, v_new = pre.predict(p_k, poses[-1], vels[-1], bias0,
                                   cfg.smoother.imu)
        poses.append(p_new)
        vels.append(v_new)
    poses = jnp.stack(poses)
    vels = jnp.stack(vels)
    biases = jnp.broadcast_to(bias0, (N, 6)).astype(f64)

    lin_imu = jax.jit(jax.vmap(
        lambda pi, vi, bi_, pj, vj, bj_, pm: F.linearize_imu_factor(
            pi, vi, bi_, pj, vj, bj_, pm, g_vec)))
    lin_btw = jax.jit(jax.vmap(F.linearize_between_factor))
    lin_prior = jax.jit(F.linearize_prior_factor)

    S = STATE_DIM
    last_cost = np.inf
    for _ in range(iters):
        # Linearize (JAX, f64) — assemble + solve (numpy, f64).
        r_i, Ai, Aj = [np.asarray(v) for v in lin_imu(
            poses[:-1], vels[:-1], biases[:-1],
            poses[1:], vels[1:], biases[1:], pim)]
        H = np.zeros((D, D))
        b = np.zeros(D)
        for k in range(N - 1):
            sl_i = slice(k * S, (k + 1) * S)
            sl_j = slice((k + 1) * S, (k + 2) * S)
            L = imu_info[k]
            H[sl_i, sl_i] += Ai[k].T @ L @ Ai[k]
            H[sl_i, sl_j] += Ai[k].T @ L @ Aj[k]
            H[sl_j, sl_i] += Aj[k].T @ L @ Ai[k]
            H[sl_j, sl_j] += Aj[k].T @ L @ Aj[k]
            b[sl_i] += Ai[k].T @ L @ r_i[k]
            b[sl_j] += Aj[k].T @ L @ r_i[k]
        cost = float(np.einsum("kr,krq,kq->", r_i, imu_info, r_i))

        if len(btw):
            r_b, Bi_, Bj_ = [np.asarray(v) for v in lin_btw(
                poses[bi], poses[bj], meas)]
            for k in range(len(btw)):
                sl_i = slice(bi[k] * S, (bi[k] + 1) * S)
                sl_j = slice(bj[k] * S, (bj[k] + 1) * S)
                L = btw_info[k]
                H[sl_i, sl_i] += Bi_[k].T @ L @ Bi_[k]
                H[sl_i, sl_j] += Bi_[k].T @ L @ Bj_[k]
                H[sl_j, sl_i] += Bj_[k].T @ L @ Bi_[k]
                H[sl_j, sl_j] += Bj_[k].T @ L @ Bj_[k]
                b[sl_i] += Bi_[k].T @ L @ r_b[k]
                b[sl_j] += Bj_[k].T @ L @ r_b[k]
            cost += float(np.einsum("kr,krq,kq->", r_b, btw_info, r_b))

        r_p, Ap = lin_prior(poses[0], vels[0], biases[0],
                            pose0, vel0, bias0)
        r_p = np.asarray(r_p)
        Ap = np.asarray(Ap)
        H[:S, :S] += Ap.T @ prior_info @ Ap
        b[:S] += Ap.T @ prior_info @ r_p
        cost += float(r_p @ prior_info @ r_p)

        # Jacobi-scaled damped solve (matches smoother._jacobi_solve).
        d = np.sqrt(np.clip(np.diag(H), 1e-15, None))
        s_inv = 1.0 / d
        Hs = H * s_inv[:, None] * s_inv[None, :] + damping * np.eye(D)
        dx = -(s_inv * np.linalg.solve(Hs, s_inv * b))
        dx_j = jnp.asarray(dx.reshape(N, S), f64)
        poses, vels, biases = jax.vmap(F.retract_state)(
            poses, vels, biases, dx_j)
        if abs(last_cost - cost) < 1e-12 * max(cost, 1.0):
            break
        last_cost = cost

    return BatchSolution(
        poses=poses, vels=vels, biases=biases,
        times=jnp.asarray(times_np, f64),
        cost=0.5 * cost, n_between=len(btw))
