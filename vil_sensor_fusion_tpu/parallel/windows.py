"""Keyframe-window sharding of a trajectory smoother — the long-context
parallel axis of this workload (SURVEY.md §2c/§5: "fixed-lag windows sharded
with boundary-state halo exchange + Schur complement over the separator";
the 1-D chain over time plays the role ring-attention's sequence axis plays
for transformers).

The reference's iSAM2 keeps the whole history in ONE process
(GraphManager.cpp:38-43); here a long pose chain is optimized across a
device mesh:

- the trajectory's N keyframes are split into S contiguous windows of Wl
  states, one window per device on the chain axis;
- each Gauss-Newton iteration, every device ppermute-receives the FIRST
  state of its right neighbor's window (the boundary halo) so it can
  linearize its crossing odometry factor locally;
- each device Schur-eliminates its interior states onto its two separator
  states (its own first state and the halo), producing a 12×12 condensed
  block + gradient;
- the condensed separator chain — a block-tridiagonal system of S 6-dim
  states — is all_gathered (tiny: S·(144+12) floats) and solved dense,
  replicated on every device;
- each device back-substitutes its interior update locally and retracts.

Per-iteration collective traffic is O(S·6²) regardless of trajectory
length — the separator system IS the communication footprint. The result is
numerically identical (f32 associativity aside) to the sequential dense GN
over all N states, verified by tests on the 8-device CPU mesh.

States are SE(3) poses (7-vector quaternion+translation, tangent dim 6);
factors are a prior on state 0 and an SE(3) between-factor chain — the
between-factor structure of the product smoother (graph/factors.py), at
pose-graph granularity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..core import lie
from .._precision import estimation_precision

D = 6  # tangent dim per keyframe


# ---------------------------------------------------------------------------
# Shared factor linearization
# ---------------------------------------------------------------------------

def _between_residual(pose_i, pose_j, measured):
    """r = log(measured⁻¹ · (i⁻¹ j)) — same convention as
    graph.factors.between_residual."""
    rel = lie.pose_between(pose_i, pose_j)
    return lie.se3_log(lie.pose_compose(lie.pose_inverse(measured), rel))


def _linearize_between(pose_i, pose_j, measured):
    z = jnp.zeros((D,), pose_i.dtype)

    def r_of(di, dj):
        return _between_residual(lie.pose_retract(pose_i, di),
                                 lie.pose_retract(pose_j, dj), measured)

    return (r_of(z, z), jax.jacfwd(r_of, argnums=0)(z, z),
            jax.jacfwd(r_of, argnums=1)(z, z))


def _linearize_prior(pose, prior_pose):
    z = jnp.zeros((D,), pose.dtype)

    def r_of(d):
        return lie.se3_log(lie.pose_between(prior_pose,
                                            lie.pose_retract(pose, d)))

    return r_of(z), jax.jacfwd(r_of)(z)


def _assemble_chain(poses, meas, infos, prior_pose, prior_info,
                    has_prior):
    """Dense normal equations of a W-state window: prior on state 0 (masked
    by ``has_prior``) + between factors (i, i+1) for i < W-1 with the given
    measurements/informations. Returns (H (W·6, W·6), b (W·6,))."""
    W = poses.shape[0]
    dtype = poses.dtype
    H = jnp.zeros((W * D, W * D), dtype)
    b = jnp.zeros((W * D,), dtype)

    r0, A0 = _linearize_prior(poses[0], prior_pose)
    Hp = A0.T @ prior_info @ A0 * has_prior
    bp = A0.T @ (prior_info @ r0) * has_prior
    H = H.at[:D, :D].add(Hp)
    b = b.at[:D].add(bp)

    r, A_i, A_j = jax.vmap(_linearize_between)(
        poses[:-1], poses[1:], meas)
    Hii = jnp.einsum("sri,srq,sqk->sik", A_i, infos, A_i)
    Hij = jnp.einsum("sri,srq,sqk->sik", A_i, infos, A_j)
    Hjj = jnp.einsum("sri,srq,sqk->sik", A_j, infos, A_j)
    bi = jnp.einsum("sri,srq,sq->si", A_i, infos, r)
    bj = jnp.einsum("sri,srq,sq->si", A_j, infos, r)
    for s in range(W - 1):          # static offsets (W is small)
        o = s * D
        H = H.at[o:o + D, o:o + D].add(Hii[s])
        H = H.at[o:o + D, o + D:o + 2 * D].add(Hij[s])
        H = H.at[o + D:o + 2 * D, o:o + D].add(Hij[s].T)
        H = H.at[o + D:o + 2 * D, o + D:o + 2 * D].add(Hjj[s])
        b = b.at[o:o + D].add(bi[s])
        b = b.at[o + D:o + 2 * D].add(bj[s])
    return H, b


def _damped_solve(H, b, lam):
    d = jnp.sqrt(jnp.clip(jnp.diagonal(H), 1e-12, None))
    s = 1.0 / d
    Hs = H * s[:, None] * s[None, :] + lam * jnp.eye(H.shape[0],
                                                     dtype=H.dtype)
    return s * jnp.linalg.solve(Hs, s * b)


# ---------------------------------------------------------------------------
# Sequential reference
# ---------------------------------------------------------------------------

@estimation_precision
def solve_sequential(
    poses: jnp.ndarray,        # (N, 7) initial estimates
    meas: jnp.ndarray,         # (N-1, 7) odometry between measurements
    infos: jnp.ndarray,        # (N-1, 6, 6)
    prior_pose: jnp.ndarray,   # (7,)
    prior_info: jnp.ndarray,   # (6, 6)
    iters: int = 5,
    damping: float = 1e-9,
) -> jnp.ndarray:
    """Dense GN over the whole chain on one device — the ground truth the
    sharded solver must match."""
    dtype = poses.dtype
    one = jnp.asarray(1.0, dtype)

    def it(_, x):
        H, b = _assemble_chain(x, meas, infos, prior_pose, prior_info, one)
        dx = -_damped_solve(H, b, jnp.asarray(damping, dtype))
        return jax.vmap(lie.pose_retract)(x, dx.reshape(-1, D))

    return jax.lax.fori_loop(0, iters, it, poses)


# ---------------------------------------------------------------------------
# Sharded solver
# ---------------------------------------------------------------------------

def _window_iteration(x_w, meas_w, infos_w, cross_meas, cross_info,
                      prior_pose, prior_info, axis_name, damping):
    """One distributed GN iteration for this device's window.

    x_w (Wl, 7) — owned states; meas_w/infos_w — the Wl-1 interior factors;
    cross_meas/cross_info — the factor from this window's LAST state to the
    next window's FIRST state (unused/zero-info on the last device).
    """
    dtype = x_w.dtype
    Wl = x_w.shape[0]
    s_idx = jax.lax.axis_index(axis_name)
    S = jax.lax.axis_size(axis_name)
    is_first = (s_idx == 0).astype(dtype)
    is_last = s_idx == S - 1

    # --- halo exchange: receive right neighbor's FIRST state --------------
    halo = jax.lax.ppermute(
        x_w[0], axis_name,
        perm=[(i, (i - 1) % S) for i in range(S)])        # from s+1 → s

    # --- local normal equations over (Wl + 1) states ----------------------
    # Stack the halo as an extra state; the crossing factor is the last
    # between in the local chain. The last device's crossing factor gets
    # zero information (no right neighbor).
    poses_loc = jnp.concatenate([x_w, halo[None]], axis=0)  # (Wl+1, 7)
    meas_loc = jnp.concatenate([meas_w, cross_meas[None]], axis=0)
    cinfo = jnp.where(is_last, 0.0, 1.0) * cross_info
    infos_loc = jnp.concatenate([infos_w, cinfo[None]], axis=0)
    H, b = _assemble_chain(poses_loc, meas_loc, infos_loc,
                           prior_pose, prior_info, is_first)

    # --- Schur-eliminate the interior onto (own first, halo) --------------
    # Local ordering: [first | interior (Wl-1) | halo]. Build index maps.
    n = (Wl + 1) * D
    sep_rows = jnp.concatenate([jnp.arange(D),
                                jnp.arange(Wl * D, (Wl + 1) * D)])
    int_rows = jnp.arange(D, Wl * D)
    Hss = H[jnp.ix_(sep_rows, sep_rows)]
    Hsi = H[jnp.ix_(sep_rows, int_rows)]
    Hii = H[jnp.ix_(int_rows, int_rows)]
    bs = b[sep_rows]
    bi = b[int_rows]
    dint = jnp.sqrt(jnp.clip(jnp.diagonal(Hii), 1e-12, None))
    si = 1.0 / dint
    Hii_s = Hii * si[:, None] * si[None, :] \
        + 1e-9 * jnp.eye(Hii.shape[0], dtype=dtype)
    rhs = jnp.concatenate([Hsi.T * si[:, None], (bi * si)[:, None]],
                          axis=1)
    K = si[:, None] * jnp.linalg.solve(Hii_s, rhs)        # (nint, 2D+1)
    S_blk = Hss - Hsi @ K[:, :-1]                          # (2D, 2D)
    g_blk = bs - Hsi @ K[:, -1]                            # (2D,)

    # --- gather + solve the separator chain (replicated) ------------------
    S_all = jax.lax.all_gather(S_blk, axis_name)           # (S, 2D, 2D)
    g_all = jax.lax.all_gather(g_blk, axis_name)           # (S, 2D)
    # Separator s's unknowns: (sep_s, sep_{s+1}); the last window's right
    # separator is its halo slot, which does not exist globally — its rows
    # were zeroed with the crossing factor, keep it as a dummy unknown.
    # Static assembly over devices (S is a compile-time mesh size).
    nsep = S + 1
    Hsep = jnp.zeros((nsep * D, nsep * D), dtype)
    gsep = jnp.zeros((nsep * D,), dtype)
    S_py = S
    for sdev in range(S_py):
        o = sdev * D
        Hsep = Hsep.at[o:o + 2 * D, o:o + 2 * D].add(S_all[sdev])
        gsep = gsep.at[o:o + 2 * D].add(g_all[sdev])
    # Dummy unknown (last halo): give it identity information so the solve
    # is nonsingular; its gradient is zero so its update is zero.
    o = S_py * D
    Hsep = Hsep.at[o:o + D, o:o + D].add(jnp.eye(D, dtype=dtype))
    dsep = -_damped_solve(Hsep, gsep, jnp.asarray(damping, dtype))

    my_sep = jax.lax.dynamic_slice(dsep, (s_idx * D,), (2 * D,))
    # --- back-substitute the interior --------------------------------------
    # Interior rows: Hii dxi + Hsiᵀ dxs = -bi ⇒
    #   dxi = -(Hii⁻¹ bi + Hii⁻¹ Hsiᵀ dxs) = -(K[:, -1] + K[:, :-1] @ dxs).
    dint_vec = -(K[:, -1] + K[:, :-1] @ my_sep)
    dx_w = jnp.concatenate([my_sep[:D], dint_vec]).reshape(Wl, D)
    return jax.vmap(lie.pose_retract)(x_w, dx_w)


@estimation_precision
def solve_sharded(
    mesh,
    axis_name: str,
    poses: jnp.ndarray,        # (N, 7) with N = S · Wl
    meas: jnp.ndarray,         # (N-1, 7)
    infos: jnp.ndarray,        # (N-1, 6, 6)
    prior_pose: jnp.ndarray,
    prior_info: jnp.ndarray,
    iters: int = 5,
    damping: float = 1e-9,
):
    """Distributed GN over the keyframe chain: windows sharded over
    ``axis_name``, halo exchange + separator Schur per iteration. Matches
    :func:`solve_sequential` to f32 round-off."""
    S = mesh.shape[axis_name]
    N = poses.shape[0]
    assert N % S == 0, "trajectory length must tile the window axis"
    Wl = N // S
    dtype = poses.dtype

    # Per-window factor layout: window s owns states [s·Wl, (s+1)·Wl); its
    # interior factors are meas[s·Wl : s·Wl + Wl-1]; its crossing factor is
    # meas[(s+1)·Wl - 1] (absent for the last window — padded with identity).
    x_sh = poses.reshape(S, Wl, 7)
    meas_pad = jnp.concatenate(
        [meas, lie.pose_identity(dtype)[None]], axis=0)     # (N, 7)
    infos_pad = jnp.concatenate(
        [infos, jnp.zeros((1, D, D), dtype)], axis=0)
    meas_sh = meas_pad.reshape(S, Wl, 7)[:, :-1]            # (S, Wl-1, 7)
    infos_sh = infos_pad.reshape(S, Wl, D, D)[:, :-1]
    cross_meas = meas_pad.reshape(S, Wl, 7)[:, -1]          # (S, 7)
    cross_info = infos_pad.reshape(S, Wl, D, D)[:, -1]      # (S, D, D)

    def per_shard(x_w, m_w, i_w, cm, ci):
        x_w, m_w, cm = x_w[0], m_w[0], cm[0]
        i_w, ci = i_w[0], ci[0]

        def it(_, x):
            return _window_iteration(x, m_w, i_w, cm, ci, prior_pose,
                                     prior_info, axis_name, damping)

        return jax.lax.fori_loop(0, iters, it, x_w)[None]

    spec = P(axis_name)
    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    out = jax.jit(sharded)(x_sh, meas_sh, infos_sh, cross_meas, cross_info)
    return out.reshape(N, 7)
