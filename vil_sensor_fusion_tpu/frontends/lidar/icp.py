"""Scan registration: batched KNN correspondence + point-to-line /
point-to-plane Gauss-Newton with an explicit 6×6 Hessian.

This is the TPU-native replacement for the LOAM fork's LaserOdometry /
LaserMapping optimization (loam_params.yaml LaserOdometry/LaserMapping
blocks; the fork publishes the 6×6 Hessian in its OptStatus message —
gtsam_fusion/README.md:27-28 — which IS the thesis's degeneracy signal).

TPU-first choices:
- **KNN is a matmul**: ‖q−m‖² = ‖q‖² − 2 q·mᵀ + ‖m‖², so the Q×M distance
  matrix rides the MXU; `top_k` gives the 5 neighbors LOAM gets from a
  KD-tree. Queries are processed in chunks (lax.map) to bound memory.
- **Static shapes everywhere**: feature sets and the map are fixed-capacity
  with 0/1 masks; invalid correspondences get zero weight, not dropped rows.
- **Fixed GN iterations** (odomMaxIterations 25 / mapMaxIterations 10 →
  configurable) inside `lax.fori_loop`; no data-dependent early abort
  (the deltaT/deltaR abort thresholds become a no-op wash since extra
  iterations at convergence are free relative to a recompile).
- **Degeneracy projection**: LOAM's eigenvalue-clamped solve (eigenvalues of
  H below ``degen_eigval`` ⇒ solution projected off those directions,
  odomDegenEigVal 30 / mapDegenEigVal 40).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import lie
from ...ops import eig3 as E3
from ...ops import eig6 as E6
from ..._precision import estimation_precision

KNN_K = 5
QUERY_CHUNK = 128


class IcpConfig(NamedTuple):
    iters: int = 10                  # mapMaxIterations (25 for odometry mode)
    max_corr_dist: float = 1.0       # correspondence gating radius
    line_eig_ratio: float = 3.0      # λ1 > ratio·λ2 ⇒ valid line (LOAM rule)
    plane_fit_tol: float = 0.2       # max point-plane misfit in the 5-NN fit
    plane_eig_ratio: float = 3.0     # λ_mid > ratio·λ_min ⇒ genuinely planar
    plane_mid_eig_min: float = 0.01  # absolute 2nd-direction spread floor (m²)
    degen_eigval: float = 40.0       # mapDegenEigVal
    damping: float = 1e-6
    # Correspondence-refresh period: the KNN search + line/plane eigenfits
    # are the dominant registration cost on TPU; refreshing them every
    # ``fit_every`` GN iterations (instead of every iteration) reuses the
    # same matched geometry for the in-between steps — LOAM itself
    # converges with stale correspondences late in the loop, and the GN
    # update with frozen correspondences is still an exact descent step on
    # the frozen-association cost. fit_every=1 reproduces the classic
    # refresh-every-iteration schedule exactly.
    fit_every: int = 1
    # Recompute correspondences once more at the solution for the reported
    # Hessian/cost/n_corr (True = classic behavior). False reuses the last
    # round's fits — the Hessian LOAM publishes is its last-iteration one
    # (OptStatus), so stale-by-≤fit_every stats match reference semantics.
    final_refresh: bool = True
    # Jacobi sweeps for the per-round 6×6 eigendecomposition. The 6×6
    # Jacobi is a ~540-op sequential chain (~290 µs on v5e, pure op
    # latency); off-diagonal mass decays quadratically, so 4 sweeps
    # (~1e-3 relative) are plenty for degeneracy gating + the projected
    # solve, while 6 reaches f32 machine precision. Perf configs use 4.
    eig_sweeps: int = 6


class IcpResult(NamedTuple):
    pose: jnp.ndarray        # (7,) refined target_T_sensor
    hessian: jnp.ndarray     # (6, 6) GN Hessian at the solution (rho, theta)
    cost: jnp.ndarray        # final weighted squared error
    n_corr: jnp.ndarray      # number of valid correspondences (float)
    degenerate: jnp.ndarray  # (6,) 1.0 per clamped eigen-direction


def knn(
    queries: jnp.ndarray,     # (Q, 3)
    q_mask: jnp.ndarray,      # (Q,)
    targets: jnp.ndarray,     # (M, 3)
    t_mask: jnp.ndarray,      # (M,)
    k: int = KNN_K,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Masked brute-force KNN: returns (idx (Q,k), dist² (Q,k)), ascending.

    Dispatches to ops/knn.py (hardware approx-top-k on TPU, exact Pallas/
    top-k elsewhere). Invalid targets get +inf distance; invalid queries
    return garbage rows the caller must mask (their validity flows through
    q_mask).

    Precision note: the fit functions calling this run under
    ``estimation_precision`` ('highest': 6-pass full-f32 matmuls) for the
    estimator algebra — overkill for neighbor SEARCH. But plain 'default'
    (single-pass bf16) is NOT enough either: ‖q−t‖² = ‖q‖² − 2q·t + ‖t‖²
    cancels catastrophically at map coordinates (|q·t| ~ 2500 m² with
    bf16-truncated inputs ⇒ ±10 m² distance error, scrambling sub-metre
    neighbor ranking — measured +11% registration error). 'high' (3-pass
    bf16) recovers ~f32 product precision at half the 'highest' cost —
    measured accuracy-identical to 'highest' and ~2x faster fits."""
    from ...ops import knn as knn_ops

    with jax.default_matmul_precision("high"):
        return knn_ops.knn(queries, targets, t_mask, k)


def _transform(pose: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    return lie.quat_rotate(lie.pose_quat(pose)[None, :], pts) \
        + lie.pose_trans(pose)[None, :]


@estimation_precision
def line_fits(
    pose, corners, corner_mask, map_corners, map_mask, cfg: IcpConfig,
):
    """5-NN line fits in the corner map at ``pose``: returns
    (centroid (Q,3), direction (Q,3), w (Q,)) — the correspondence geometry
    shared by the GN residuals and the perturbation-distance sweep."""
    p_map = _transform(pose, corners)                     # (Q, 3)
    idx, d2 = knn(p_map, corner_mask, map_corners, map_mask)
    # Materialize the gathered neighbors once (barrier keeps XLA from
    # re-fusing the irregular gather into each consumer below).
    nn = jax.lax.optimization_barrier(map_corners[idx])   # (Q, K, 3)
    centroid = jnp.mean(nn, axis=1)                       # (Q, 3)
    dc = nn - centroid[:, None, :]
    cov = jnp.einsum("qki,qkj->qij", dc, dc) / KNN_K
    # Closed-form batched 3x3 eig (ops/eig3): jnp.linalg.eigh's iterative
    # lowering is ~3x slower on TPU for these tiny-matrix batches.
    eigval, eigvec = E3.eigh3(cov)                        # ascending
    d = eigvec[..., -1]                                   # line direction
    is_line = eigval[..., -1] > cfg.line_eig_ratio * eigval[..., -2]
    near = d2[:, -1] < cfg.max_corr_dist ** 2             # worst NN in radius
    w = corner_mask * is_line.astype(corners.dtype) * near.astype(corners.dtype)
    return centroid, d, w


def line_residuals(pose, corners, centroid, d, w):
    """Residual/Jacobian of the point-to-line cost at ``pose`` for FROZEN
    line fits (centroid, direction, weight) — the cheap half of a GN
    iteration (no KNN, no eigenfit). Returns (res (Q,3), J (Q,3,6), w)."""
    p_map = _transform(pose, corners)
    P = jnp.eye(3, dtype=corners.dtype)[None] - d[:, :, None] * d[:, None, :]
    res = jnp.einsum("qij,qj->qi", P, p_map - centroid)
    R = lie.quat_to_rot(lie.pose_quat(pose))
    Jp = jnp.concatenate(
        [jnp.broadcast_to(R, corners.shape[:1] + (3, 3)),
         -jnp.einsum("ij,qjk->qik", R, lie.hat(corners))], axis=-1)  # (Q,3,6)
    J = jnp.einsum("qij,qjk->qik", P, Jp)
    return res, J, w


def line_correspondences(
    pose, corners, corner_mask, map_corners, map_mask, cfg: IcpConfig,
):
    """Point-to-line: 5-NN in the corner map, line via the principal
    eigenvector of the neighbor scatter (LaserMapping's corner matching).

    Returns (res (Q,3), J (Q,3,6), w (Q,)) — residual is the perpendicular
    displacement from the fitted line, Jacobian wrt right-perturbation
    (rho, theta) of ``pose``.
    """
    centroid, d, w = line_fits(
        pose, corners, corner_mask, map_corners, map_mask, cfg)
    return line_residuals(pose, corners, centroid, d, w)


@estimation_precision
def plane_fits(
    pose, surfs, surf_mask, map_surfs, map_mask, cfg: IcpConfig,
):
    """5-NN plane fits in the surface map at ``pose``: returns
    (normal (Q,3), offset (Q,), w (Q,)) with plane ``n·x + offset = 0``."""
    p_map = _transform(pose, surfs)
    idx, d2 = knn(p_map, surf_mask, map_surfs, map_mask)
    # Single materialized gather (see line_fits).
    nn = jax.lax.optimization_barrier(map_surfs[idx])     # (Q, K, 3)
    centroid = jnp.mean(nn, axis=1)
    dc = nn - centroid[:, None, :]
    cov = jnp.einsum("qki,qkj->qij", dc, dc) / KNN_K
    eigval, eigvec = E3.eigh3(cov)                        # ascending
    n = eigvec[..., 0]                                    # smallest → normal
    d_off = -jnp.einsum("qi,qi->q", n, centroid)          # plane: n·x + d = 0
    # Fit validity: every neighbor within plane_fit_tol of the plane, AND a
    # genuinely planar scatter (collinear/clustered neighbor sets have an
    # arbitrary smallest eigenvector — their 'normal' is garbage).
    fit = jnp.abs(jnp.einsum("qki,qi->qk", nn, n) + d_off[:, None])
    good_fit = jnp.max(fit, axis=-1) < cfg.plane_fit_tol
    planar = (eigval[..., 1] > cfg.plane_eig_ratio
              * jnp.maximum(eigval[..., 0], 1e-6)) \
        & (eigval[..., 1] > cfg.plane_mid_eig_min)
    near = d2[:, -1] < cfg.max_corr_dist ** 2
    w = (surf_mask * good_fit.astype(surfs.dtype)
         * planar.astype(surfs.dtype) * near.astype(surfs.dtype))
    return n, d_off, w


def plane_residuals(pose, surfs, n, d_off, w):
    """Residual/Jacobian of the point-to-plane cost at ``pose`` for FROZEN
    plane fits (normal, offset, weight). Returns (res (Q,1), J (Q,1,6), w)."""
    p_map = _transform(pose, surfs)
    res = (jnp.einsum("qi,qi->q", n, p_map) + d_off)[:, None]   # (Q, 1)
    R = lie.quat_to_rot(lie.pose_quat(pose))
    Jp = jnp.concatenate(
        [jnp.broadcast_to(R, surfs.shape[:1] + (3, 3)),
         -jnp.einsum("ij,qjk->qik", R, lie.hat(surfs))], axis=-1)
    J = jnp.einsum("qi,qik->qk", n, Jp)[:, None, :]             # (Q, 1, 6)
    return res, J, w


def plane_correspondences(
    pose, surfs, surf_mask, map_surfs, map_mask, cfg: IcpConfig,
):
    """Point-to-plane: 5-NN plane fit via the smallest-eigenvector of the
    neighbor scatter (LaserMapping's surface matching, incl. the 0.2 m
    fit-validity check). LOAM fits ``n·x = −1`` by least squares, which is
    singular for planes through the target-frame origin; the eigen fit is
    the same plane without that failure mode.

    Returns (res (Q,1), J (Q,1,6), w (Q,))."""
    n, d_off, w = plane_fits(
        pose, surfs, surf_mask, map_surfs, map_mask, cfg)
    return plane_residuals(pose, surfs, n, d_off, w)


@estimation_precision
def accumulate_normal_eqs(res, J, w):
    """H = Σ w JᵀJ, g = Σ w Jᵀr, cost = Σ w rᵀr — shardable over the point
    axis: under shard_map these become psum-reduced partial sums
    (parallel.ops).

    Zero-weight rows are explicitly zeroed first: a garbage residual from an
    invalid correspondence may be non-finite, and 0·inf would poison the sum.
    """
    ok = (w > 0)[:, None]
    res = jnp.where(ok, res, 0.0)
    J = jnp.where(ok[..., None], J, 0.0)
    H = jnp.einsum("qri,q,qrj->ij", J, w, J)
    g = jnp.einsum("qri,q,qr->i", J, w, res)
    cost = jnp.einsum("qr,q,qr->", res, w, res)
    return H, g, cost


@estimation_precision
def degeneracy_projected_step(H, g, cfg: IcpConfig):
    """LOAM's degeneracy-aware solve: eigen-directions of H with eigenvalue
    below ``degen_eigval`` are frozen — the update is projected onto the
    well-conditioned subspace (Zhang & Singh's solveDegeneracy; thresholds
    odomDegenEigVal/mapDegenEigVal in loam_params.yaml)."""
    dtype = H.dtype
    # Fixed-sweep Jacobi (ops/eig6): a single 6x6 jnp.linalg.eigh/solve
    # costs ~2.5 ms EACH on TPU — they dominated the whole GN loop. The
    # damped projected step is one matmul chain in the eigenbasis.
    eigval, V = E6.jacobi_eigh(H)
    ok = (eigval > cfg.degen_eigval).astype(dtype)
    damping = cfg.damping * jnp.maximum(jnp.mean(jnp.diagonal(H)), 1.0)
    dx_proj = -E6.eig_solve(eigval, V, g, damping=damping, keep=ok)
    return dx_proj, 1.0 - ok


class PerturbationDists(NamedTuple):
    """The thesis fork's per-DOF perturbation-sweep correspondence distances
    (OdometryWithHessian dists/dists_surface/dists_corner (6×S) +
    shift_trans/shift_rot (S), consumed at make_prettier_graphs.py:429-446
    and special_graphs.py:18-34). Row d = mean correspondence distance after
    perturbing the solution pose along DOF d (ρx ρy ρz θx θy θz) by each
    shift; a flat row ⇒ the cost is insensitive to that DOF ⇒ degenerate
    (the dist_slope metrics, degeneracy_detection_functions.py:269-303)."""

    dists: jnp.ndarray          # (6, S) combined mean distance
    dists_corner: jnp.ndarray   # (6, S)
    dists_surface: jnp.ndarray  # (6, S)
    shift_trans: jnp.ndarray    # (S,)
    shift_rot: jnp.ndarray      # (S,)


@estimation_precision
def perturbation_dists(
    pose: jnp.ndarray,
    corners: jnp.ndarray, corner_mask: jnp.ndarray,
    surfs: jnp.ndarray, surf_mask: jnp.ndarray,
    map_corners: jnp.ndarray, map_corner_mask: jnp.ndarray,
    map_surfs: jnp.ndarray, map_surf_mask: jnp.ndarray,
    cfg: IcpConfig = IcpConfig(),
    n_shifts: int = 15,
    max_shift_trans: float = 0.2,
    max_shift_rot: float = 0.2,
) -> PerturbationDists:
    """Sweep the solution pose along each DOF and record how the matched
    correspondence distances grow. Correspondences (line/plane fits) are
    fixed at the solution — only the residual evaluation moves — so the
    whole 6×S sweep is two small batched matmuls, no KNN re-search. Shift
    ranges follow the fork's 0..0.2 axis (special_graphs.py:37)."""
    dtype = pose.dtype
    centroid, ldir, wl = line_fits(
        pose, corners, corner_mask, map_corners, map_corner_mask, cfg)
    nrm, d_off, wp = plane_fits(
        pose, surfs, surf_mask, map_surfs, map_surf_mask, cfg)
    nl = jnp.maximum(jnp.sum(wl), 1.0)
    np_ = jnp.maximum(jnp.sum(wp), 1.0)

    s_t = jnp.linspace(0.0, max_shift_trans, n_shifts).astype(dtype)
    s_r = jnp.linspace(0.0, max_shift_rot, n_shifts).astype(dtype)
    mags = jnp.concatenate([
        jnp.broadcast_to(s_t, (3, n_shifts)),
        jnp.broadcast_to(s_r, (3, n_shifts))], axis=0)     # (6, S)
    xi = jnp.eye(6, dtype=dtype)[:, None, :] * mags[:, :, None]  # (6, S, 6)
    poses = jax.vmap(jax.vmap(lambda v: lie.pose_retract(pose, v)))(xi)

    def eval_at(p):
        pc = _transform(p, corners)
        v = pc - centroid
        perp = v - ldir * jnp.einsum("qi,qi->q", v, ldir)[:, None]
        dl = jnp.linalg.norm(perp, axis=-1)
        ps = _transform(p, surfs)
        dp = jnp.abs(jnp.einsum("qi,qi->q", nrm, ps) + d_off)
        mc = jnp.sum(wl * dl) / nl
        ms = jnp.sum(wp * dp) / np_
        mall = (jnp.sum(wl * dl) + jnp.sum(wp * dp)) / (nl + np_)
        return mc, ms, mall

    d_c, d_s, d_all = jax.vmap(jax.vmap(eval_at))(poses)   # each (6, S)
    return PerturbationDists(
        dists=d_all, dists_corner=d_c, dists_surface=d_s,
        shift_trans=s_t, shift_rot=s_r,
    )


def register(
    pose0: jnp.ndarray,
    corners: jnp.ndarray, corner_mask: jnp.ndarray,
    surfs: jnp.ndarray, surf_mask: jnp.ndarray,
    map_corners: jnp.ndarray, map_corner_mask: jnp.ndarray,
    map_surfs: jnp.ndarray, map_surf_mask: jnp.ndarray,
    cfg: IcpConfig = IcpConfig(),
    axis_name: str | None = None,
) -> IcpResult:
    """Full scan-to-map registration: fixed GN iterations with fresh
    correspondences each iteration, degeneracy-projected updates, and the
    final 6×6 Hessian returned as the degeneracy signal.

    ``axis_name``: when called inside ``shard_map`` with the query point
    arrays (corners/surfs + masks) sharded over a mesh axis and the map
    replicated, pass that axis name — the per-device partial normal
    equations Σ wJᵀJ / Σ wJᵀr are psum-reduced over ICI every iteration (the
    distributed reduced-system pattern), so every device applies the same
    global GN update. The returned IcpResult is replicated.

    Iteration schedule: ``ceil(iters/fit_every)`` correspondence rounds
    (KNN + eigenfits), each followed by ``fit_every`` GN steps on the
    frozen fits — ``fit_every*ceil(iters/fit_every)`` GN steps total
    (== ``iters`` when divisible)."""

    def _reduce(*xs):
        if axis_name is None:
            return xs
        return tuple(jax.lax.psum(x, axis_name) for x in xs)

    def do_fits(pose):
        lf = line_fits(
            pose, corners, corner_mask, map_corners, map_corner_mask, cfg)
        pf = plane_fits(
            pose, surfs, surf_mask, map_surfs, map_surf_mask, cfg)
        return lf, pf

    def normal_eqs(pose, lf, pf):
        rl, Jl, wl = line_residuals(pose, corners, *lf)
        rp, Jp, wp = plane_residuals(pose, surfs, *pf)
        Hl, gl, cl = accumulate_normal_eqs(rl, Jl, wl)
        Hp, gp, cp = accumulate_normal_eqs(rp, Jp, wp)
        return _reduce(Hl + Hp, gl + gp, cl + cp)

    def round_body(_, carry):
        """One correspondence round: fits + normal equations + ONE 6×6
        eigendecomposition at the round's entry, then ``fit_every`` GN
        steps that reuse the frozen eigenbasis for the damped projected
        solve (gradient refreshed every step). This matches LOAM, which
        computes the degeneracy eigendecomposition once (iterCount==0)
        and reuses the projection for every later iteration; with
        fit_every=1 the schedule is the classic fresh-everything
        iteration. The 6×6 Jacobi is ~540 sequential tiny vector ops —
        latency, not FLOPs — so hoisting it out of the inner steps is a
        big per-sweep win on TPU."""
        pose, H, degen, cost, _, _ = carry
        lf, pf = do_fits(pose)
        H, g, cost = normal_eqs(pose, lf, pf)
        eigval, V = E6.jacobi_eigh(H, sweeps=cfg.eig_sweeps)
        ok = (eigval > cfg.degen_eigval).astype(H.dtype)
        degen = 1.0 - ok
        damping = cfg.damping * jnp.maximum(
            jnp.mean(jnp.diagonal(H)), 1.0)

        def solve_retract(pose, g):
            dx = -E6.eig_solve(eigval, V, g, damping=damping, keep=ok)
            return lie.pose_retract(pose, dx)

        pose = solve_retract(pose, g)

        def gn(_, pose):
            # g-only: the H/cost einsums are dead here and XLA DCEs them.
            _, g, _ = normal_eqs(pose, lf, pf)
            return solve_retract(pose, g)

        if cfg.fit_every > 1:
            pose = jax.lax.fori_loop(0, cfg.fit_every - 2, gn, pose)
            # Last inner step keeps (H, cost) at its pre-update pose — the
            # reported last-iteration stats (final_refresh=False path).
            H, g, cost = normal_eqs(pose, lf, pf)
            pose = solve_retract(pose, g)
        return pose, H, degen, cost, lf, pf

    dtype = pose0.dtype
    Qc, Qs = corners.shape[0], surfs.shape[0]
    lf0 = (jnp.zeros((Qc, 3), dtype), jnp.zeros((Qc, 3), dtype),
           jnp.zeros((Qc,), dtype))
    pf0 = (jnp.zeros((Qs, 3), dtype), jnp.zeros((Qs,), dtype),
           jnp.zeros((Qs,), dtype))
    n_rounds = -(-cfg.iters // cfg.fit_every)
    init = (pose0, jnp.zeros((6, 6), dtype), jnp.zeros((6,), dtype),
            jnp.zeros((), dtype), lf0, pf0)
    pose, H, degen, cost, lf, pf = jax.lax.fori_loop(0, n_rounds,
                                                     round_body, init)

    # Final stats at the solution. final_refresh=True: fresh
    # correspondences + full recompute (classic behavior). False: the
    # last GN step's already-computed H/cost (evaluated at the pose one
    # update before the final one, on the last round's frozen fits) —
    # LOAM's published OptStatus Hessian is its last-iteration one too,
    # so stale-by-one stats match reference semantics while saving an
    # entire residual/Jacobian/accumulation pass per register call.
    if cfg.final_refresh:
        lf, pf = do_fits(pose)
        rl, Jl, wl = line_residuals(pose, corners, *lf)
        rp, Jp, wp = plane_residuals(pose, surfs, *pf)
        Hl, _, cl = accumulate_normal_eqs(rl, Jl, wl)
        Hp, _, cp = accumulate_normal_eqs(rp, Jp, wp)
        hessian, cost, n_corr = _reduce(
            Hl + Hp, cl + cp, jnp.sum(wl) + jnp.sum(wp))
    else:
        # H/cost carried from the loop are already axis-reduced
        # (normal_eqs applies _reduce); only n_corr needs the psum.
        hessian = H
        (n_corr,) = _reduce(jnp.sum(lf[2]) + jnp.sum(pf[2]))
    return IcpResult(
        pose=pose,
        hessian=hessian,
        cost=cost,
        n_corr=n_corr,
        degenerate=degen,
    )
