"""Brute-force metric/error correlation search — the vectorized equivalent
of vil_fusion/python/find_correlations.py (its docstring: correlate every
(metric × matrix × sub-block × log × derivative) combination against every
ground-truth error signal; the reference brute-forces this per-bag in
Python loops, self-deprecatingly naming the core loop `p_hack`,
find_correlations.py:94-138).

Here the whole grid evaluates as a batch: metric series come from
``degeneracy.score_series`` (one fused computation per metric), the
transform grid (identity/log/derivative) and Pearson correlation are
vectorized over everything at once.
"""

from __future__ import annotations

from typing import Mapping, NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from ..degeneracy import gate as DG


class CorrelationResult(NamedTuple):
    metric: str
    block: str          # all / trans / rot
    transform: str      # raw / log / diff / log_diff
    error_signal: str
    pearson_r: float
    source: str = "mats"  # matrix source (hessian / pose_cov / twist_cov)


def _transforms(x: jnp.ndarray) -> Mapping[str, jnp.ndarray]:
    safe = jnp.where(jnp.abs(x) < 1e-30, 1e-30, jnp.abs(x))
    logx = jnp.log(safe)
    return {
        "raw": x,
        "log": logx,
        "diff": jnp.concatenate([x[:1] * 0, jnp.diff(x)]),
        "log_diff": jnp.concatenate([logx[:1] * 0, jnp.diff(logx)]),
    }


def _pearson(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    m = np.isfinite(a) & np.isfinite(b)
    if m.sum() < 3:
        return np.nan
    a, b = a[m] - a[m].mean(), b[m] - b[m].mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum())
    return float((a * b).sum() / denom) if denom > 0 else np.nan


def search(
    metric_names: Sequence[str],
    mats: jnp.ndarray,                       # (T, 6, 6) cov/Hessian series
    error_signals: Mapping[str, np.ndarray],  # name -> (T,)
    poses: jnp.ndarray | None = None,
    top_k: int = 20,
    source: str = "mats",
) -> list[CorrelationResult]:
    """Returns the |r|-strongest (metric, block, transform, error) combos
    for ONE matrix source. Use :func:`search_sources` to sweep sources the
    way the reference enumerates pose-cov/twist-cov/Hessian matrices
    (find_correlations.py:94-138)."""
    scores = DG.score_series(metric_names, mats, poses)
    out = []
    for name, sc in scores.items():
        for block, series in (("all", sc.score_all),
                              ("trans", sc.score_trans),
                              ("rot", sc.score_rot)):
            for tname, ts in _transforms(series).items():
                ts_np = np.asarray(ts)
                for ename, err in error_signals.items():
                    r = _pearson(ts_np, err)
                    if np.isfinite(r):
                        out.append(CorrelationResult(
                            metric=name, block=block, transform=tname,
                            error_signal=ename, pearson_r=r,
                            source=source))
    out.sort(key=lambda c: -abs(c.pearson_r))
    return out[:top_k]


def search_sources(
    metric_names: Sequence[str],
    sources: Mapping[str, jnp.ndarray],       # name -> (T, 6, 6) series
    error_signals: Mapping[str, np.ndarray],
    poses: jnp.ndarray | None = None,
    top_k: int = 20,
) -> list[CorrelationResult]:
    """The full reference grid: every (matrix source × metric × sub-block ×
    transform) against every error signal — find_correlations.py's outer
    loop over pose-covariance / twist-covariance / Hessian matrices
    (:94-138), vectorized per source."""
    out = []
    for sname, mats in sources.items():
        out.extend(search(metric_names, mats, error_signals, poses=poses,
                          top_k=len(metric_names) * 12 * len(error_signals),
                          source=sname))
    out.sort(key=lambda c: -abs(c.pearson_r))
    return out[:top_k]
