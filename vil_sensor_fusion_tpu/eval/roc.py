"""Degeneracy-detector quality evaluation: ROC / AUC over hand-labeled
degenerate time windows — the offline analysis of
vil_fusion/python/make_prettier_graphs.py (calc_roc at :579-588, labeled
windows DEGEN_ROT / DEGEN_TRANS at :46-120, ROC plots at :787-1008).

The reference sweeps 100 score-percentile thresholds with numpy per bag; here
the sweep is one batched comparison and AUC is computed by trapezoid over the
sorted (fpr, tpr) curve, jit-friendly and vmappable over many (bag, metric)
pairs at once.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp


class RocCurve(NamedTuple):
    thresholds: jnp.ndarray  # (K,)
    tpr: jnp.ndarray         # (K,)
    fpr: jnp.ndarray         # (K,)
    auc: jnp.ndarray         # scalar


def label_windows(
    times: jnp.ndarray,
    windows: Sequence[tuple],
    kind: str | None = None,
) -> jnp.ndarray:
    """Boolean degenerate-label series from labeled second windows — the
    DEGEN_ROT/DEGEN_TRANS dictionaries' semantics
    (make_prettier_graphs.py:46-120).

    Windows are ``(start, end)`` or ``(start, end, kind)`` with kind in
    {"trans", "rot", "both"}; bare 2-tuples count as "trans". Pass
    ``kind="rot"``/``"trans"`` to label only that degeneracy type (windows
    tagged "both" match either); ``kind=None`` labels every window."""
    lab = jnp.zeros(times.shape, bool)
    for w in windows:
        a, b = float(w[0]), float(w[1])
        k = w[2] if len(w) > 2 else "trans"
        if kind is not None and k != kind and k != "both":
            continue
        lab = lab | ((times >= a) & (times <= b))
    return lab


def roc(
    is_degen: jnp.ndarray,
    score: jnp.ndarray,
    num_thresholds: int = 100,
    low_is_degenerate: bool = True,
) -> RocCurve:
    """ROC with score-quantile thresholds, matching calc_roc: the detector
    flags 'degenerate' when ``score <= threshold`` (all thesis metrics have
    low = degenerate polarity; pass ``low_is_degenerate=False`` to flip).

    Args:
      is_degen: (T,) boolean ground-truth labels.
      score: (T,) metric values.
    """
    if not low_is_degenerate:
        score = -score
    qs = jnp.linspace(0.0, 1.0, num_thresholds)
    thresholds = jnp.quantile(score, qs)
    est = score[None, :] <= thresholds[:, None]          # (K, T)
    pos = is_degen[None, :]
    tp = jnp.sum(est & pos, axis=1)
    fp = jnp.sum(est & ~pos, axis=1)
    n_pos = jnp.maximum(jnp.sum(is_degen), 1)
    n_neg = jnp.maximum(jnp.sum(~is_degen), 1)
    tpr = tp / n_pos
    fpr = fp / n_neg
    # fpr is monotonically nondecreasing over quantile thresholds, so the
    # trapezoid over (fpr, tpr) is the standard AUC.
    auc = jnp.trapezoid(tpr, fpr)
    return RocCurve(thresholds=thresholds, tpr=tpr, fpr=fpr, auc=auc)


def auc_table(
    scores: dict,
    labels: jnp.ndarray,
    num_thresholds: int = 100,
) -> dict:
    """AUC per metric name — the summary the reference prints per bag in
    plot_all_rocs. ``scores`` maps name -> (T,) series."""
    return {
        name: float(roc(labels, s, num_thresholds).auc)
        for name, s in scores.items()
    }
