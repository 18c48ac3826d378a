"""Evaluation: online diagnostics (DiagnosticMessage parity) + offline
ATE/RPE and ROC/AUC analysis (L6/L7 of SURVEY.md §1)."""

from . import correlations
from . import diagnostics
from . import experiments
from . import plots
from . import roc
from .correlations import CorrelationResult, search as correlation_search, search_sources as correlation_search_sources
from .diagnostics import DiagnosticSeries, anchor_first_pose, ate_rmse, diagnostics as diagnostic_series, rpe, umeyama_alignment
from .roc import RocCurve, auc_table, label_windows, roc as roc_curve

__all__ = [
    "correlations",
    "diagnostics",
    "experiments",
    "plots",
    "roc",
    "CorrelationResult",
    "correlation_search", "correlation_search_sources",
    "DiagnosticSeries",
    "anchor_first_pose", "ate_rmse", "umeyama_alignment",
    "diagnostic_series",
    "rpe",
    "RocCurve",
    "auc_table",
    "label_windows",
    "roc_curve",
]
