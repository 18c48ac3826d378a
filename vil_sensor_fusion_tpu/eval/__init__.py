"""Evaluation: online diagnostics (DiagnosticMessage parity) + offline
ATE/RPE and ROC/AUC analysis (L6/L7 of SURVEY.md §1)."""

from . import correlations
from . import diagnostics
from . import plots
from . import roc
from .correlations import CorrelationResult, search as correlation_search
from .diagnostics import DiagnosticSeries, ate_rmse, diagnostics as diagnostic_series, rpe
from .roc import RocCurve, auc_table, label_windows, roc as roc_curve

__all__ = [
    "correlations",
    "diagnostics",
    "plots",
    "roc",
    "CorrelationResult",
    "correlation_search",
    "DiagnosticSeries",
    "ate_rmse",
    "diagnostic_series",
    "rpe",
    "RocCurve",
    "auc_table",
    "label_windows",
    "roc_curve",
]
