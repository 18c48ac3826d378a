"""TPU kernels for the hot ops (Pallas + tuned XLA)."""

from . import knn
from .knn import knn as knn_search, knn_pallas, knn_xla

__all__ = ["knn", "knn_search", "knn_pallas", "knn_xla"]
