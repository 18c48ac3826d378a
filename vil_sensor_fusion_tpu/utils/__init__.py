"""Auxiliary subsystems the reference lacks (SURVEY.md §5): checkpoint /
resume, tracing / profiling, failure detection + elastic recovery."""

from . import checkpoint, health, tracing  # noqa: F401
from .checkpoint import CheckpointManager, restore, save  # noqa: F401
from .health import (HealthLimits, all_finite, check_state,  # noqa: F401
                     finite_fraction, guarded_update, wrap_step)
from .tracing import StageTimer, annotate, device_trace  # noqa: F401
