"""Fusion engine: sensor registry + synchronous measurement timeline
(replaces gtsam_fusion_node + SensorManagerRos, SURVEY.md §7.7)."""

from . import engine
from .engine import (
    EngineState,
    FusedOutput,
    FusionConfig,
    SensorSpec,
    Timeline,
    init,
    merge_timeline,
    run,
    step,
)

__all__ = [
    "engine",
    "EngineState",
    "FusedOutput",
    "FusionConfig",
    "SensorSpec",
    "Timeline",
    "init",
    "merge_timeline",
    "run",
    "step",
]
