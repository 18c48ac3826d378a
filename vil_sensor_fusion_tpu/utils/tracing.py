"""Tracing / profiling (SURVEY.md §5).

The reference's only "tracing" is commented-out ``std::cout``/``ROS_INFO``
lines (GraphManager.cpp:103,119-123; SensorManagerRos.cpp:13,30-33) and a
``loamVerbosity`` knob. Here we provide real observability:

- :func:`annotate` — named ``jax.profiler`` trace annotations so stages show
  up in TensorBoard/Perfetto device traces.
- :func:`device_trace` — context manager wrapping ``jax.profiler.trace`` to a
  log directory (one call per profiled run).
- :class:`StageTimer` — lightweight wall-clock stage timing with
  ``block_until_ready`` semantics, exportable as JSON; this is the per-kernel
  timing table the reference never had.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Dict, List

import jax


@contextlib.contextmanager
def annotate(name: str):
    """Named region that appears in device profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a full device trace (XLA ops, Pallas kernels) to ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageOutput:
    """Mutable holder yielded by :meth:`StageTimer.stage`: the stage body
    assigns the value(s) it launches to ``.value`` and the timer blocks on
    them when the stage exits, so async device work dispatched *inside* the
    block is attributed to the stage that launched it."""

    __slots__ = ("value",)

    def __init__(self):
        self.value: Any = None


class StageTimer:
    """Accumulates per-stage wall times. ``stage`` yields a
    :class:`StageOutput`; set ``.value`` to the stage's device output and the
    timer blocks on it at exit (plus any pre-existing ``block_on`` value)."""

    def __init__(self):
        self._records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on: Any = None):
        holder = StageOutput()
        t0 = time.perf_counter()
        try:
            yield holder
        finally:
            if holder.value is not None:
                jax.block_until_ready(holder.value)
            if block_on is not None:
                jax.block_until_ready(block_on)
            self._records.setdefault(name, []).append(
                time.perf_counter() - t0)

    def time(self, name: str, fn, *args, **kwargs):
        """Run ``fn`` and block on its result, recording wall time."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self._records.setdefault(name, []).append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, times in self._records.items():
            n = len(times)
            total = sum(times)
            out[name] = {
                "calls": n,
                "total_s": total,
                "mean_s": total / n,
                "min_s": min(times),
                "max_s": max(times),
            }
        return out

    def json(self) -> str:
        return json.dumps(self.summary(), indent=2, sort_keys=True)
