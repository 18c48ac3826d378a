"""Multi-host (jax.distributed) smoke test: 2 CPU processes form a
cluster, build one global mesh, assemble host-sharded global arrays, and
run the data-parallel fusion workload with a cross-process psum — the
multi-host code path of SURVEY.md §2c, which the reference (ROS on
localhost) never had."""

import importlib.util
import sys
from pathlib import Path
import pytest

# Long-running e2e coverage: excluded from the fast default loop
# (pytest -m 'not slow').
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "multihost_bench", REPO / "scripts" / "multihost_bench.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_two_process_cluster_runs():
    m = _load_bench()
    out = m.run_cluster(2, 2, batch_per_device=1)
    assert out["processes"] == 2
    assert out["events_per_s"] > 0
    # Weak scaling: the global batch spans both hosts' devices.
    assert out["global_events"] == 2 * 2 * 1 * 48
