"""Multi-minute soak (VERDICT r2 missing #4): the full VIL stack streamed
over a long drive with carried states, bounded drift, map residency, and
EXACT checkpoint→resume equivalence.

The full-length runs live in scripts/soak.py and are executed on the TPU
(numbers recorded in SCALING.md — 60 s: 1.4 % ATE, healthy 1.00, resume
Δ = 0; 345 s: see SCALING.md). This in-suite version runs a shortened drive
so the chunk-handoff machinery (tracker/EKF/map/engine state carry, IMU
window t_start, relative ICP priors across chunks) stays continuously
covered; set SOAK_FULL=1 to run a 60 s version in-suite."""

import os

import numpy as np
import pytest

from scripts.soak import run_soak


@pytest.mark.slow
def test_chunked_soak_with_checkpoint_resume(tmp_path):
    duration = 60.0 if os.environ.get("SOAK_FULL") else 20.0
    # Small rig in-suite (CPU); the TPU runs use the 800x600 default.
    summary, metrics = run_soak(
        duration=duration, chunk=10.0, cam_w=160, cam_h=120, landmarks=16,
        checkpoint_test=True, checkpoint_dir=str(tmp_path), verbose=False)
    # Bounded drift: a few percent of distance, not divergence.
    assert summary["err_max_m"] < 0.05 * summary["distance_m"], summary
    # Every stage healthy; the gate keeps the well-conditioned drive.
    assert summary["healthy_mean"] > 0.95
    assert summary["keep_mean"] > 0.9
    # Maps populated and bounded by capacity.
    assert 1000 < summary["map_surf_final"] <= 65536
    # Checkpoint→resume reproduces the uninterrupted run exactly.
    assert summary["resume_max_delta"] == 0.0
    # Error is not blowing up at the end (last chunk comparable to max).
    assert summary["err_max_last_chunk_m"] <= summary["err_max_m"] + 1e-6
