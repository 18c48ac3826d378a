"""Experiment harness: cached batch runs + per-run reports — the
auto_experiments / quick_autoexperiments / make_prettier_graphs pipeline
(carla_tools/scripts/auto_experiments.py:52-99,
vil_fusion/python/make_prettier_graphs.py:477-535,736-765,787-1149)."""

import json
import os

import numpy as np
import pytest

from vil_sensor_fusion_tpu.eval import experiments as EX


@pytest.mark.slow
def test_run_report_and_cache(tmp_path):
    cache = str(tmp_path / "cache")
    reports = str(tmp_path / "reports")
    # One degenerate cell (tunnel has labeled windows -> ROC) with a short
    # drive; dists off to keep the test quick.
    spec = EX.ExperimentSpec(kind="tunnel", duration=4.0, seed=0,
                             emit_dists=False)
    summaries = EX.run_and_report([spec], cache, reports)
    assert len(summaries) == 1
    s = summaries[0]
    assert s["ate_fused"] < 1.0
    # Tunnel: labeled windows exist and produced AUC entries.
    assert s["auc"], s
    assert 0.0 <= min(s["auc"].values()) and max(s["auc"].values()) <= 1.0
    run_dir = os.path.join(reports, spec.key())
    for f in ("error_over_time.png", "metrics_over_time.png", "roc.png",
              "report.json"):
        assert os.path.exists(os.path.join(run_dir, f)), f
    with open(os.path.join(reports, "summary.json")) as f:
        top = json.load(f)
    assert top["runs"][0]["spec"]["kind"] == "tunnel"
    # Cross-run aggregate (plot_all_rocs parity): pooled ROC figure, ATE
    # table, calibrated thresholds.
    agg_dir = os.path.join(reports, "aggregate")
    for f in ("roc_all.png", "ate_table.png", "summary.json"):
        assert os.path.exists(os.path.join(agg_dir, f)), f
    assert "calibrated_thresholds" in top["aggregate"]
    assert "trans_threshold" in top["aggregate"]["calibrated_thresholds"]

    # Cache hit: the second run loads from disk and reproduces the summary.
    cached = EX.run_experiment(spec, cache)
    assert float(cached["ate_fused"]) == s["ate_fused"]
    s2 = EX.report(cached, str(tmp_path / "reports2"))
    assert s2["auc"] == s["auc"]
