"""Offline-evaluation layer tests: correlation brute-force and plotting."""

import numpy as np
import jax.numpy as jnp
import pytest

from vil_sensor_fusion_tpu import eval as ev


def _spd_series(T, degenerate_mask, rng):
    """SPD series whose log-det tracks a 'health' signal: degenerate frames
    get a collapsed eigenvalue."""
    mats = np.zeros((T, 6, 6))
    for t in range(T):
        A = rng.standard_normal((6, 6))
        m = A @ A.T + 6 * np.eye(6)
        if degenerate_mask[t]:
            m[0, 0] = 1e-4
        mats[t] = m
    return jnp.asarray(mats)


class TestCorrelationSearch:
    def test_finds_planted_correlation(self):
        rng = np.random.default_rng(0)
        T = 120
        degen = np.zeros(T, bool)
        degen[40:80] = True
        mats = _spd_series(T, degen, rng)
        # Error signal spikes in the degenerate window.
        err = 0.05 + 0.5 * degen + 0.01 * rng.standard_normal(T)
        res = ev.correlation_search(
            ["d_opt", "a_opt", "norm_frobenius"], mats,
            {"abs_dist_err": err}, top_k=10)
        assert len(res) == 10
        top = res[0]
        assert abs(top.pearson_r) > 0.5
        # d_opt of the 'all'/'trans' block should rank near the top: the
        # planted degeneracy is a determinant collapse.
        assert any(r.metric == "d_opt" and abs(r.pearson_r) > 0.5
                   for r in res)

    def test_handles_nan_signals(self):
        rng = np.random.default_rng(1)
        mats = _spd_series(10, np.zeros(10, bool), rng)
        err = np.full(10, np.nan)
        res = ev.correlation_search(["a_opt"], mats, {"nanerr": err})
        assert res == []


class TestPlots:
    def test_plot_files_created(self, tmp_path):
        t = np.linspace(0, 10, 100)
        ev.plots.plot_metric_over_time(
            t, {"d_opt": np.sin(t)}, degen_windows=[(3, 5)],
            path=str(tmp_path / "m.png"))
        curve = ev.roc_curve(jnp.asarray(t > 5), jnp.asarray(-t))
        ev.plots.plot_rocs({"d_opt": curve}, path=str(tmp_path / "r.png"))
        ev.plots.plot_error_over_time(
            {"fusion": (t, np.abs(np.sin(t)))},
            degen_windows=[(3, 5)], path=str(tmp_path / "e.png"))
        for f in ["m.png", "r.png", "e.png"]:
            assert (tmp_path / f).stat().st_size > 1000
