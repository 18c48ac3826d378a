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


class TestUmeyamaAte:
    def test_alignment_recovers_rigid_gauge(self):
        """A gauge-transformed copy of a trajectory has zero aligned ATE —
        the gauge-free comparison reference-parity ATE needs (evo/TUM
        convention; the reference hand-anchors frames instead,
        carla_frame_transforms.py:32-86)."""
        import jax
        from vil_sensor_fusion_tpu import eval as ev
        from vil_sensor_fusion_tpu.core import lie

        rng = np.random.default_rng(0)
        t = jnp.asarray(rng.standard_normal((40, 3)) * 5.0)
        q = jnp.broadcast_to(lie.quat_identity(t.dtype), (40, 4))
        gt = jnp.concatenate([q, t], axis=-1)
        # Arbitrary rigid gauge: rotate + translate the whole trajectory.
        g = lie.pose_make(
            lie.so3_exp_quat(jnp.array([0.3, -0.2, 1.1], t.dtype)),
            jnp.array([10.0, -4.0, 2.0], t.dtype))
        est = jax.vmap(lambda p: lie.pose_compose(g, p))(gt)

        raw = float(ev.ate_rmse(est, gt))
        aligned = float(ev.ate_rmse(est, gt, align=True))
        assert raw > 1.0
        assert aligned < 1e-4

    def test_alignment_preserves_real_error(self):
        from vil_sensor_fusion_tpu import eval as ev
        from vil_sensor_fusion_tpu.core import lie

        rng = np.random.default_rng(1)
        t = jnp.asarray(rng.standard_normal((60, 3)) * 5.0)
        q = jnp.broadcast_to(lie.quat_identity(t.dtype), (60, 4))
        gt = jnp.concatenate([q, t], axis=-1)
        noise = jnp.asarray(rng.standard_normal((60, 3)) * 0.1)
        est = jnp.concatenate([q, t + noise], axis=-1)
        aligned = float(ev.ate_rmse(est, gt, align=True))
        # Alignment cannot hide genuine per-pose noise.
        assert 0.03 < aligned < 0.2


class TestCorrelationSources:
    def test_source_sweep_finds_planted_source(self):
        """The reference enumerates matrix sources (pose cov / twist cov /
        Hessian — find_correlations.py:94-138). Plant a correlated signal in
        ONE source's d-opt and verify the sweep attributes it there."""
        from vil_sensor_fusion_tpu import eval as ev

        rng = np.random.default_rng(2)
        T = 80
        sig = rng.uniform(1.0, 3.0, T)
        # hessian: log-det follows `sig`; covariances: constant.
        hess = jnp.asarray(
            np.exp(sig)[:, None, None] * np.eye(6)[None], jnp.float64)
        cov = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float64), (T, 6, 6))
        res = ev.correlation_search_sources(
            ["d_opt"],
            {"hessian": hess, "pose_cov": cov},
            {"err": sig},
            top_k=5,
        )
        assert res[0].source == "hessian"
        assert abs(res[0].pearson_r) > 0.95


class TestFrameAnchor:
    def test_anchor_first_pose_matches_reference_semantics(self):
        """carla_frame_transforms.py:32-86 capability: linking the
        estimator's world frame to GT at the initial pose. After anchoring,
        the first pose matches GT exactly and a rigidly-offset trajectory
        becomes identical to GT."""
        import jax
        from vil_sensor_fusion_tpu import eval as ev
        from vil_sensor_fusion_tpu.core import lie

        rng = np.random.default_rng(3)
        t = jnp.asarray(np.cumsum(rng.standard_normal((20, 3)), axis=0))
        q = jax.vmap(lambda v: lie.so3_exp_quat(v * 0.1))(
            jnp.asarray(rng.standard_normal((20, 3))))
        gt = jax.vmap(lie.pose_make)(q, t)
        g = lie.pose_make(
            lie.so3_exp_quat(jnp.array([0.1, -0.7, 0.4])),
            jnp.array([5.0, 1.0, -2.0]))
        est = jax.vmap(lambda p: lie.pose_compose(g, p))(gt)

        anchored = ev.anchor_first_pose(est, gt)
        np.testing.assert_allclose(np.asarray(anchored),
                                   np.asarray(gt), atol=1e-9)
        ate = float(ev.ate_rmse(anchored, gt))
        assert ate < 1e-9


class TestTrajectoryView:
    def test_writes_selfcontained_html(self, tmp_path):
        """The RViz-equivalent artifact: one dependency-free HTML with all
        tracks, errors vs gt, and gate-drop markers embedded."""
        import numpy as np
        from vil_sensor_fusion_tpu.eval.trajectory_view import write_view

        t = np.linspace(0, 10, 50)
        gt = np.zeros((50, 7)); gt[:, 0] = 1.0
        gt[:, 4] = t; gt[:, 5] = np.sin(t)
        fused = gt.copy(); fused[:, 4] += 0.1
        keep = np.ones(50); keep[[7, 20]] = 0.0
        path = write_view(str(tmp_path / "v.html"),
                          {"gt": (t, gt), "fused": (t, fused),
                           "lidar": (t, gt)},
                          gate_keep=keep)
        html = open(path).read()
        assert "fused" in html and "lidar" in html
        assert '"drops": [7, 20]' in html
        assert "<canvas" in html and "DATA" in html
        # err embedded for non-gt tracks
        assert '"err"' in html
