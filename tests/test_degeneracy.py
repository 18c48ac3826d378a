"""Degeneracy metric + gate tests.

Validates the JAX metric library against independent numpy computations of
the same formulas the reference applies per-message
(vil_fusion/python/degeneracy_detection_functions.py:38-303), and the final
log-det gate against the threshold semantics of
gtsam_fusion/src/degerate_odometry_filter.cpp:29-48.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from vil_sensor_fusion_tpu import degeneracy as deg
from vil_sensor_fusion_tpu.degeneracy import metrics as M


def _spd(rng, n=6, batch=()):
    A = rng.standard_normal(batch + (n, n))
    return A @ np.swapaxes(A, -1, -2) + n * np.eye(n)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestMetrics:
    def test_d_opt(self, rng):
        m = _spd(rng, batch=(5,))
        got = np.asarray(M.d_opt(jnp.asarray(m)))
        want = np.exp(np.linalg.slogdet(m)[1] / 6.0)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_a_opt_and_e_opt(self, rng):
        m = _spd(rng, batch=(5,))
        np.testing.assert_allclose(
            np.asarray(M.a_opt(jnp.asarray(m))), np.trace(m, axis1=-2, axis2=-1))
        np.testing.assert_allclose(
            np.asarray(M.e_opt(jnp.asarray(m))),
            np.linalg.eigvalsh(m).min(axis=-1), rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(M.max_eigen(jnp.asarray(m))),
            np.linalg.eigvalsh(m).max(axis=-1), rtol=1e-9)

    def test_differential_entropy(self, rng):
        m = _spd(rng)
        got = float(M.differential_entropy(jnp.asarray(m)))
        want = 0.5 * np.log(((2 * np.pi * np.e) ** 6) * np.linalg.det(m))
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_condition_number_polarity(self, rng):
        m = _spd(rng)
        cn = float(M.condition_number(jnp.asarray(m)))
        cc = float(M.condition_cov(jnp.asarray(m)))
        assert cn == pytest.approx(-cc)
        assert cc == pytest.approx(np.linalg.cond(m), rel=1e-8)

    def test_norms(self, rng):
        m = _spd(rng, batch=(3,))
        jm = jnp.asarray(m)
        np.testing.assert_allclose(
            np.asarray(M.norm_frobenius(jm)),
            np.linalg.norm(m, ord="fro", axis=(-2, -1)), rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(M.norm_nuclear(jm)),
            np.linalg.norm(m, ord="nuc", axis=(-2, -1)), rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(M.norm_1(jm)),
            np.linalg.norm(m, ord=1, axis=(-2, -1)), rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(M.norm_2(jm)),
            np.linalg.norm(m, ord=2, axis=(-2, -1)), rtol=1e-9)

    def test_ratio_variants(self, rng):
        a, b = _spd(rng), _spd(rng)
        r = a @ np.linalg.inv(b)
        got = float(M.d_opt_ratio(jnp.asarray(a), jnp.asarray(b)))
        want = np.exp(np.linalg.slogdet(r)[1] / 6.0)
        np.testing.assert_allclose(got, want, rtol=1e-9)
        got = float(M.a_opt_ratio(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, np.trace(r), rtol=1e-9)
        # e_opt of the symmetrized ratio equals the generalized eigmin
        got = float(M.e_opt_ratio(jnp.asarray(a), jnp.asarray(b)))
        want = np.linalg.eigvalsh(0.5 * (r + r.T)).min()
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_jensen_bregman(self, rng):
        a, b = _spd(rng), _spd(rng)
        got = float(M.jensen_bregman(jnp.asarray(a), jnp.asarray(b)))
        want = (np.linalg.slogdet(0.5 * (a + b))[1]
                - 0.5 * np.linalg.slogdet(a @ b)[1])
        np.testing.assert_allclose(got, want, rtol=1e-9)
        assert want >= 0.0  # JBLD is a divergence

    def test_kullback_leibler_identity_is_zero(self, rng):
        a = _spd(rng)
        got = float(M.kullback_leibler(jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_allclose(got, 0.0, atol=1e-9)

    def test_kullback_leibler_with_pose(self, rng):
        a, b = _spd(rng), _spd(rng)
        u1 = rng.standard_normal(6)
        u2 = rng.standard_normal(6)
        got = float(M.kullback_leibler(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(u2), jnp.asarray(u1)))
        # KL(N(u1,B) || N(u2,A)) — reference formula with E1=prev(B), E2=now(A)
        Ai = np.linalg.inv(a)
        du = u1 - u2
        want = 0.5 * (np.trace(Ai @ b) - 6 + du @ Ai @ du
                      + np.log(np.linalg.det(a) / np.linalg.det(b)))
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_correlation_matrix_distance(self, rng):
        a = _spd(rng)
        # identical matrices -> distance 0; scaled copy -> also 0 (scale-free)
        assert float(M.correlation_matrix_distance(
            jnp.asarray(a), jnp.asarray(a))) == pytest.approx(0.0, abs=1e-12)
        assert float(M.correlation_matrix_distance(
            jnp.asarray(a), jnp.asarray(3.0 * a))) == pytest.approx(0.0, abs=1e-12)
        b = _spd(rng)
        d = float(M.correlation_matrix_distance(jnp.asarray(a), jnp.asarray(b)))
        assert 0.0 < d < 1.0

    def test_dist_slope_matches_linregress(self, rng):
        shifts = np.linspace(-0.5, 0.5, 15)
        dists = 3.0 * shifts + 0.2 + 0.01 * rng.standard_normal(15)
        got = float(M.dist_slope(jnp.asarray(dists), jnp.asarray(shifts)))
        want = stats.linregress(shifts, dists).slope
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_dist_slopes_6dof(self, rng):
        st = np.linspace(-0.3, 0.3, 15)
        sr = np.linspace(-0.1, 0.1, 15)
        slopes = np.array([1.0, -2.0, 0.5, 4.0, 0.0, -1.0])
        d = slopes[:, None] * np.concatenate(
            [np.tile(st, (3, 1)), np.tile(sr, (3, 1))], axis=0)
        got = np.asarray(M.dist_slopes_6dof(
            jnp.asarray(d), jnp.asarray(st), jnp.asarray(sr)))
        np.testing.assert_allclose(got, slopes, atol=1e-9)

    def test_registry_complete(self):
        # Every metric name the reference's degen_funcs list exposes must be
        # in the registry (research superset, functions.py:287-303).
        required = {
            "d_opt", "d_opt_ratio", "a_opt", "a_opt_ratio", "e_opt",
            "e_opt_ratio", "max_eigen", "max_eigen_ratio", "jensen_bregman",
            "correlation_matrix_distance", "kullback_leibler",
            "kullback_leibler_0pose", "kullback_leibler_0cov",
            "differential_entropy", "condition_number",
            "norm_frobenius", "norm_frobenius_ratio", "norm_nuclear",
            "norm_nuclear_ratio", "norm_1", "norm_1_ratio", "norm_2",
            "norm_2_ratio",
        }
        assert required <= set(M.METRICS)


class TestGate:
    def test_logdet_gate_thresholds(self):
        # Hessian with strong information in every direction -> keep.
        strong = jnp.eye(6) * 1e3          # logdet(3x3 block) = 3*log(1e3) ≈ 20.7
        weak = jnp.eye(6) * 1e3
        weak = weak.at[0, 0].set(1e-3)     # translation x unobservable
        h = jnp.stack([strong, weak])
        cfg = deg.GateConfig(rot_threshold=11.5, trans_threshold=20.0)
        res = deg.logdet_gate(h, cfg)
        np.testing.assert_allclose(np.asarray(res.keep), [1.0, 0.0])
        # score values match direct slogdet of the blocks
        np.testing.assert_allclose(
            float(res.trans_d_opt[0]), 3 * np.log(1e3), rtol=1e-12)
        np.testing.assert_allclose(
            float(res.rot_d_opt[1]), 3 * np.log(1e3), rtol=1e-12)

    def test_gate_drops_on_rotation_too(self):
        h = jnp.eye(6) * 1e3
        h = h.at[5, 5].set(1e-6)           # yaw unobservable
        res = deg.logdet_gate(h[None], deg.GateConfig(11.5, 11.5))
        assert float(res.keep[0]) == 0.0

    def test_score_series_shapes_and_derivative(self):
        rng = np.random.default_rng(1)
        mats = jnp.asarray(_spd(rng, batch=(10,)))
        out = deg.score_series(["d_opt", "a_opt"], mats)
        s = out["a_opt"]
        assert s.score_all.shape == (10,)
        # derivative is the first difference with score[-1]=0
        np.testing.assert_allclose(
            np.asarray(s.derivative_all[1:]),
            np.asarray(s.score_all[1:] - s.score_all[:-1]), rtol=1e-12)
        np.testing.assert_allclose(
            float(s.derivative_all[0]), float(s.score_all[0]), rtol=1e-12)
        # trans/rot sub-blocks are the top-left / bottom-right 3x3 traces
        np.testing.assert_allclose(
            np.asarray(s.score_trans),
            np.trace(np.asarray(mats)[:, :3, :3], axis1=-2, axis2=-1))
