"""KNN kernel tests: XLA path vs brute-force numpy, Pallas path in
interpreter mode vs the XLA path (bit-identical algorithm)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vil_sensor_fusion_tpu.ops import knn as KNN


def _brute(q, t, mask, k):
    d = ((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)
    d[:, mask <= 0] = np.inf
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


@pytest.fixture
def problem():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((50, 3)).astype(np.float32) * 5
    t = rng.standard_normal((700, 3)).astype(np.float32) * 5
    mask = (rng.uniform(size=700) > 0.1).astype(np.float32)
    return q, t, mask


class TestKnnXla:
    def test_matches_bruteforce(self, problem):
        q, t, mask = problem
        idx, d2 = KNN.knn_xla(jnp.asarray(q), jnp.asarray(t),
                              jnp.asarray(mask), k=5, target_block=128)
        bi, bd = _brute(q, t, mask, 5)
        np.testing.assert_allclose(np.asarray(d2), bd, rtol=1e-4, atol=1e-4)
        # Indices may differ on exact ties; distances must match, and each
        # returned index must point at a matching-distance valid target.
        di = ((q[:, None, :] - t[np.asarray(idx)]) ** 2).sum(-1)
        np.testing.assert_allclose(di, bd, rtol=1e-4, atol=1e-4)
        assert (mask[np.asarray(idx)] > 0).all()

    def test_all_masked_returns_inf(self):
        q = jnp.zeros((4, 3))
        t = jnp.ones((16, 3))
        idx, d2 = KNN.knn_xla(q, t, jnp.zeros(16), k=3, target_block=8)
        assert bool(jnp.isinf(d2).all())

    def test_sorted_ascending(self, problem):
        q, t, mask = problem
        _, d2 = KNN.knn_xla(jnp.asarray(q), jnp.asarray(t),
                            jnp.asarray(mask), k=5)
        d = np.asarray(d2)
        assert (np.diff(d, axis=1) >= -1e-6).all()


class TestKnnPallasInterpret:
    def test_matches_xla(self, problem):
        q, t, mask = problem
        ix, dx = KNN.knn_xla(jnp.asarray(q), jnp.asarray(t),
                             jnp.asarray(mask), k=5, target_block=128)
        ip, dp = KNN.knn_pallas(jnp.asarray(q), jnp.asarray(t),
                                jnp.asarray(mask), k=5, query_block=32,
                                interpret=True, select_bf16=False)
        # Same algorithm but different reduction grouping (the Pallas path
        # runs the distance matmul on padded/transposed f32 tiles), so
        # distances agree to f32 round-off, not bit-exactly.
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dx),
                                   rtol=1e-4, atol=1e-4)
        # Indices may swap on near-tie distances; every returned index must
        # point at a target whose true distance matches.
        q64 = q.astype(np.float64)
        dtrue_p = ((q64[:, None, :] - t[np.asarray(ip)]) ** 2).sum(-1)
        dtrue_x = ((q64[:, None, :] - t[np.asarray(ix)]) ** 2).sum(-1)
        np.testing.assert_allclose(dtrue_p, dtrue_x, rtol=1e-4, atol=1e-4)

    def test_bf16_selection_contract(self, problem):
        """The default (select_bf16=True) path returns bf16-ranked
        neighbors: every returned index must be a valid target whose true
        distance is within bf16 resolution of the exact k-NN distance."""
        q, t, mask = problem
        _, dx = KNN.knn_xla(jnp.asarray(q), jnp.asarray(t),
                            jnp.asarray(mask), k=5, target_block=128)
        ip, dp = KNN.knn_pallas(jnp.asarray(q), jnp.asarray(t),
                                jnp.asarray(mask), k=5, query_block=32,
                                interpret=True, select_bf16=True)
        assert (mask[np.asarray(ip)] > 0).all()
        dtrue = ((q[:, None, :].astype(np.float64)
                  - t[np.asarray(ip)]) ** 2).sum(-1)
        # Reported distances are bf16-rounded versions of the true ones.
        np.testing.assert_allclose(np.asarray(dp), dtrue, rtol=1e-2,
                                   atol=1e-2)
        # Selected neighbors are within bf16 ranking slack of the exact set.
        np.testing.assert_allclose(np.sort(dtrue, axis=1), np.asarray(dx),
                                   rtol=1e-2, atol=1e-2)


class TestKnnApproxChunking:
    def test_small_query_set_clamped_chunk(self):
        """A query set far below the default chunk must not change results
        (the clamp only avoids padding waste)."""
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((37, 3)), jnp.float32)
        t = jnp.asarray(rng.standard_normal((500, 3)), jnp.float32)
        m = jnp.ones((500,), jnp.float32)
        ia, da = KNN.knn_approx(q, t, m, k=4, query_chunk=2048)
        ib, db = KNN.knn_topk(q, t, m, k=4)
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   rtol=1e-5, atol=1e-5)
