"""Closed-form/fixed-iteration eigendecomposition kernels (ops/eig3,
ops/eig6) vs LAPACK ground truth — the hot-path replacements for
jnp.linalg.eigh/solve/inv in the ICP loop (each costs ~2.5 ms per call on
TPU; see the module docstrings)."""

import numpy as np
import jax.numpy as jnp

from vil_sensor_fusion_tpu.ops import eig3, eig6


def _random_spd3(n, rng, rank=None):
    P = rng.standard_normal((n, 5, 3))
    if rank is not None:
        P[..., rank:] = 0.0
    return np.einsum("qki,qkj->qij", P, P) / 5.0


class TestEig3:
    def test_matches_lapack_generic(self):
        rng = np.random.default_rng(0)
        A = jnp.asarray(_random_spd3(512, rng))
        w_ref, V_ref = np.linalg.eigh(np.asarray(A))
        w, V = eig3.eigh3(A)
        np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-8)
        # Eigenvectors match up to sign.
        dots = np.abs(np.einsum("qij,qij->qj", V_ref, np.asarray(V)))
        assert dots.min() > 1 - 1e-6, dots.min()

    def test_rank_deficient_stays_finite(self):
        """Collinear neighbor sets (rank-1 scatters) must not produce NaNs
        — the ICP eligibility gates discard them, but only if the values
        are finite."""
        rng = np.random.default_rng(1)
        P = rng.standard_normal((64, 5, 1)) * np.array([[[1.0, 2.0, -0.5]]])
        A = jnp.asarray(np.einsum("qki,qkj->qij", P, P) / 5.0)
        w, V = eig3.eigh3(A)
        assert np.isfinite(np.asarray(w)).all()
        assert np.isfinite(np.asarray(V)).all()
        # Largest eigenvector still recovers the line direction.
        d = np.asarray(V)[..., -1]
        ref = np.array([1.0, 2.0, -0.5])
        ref = ref / np.linalg.norm(ref)
        assert np.abs(d @ ref).min() > 1 - 1e-5

    def test_isotropic_stays_finite(self):
        A = jnp.broadcast_to(jnp.eye(3) * 2.5, (8, 3, 3))
        w, V = eig3.eigh3(A)
        np.testing.assert_allclose(np.asarray(w), 2.5, atol=1e-7)
        assert np.isfinite(np.asarray(V)).all()


class TestJacobiEigh6:
    def test_matches_lapack(self):
        rng = np.random.default_rng(2)
        B = rng.standard_normal((32, 6, 6))
        A = jnp.asarray(B @ np.swapaxes(B, -1, -2) + 6 * np.eye(6))
        w_ref, V_ref = np.linalg.eigh(np.asarray(A))
        w, V = eig6.jacobi_eigh(A)
        np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-8,
                                   atol=1e-8)
        dots = np.abs(np.einsum("qij,qij->qj", V_ref, np.asarray(V)))
        assert dots.min() > 1 - 1e-7, dots.min()

    def test_eig_solve_matches_damped_projected_solve(self):
        """eig_solve reproduces LOAM's solveDegeneracy: damped solve then
        projection off the weak eigen-directions."""
        rng = np.random.default_rng(3)
        B = rng.standard_normal((6, 6))
        H = B @ B.T + np.diag([50.0, 40.0, 0.1, 30.0, 0.05, 20.0])
        g = rng.standard_normal(6)
        w, V = eig6.jacobi_eigh(jnp.asarray(H))
        keep = (np.asarray(w) > 5.0).astype(float)
        x = eig6.eig_solve(w, V, jnp.asarray(g), damping=1e-6,
                           keep=jnp.asarray(keep))
        w_ref, V_ref = np.linalg.eigh(H)
        x_ref = V_ref @ (keep / (w_ref + 1e-6) * (V_ref.T @ g))
        np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-6,
                                   atol=1e-9)

    def test_inverse_via_eigenbasis(self):
        rng = np.random.default_rng(4)
        B = rng.standard_normal((6, 6))
        H = B @ B.T + 6 * np.eye(6)
        w, V = eig6.jacobi_eigh(jnp.asarray(H))
        H_inv = np.einsum("ij,j,kj->ik", np.asarray(V),
                          1.0 / np.asarray(w), np.asarray(V))
        np.testing.assert_allclose(H_inv, np.linalg.inv(H), rtol=1e-7,
                                   atol=1e-9)
