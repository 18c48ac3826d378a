"""Keyframe-window sharding of the trajectory smoother (SURVEY.md §2c/§5):
a long pose chain optimized across the 8-device CPU mesh with boundary-state
halo exchange (ppermute) + separator Schur solve must match the sequential
dense Gauss-Newton to float round-off."""

import numpy as np
import jax
import jax.numpy as jnp

from vil_sensor_fusion_tpu.core import lie
from vil_sensor_fusion_tpu.parallel import mesh as PM
from vil_sensor_fusion_tpu.parallel import windows as WIN

DTYPE = jnp.float32


def _chain_problem(N=32, seed=0):
    """Ground-truth smooth trajectory + noisy odometry measurements +
    noisy initial estimates."""
    rng = np.random.default_rng(seed)
    ts = np.arange(N) * 0.1
    gt = []
    for t in ts:
        q = np.asarray(lie.so3_exp_quat(
            jnp.asarray([0.02 * t, 0.01 * np.sin(t), 0.3 * t], DTYPE)))
        p = np.array([2.0 * t, np.sin(0.5 * t), 0.1 * t])
        gt.append(np.concatenate([q, p]))
    gt = jnp.asarray(np.stack(gt), DTYPE)

    meas = jax.vmap(lie.pose_between)(gt[:-1], gt[1:])
    # Perturb measurements (odometry noise).
    xi_n = jnp.asarray(rng.normal(0, 0.01, (N - 1, 6)), DTYPE)
    meas = jax.vmap(lie.pose_retract)(meas, xi_n)
    infos = jnp.broadcast_to(jnp.eye(6, dtype=DTYPE) * 100.0,
                             (N - 1, 6, 6))

    # Initial estimates: GT poses perturbed.
    xi0 = jnp.asarray(rng.normal(0, 0.05, (N, 6)), DTYPE)
    x0 = jax.vmap(lie.pose_retract)(gt, xi0)
    prior_info = jnp.eye(6, dtype=DTYPE) * 1e4
    return gt, x0, meas, infos, gt[0], prior_info


class TestWindowSharding:
    def test_sharded_matches_sequential(self):
        gt, x0, meas, infos, pp, pi = _chain_problem(N=32)
        seq = WIN.solve_sequential(x0, meas, infos, pp, pi, iters=5)

        mesh = PM.make_mesh(n_data=8, n_model=1)
        shd = WIN.solve_sharded(mesh, PM.DATA_AXIS, x0, meas, infos,
                                pp, pi, iters=5)
        # Same GN iterates up to float assoc: positions to sub-mm,
        # quaternions elementwise.
        np.testing.assert_allclose(np.asarray(shd[:, 4:7]),
                                   np.asarray(seq[:, 4:7]), atol=2e-3)
        q_seq, q_shd = np.asarray(seq[:, :4]), np.asarray(shd[:, :4])
        dots = np.abs(np.sum(q_seq * q_shd, axis=-1))
        assert dots.min() > 1.0 - 1e-5, dots.min()

    def test_converges_toward_ground_truth(self):
        gt, x0, meas, infos, pp, pi = _chain_problem(N=32)
        # Blow up the initial estimates well beyond the odometry noise
        # floor: the MAP solution (≈ integrated odometry) must pull the
        # chain far back in.
        rng = np.random.default_rng(7)
        x0 = jax.vmap(lie.pose_retract)(
            x0, jnp.asarray(rng.normal(0, 0.3, (x0.shape[0], 6)), DTYPE))
        mesh = PM.make_mesh(n_data=8, n_model=1)
        shd = WIN.solve_sharded(mesh, PM.DATA_AXIS, x0, meas, infos,
                                pp, pi, iters=5)
        err0 = np.linalg.norm(np.asarray(x0[:, 4:7] - gt[:, 4:7]), axis=-1)
        err1 = np.linalg.norm(np.asarray(shd[:, 4:7] - gt[:, 4:7]), axis=-1)
        # The smoother pulls the chain well inside the init noise.
        assert err1.mean() < 0.5 * err0.mean(), (err0.mean(), err1.mean())

    def test_window_count_independence(self):
        """Same answer with 2, 4, and 8 windows (the sharding is an exact
        reformulation, not an approximation)."""
        gt, x0, meas, infos, pp, pi = _chain_problem(N=32, seed=3)
        outs = []
        for S in (2, 4, 8):
            mesh = PM.make_mesh(n_data=S, n_model=1)
            outs.append(np.asarray(WIN.solve_sharded(
                mesh, PM.DATA_AXIS, x0, meas, infos, pp, pi, iters=4)))
        np.testing.assert_allclose(outs[0][:, 4:7], outs[2][:, 4:7],
                                   atol=2e-3)
        np.testing.assert_allclose(outs[1][:, 4:7], outs[2][:, 4:7],
                                   atol=2e-3)
