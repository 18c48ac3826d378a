"""Multi-device tests on the virtual 8-device CPU mesh (conftest forces
``--xla_force_host_platform_device_count=8``) — the continuous multi-chip
validation the reference never had (SURVEY.md §4: it has no multi-node
testing at all).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vil_sensor_fusion_tpu import parallel as par

# Long-running e2e coverage: excluded from the fast default loop
# (pytest -m 'not slow').
pytestmark = pytest.mark.slow


def test_mesh_shapes():
    mesh = par.make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_sharded_normal_eqs_matches_dense():
    mesh = par.make_mesh(n_data=1, n_model=8)
    fn = par.sharded_normal_eqs(mesh)
    rng = np.random.default_rng(0)
    N = 1024
    res = jnp.asarray(rng.standard_normal((N, 1)), jnp.float32)
    J = jnp.asarray(rng.standard_normal((N, 1, 6)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, N), jnp.float32)
    H, g = fn(res, J, w)
    H_want = np.einsum("qri,q,qrj->ij", np.asarray(J), np.asarray(w),
                       np.asarray(J))
    g_want = np.einsum("qri,q,qr->i", np.asarray(J), np.asarray(w),
                       np.asarray(res))
    np.testing.assert_allclose(np.asarray(H), H_want, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g), g_want, rtol=1e-4)


def test_sharded_lidar_step_matches_unsharded():
    """The REAL registration path, model-parallel: odometry.step with the
    ICP normal equations sharded over points on an 8-device model mesh must
    reproduce the single-device step (same pose, Hessian, correspondence
    count) — the psum reduction is exact, not approximate."""
    from vil_sensor_fusion_tpu.core import lie
    from vil_sensor_fusion_tpu.data import raycast as rc
    from vil_sensor_fusion_tpu.frontends import lidar as L

    dtype = jnp.float32
    w = rc.town_world(n_boxes=24, seed=7)
    p0 = jnp.array([1.0, 0, 0, 0, 0, 0, 1.5], dtype)
    p1 = jnp.array([1.0, 0, 0, 0, 0.4, 0, 1.5], dtype)
    sweep0 = rc.raycast(w, p0)
    sweep1 = rc.raycast(w, p1)

    # Single-stage, no undistortion: this test pins the EQUALITY of the
    # sharded normal-equation reduction against the local sum; the extra
    # two-stage iterations only amplify f32 reduction-order noise.
    cfg = L.LidarOdomConfig(icp=L.IcpConfig(iters=4, degen_eigval=5.0),
                            two_stage=False, undistort=False)
    mesh = par.make_mesh(n_data=1, n_model=8)
    sharded_step = par.make_sharded_lidar_step(mesh, cfg)

    st_a = L.odometry.init(cfg, dtype)
    st_b = L.odometry.init(cfg, dtype)
    # Seed the map with sweep 0, then register sweep 1 against it.
    st_a, _ = L.odometry.step(cfg, st_a, sweep0, p0)
    st_b, _ = sharded_step(st_b, sweep0, p0)
    st_a, res_a = L.odometry.step(cfg, st_a, sweep1, p1)
    st_b, res_b = sharded_step(st_b, sweep1, p1)

    np.testing.assert_allclose(np.asarray(res_b.pose),
                               np.asarray(res_a.pose), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_b.hessian),
                               np.asarray(res_a.hessian),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(float(res_b.n_corr), float(res_a.n_corr),
                               atol=0.5)
    # And it genuinely registered (a real correspondence count).
    assert float(res_b.n_corr) > 100


def test_batched_fusion_run_dp():
    """8 identical sequences sharded over 8 devices must all match the
    single-device run."""
    from vil_sensor_fusion_tpu import fusion as fu
    import __graft_entry__ as ge

    dtype = jnp.float64
    cfg, args = ge._tiny_problem(dtype)
    es, tl, it, ia, ig = args
    es1, out1 = jax.jit(
        lambda *a: fu.run(cfg, *a))(es, tl, it, ia, ig)

    mesh = par.make_mesh(n_data=8, n_model=1)
    fn = par.batched_fusion_run(mesh, cfg)
    B = 8

    def stack(x):
        return jnp.broadcast_to(x[None], (B,) + x.shape)

    esb, tlb, itb, iab, igb = jax.tree_util.tree_map(
        stack, (es, tl, it, ia, ig))
    es8, out8 = fn(esb, tlb, itb, iab, igb)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(out8.poses[b]), np.asarray(out1.poses), atol=1e-9)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    es, out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out.poses)))
