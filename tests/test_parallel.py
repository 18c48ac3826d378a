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
