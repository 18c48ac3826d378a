"""Aux subsystems: checkpoint/resume round-trip, failure detection,
stage timing (SURVEY.md §5 — all absent in the reference)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vil_sensor_fusion_tpu import utils as U
from vil_sensor_fusion_tpu import fusion as fu
from vil_sensor_fusion_tpu import graph as G


def _engine_state():
    cfg = fu.FusionConfig(
        smoother=G.SmootherConfig(window=4, between_slots=8, gn_iters=2),
        sensors=(fu.SensorSpec(name="vio", optimize_after_odom=True),),
        max_imu_per_gap=8,
    )
    pose = jnp.array([1.0, 0, 0, 0, 0, 0, 0])
    return cfg, fu.init(cfg, pose, jnp.zeros(3), jnp.zeros(6),
                        jnp.zeros(()))


def test_checkpoint_roundtrip(tmp_path):
    _, es = _engine_state()
    path = os.path.join(tmp_path, "state.npz")
    U.save(path, es)
    _, template = _engine_state()
    # perturb the template so restore provably overwrites it
    template = jax.tree_util.tree_map(lambda x: x * 0 - 1.0 if
                                      jnp.issubdtype(x.dtype, jnp.floating)
                                      else x, template)
    back = U.restore(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(es),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_raises(tmp_path):
    path = os.path.join(tmp_path, "s.npz")
    U.save(path, {"a": jnp.zeros((3,))})
    with pytest.raises(ValueError):
        U.restore(path, {"a": jnp.zeros((4,))})
    with pytest.raises(KeyError):
        U.restore(path, {"b": jnp.zeros((3,))})


def test_checkpoint_manager_retention_and_resume(tmp_path):
    mgr = U.CheckpointManager(str(tmp_path), keep=2)
    _, es = _engine_state()
    for step in (1, 5, 9):
        mgr.save(step, es)
    assert mgr.steps() == [5, 9]
    assert mgr.latest_step() == 9
    step, state = mgr.restore_latest(es)
    assert step == 9
    for a, b in zip(jax.tree_util.tree_leaves(es),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    empty = U.CheckpointManager(str(tmp_path / "none"))
    assert empty.restore_latest(es)[0] is None


def test_finite_probes():
    good = {"x": jnp.ones((4, 4)), "i": jnp.arange(3)}
    bad = {"x": jnp.ones((4, 4)).at[0, 0].set(jnp.nan), "i": jnp.arange(3)}
    assert bool(U.all_finite(good))
    assert not bool(U.all_finite(bad))
    assert float(U.finite_fraction(bad)) == pytest.approx(15.0 / 16.0)


def test_check_state_bounds():
    lim = U.HealthLimits(max_speed=10.0, max_bias_acc=1.0,
                         max_bias_gyro=0.5)
    ok = U.check_state(jnp.array([1.0, 0, 0]), jnp.zeros(6), lim)
    assert bool(ok)
    assert not bool(U.check_state(jnp.array([20.0, 0, 0]), jnp.zeros(6), lim))
    bad_bias = jnp.zeros(6).at[4].set(2.0)
    assert not bool(U.check_state(jnp.zeros(3), bad_bias, lim))
    nan_cov = jnp.full((6, 6), jnp.nan)
    assert not bool(U.check_state(jnp.zeros(3), jnp.zeros(6), lim,
                                  extra_tree=nan_cov))


def test_guarded_update_is_jittable():
    def step(state, inc):
        return state + inc, inc * 2

    def health(s):
        return jnp.all(jnp.isfinite(s)) & jnp.all(jnp.abs(s) < 100.0)

    wrapped = jax.jit(U.wrap_step(step, health))
    s = jnp.zeros(3)
    s, healthy, aux = wrapped(s, jnp.ones(3))
    assert bool(healthy)
    np.testing.assert_allclose(np.asarray(s), 1.0)
    # a NaN update is rejected, state survives
    s2, healthy2, _ = wrapped(s, jnp.full(3, jnp.nan))
    assert not bool(healthy2)
    np.testing.assert_allclose(np.asarray(s2), 1.0)


def test_stage_timer():
    t = U.StageTimer()
    x = jnp.ones((64, 64))
    y = t.time("matmul", lambda: x @ x)
    with t.stage("add", block_on=y):
        y = y + 1
    s = t.summary()
    assert s["matmul"]["calls"] == 1
    assert s["add"]["total_s"] >= 0
    assert "matmul" in t.json()


def test_stage_timer_blocks_on_work_launched_inside():
    """Work dispatched *inside* a stage block is attributed to that stage:
    the body registers its output on the yielded holder and the timer blocks
    on it at exit (not only on pre-existing block_on values)."""
    t = U.StageTimer()

    @jax.jit
    def heavy(x):
        for _ in range(20):
            x = jnp.tanh(x @ x)
        return x

    x = jnp.ones((512, 512))
    heavy(x).block_until_ready()          # warm the cache
    with t.stage("heavy") as out:
        out.value = heavy(x)              # async dispatch inside the stage
    # At stage exit the value must already be concrete (blocked on), and the
    # stage recorded.
    assert jnp.isfinite(out.value).all()
    rec = t.summary()["heavy"]
    assert rec["calls"] == 1 and rec["total_s"] > 0
