"""Failure detection and elastic recovery (SURVEY.md §5).

The reference's only fault handling is ``max_time_skip`` gap resets
(SensorManagerRos.cpp:47) and the degeneracy gate itself; there is no
estimator-divergence detection or recovery. Here:

- :func:`finite_fraction` / :func:`all_finite` — pytree NaN/Inf probes
  (jit-safe, return scalars).
- :func:`check_state` — estimator health verdict: finiteness plus
  bound checks on velocity and IMU-bias magnitude (the standard divergence
  signatures of a VIO/fusion stack).
- :func:`guarded_update` — the elastic-recovery combinator: run an update,
  and if the new state fails :func:`check_state`, keep the previous state
  instead (``lax.cond``-style select, fully jittable). This generalizes the
  reference's gap-reset semantics to arbitrary numerical faults.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


def finite_fraction(tree: Any) -> jnp.ndarray:
    """Fraction of finite scalars across all leaves (1.0 = healthy)."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
    if not leaves:
        return jnp.float32(1.0)
    tot = sum(jnp.size(l) for l in leaves)
    fin = sum(jnp.sum(jnp.isfinite(l)) for l in leaves)
    return fin / jnp.float32(tot)


def all_finite(tree: Any) -> jnp.ndarray:
    """Scalar bool: every floating leaf entry is finite."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
    ok = jnp.bool_(True)
    for l in leaves:
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(l)))
    return ok


class HealthLimits(NamedTuple):
    """Divergence bounds. Defaults generous for ground vehicles."""
    max_speed: float = 100.0      # m/s
    max_bias_acc: float = 5.0     # m/s^2
    max_bias_gyro: float = 1.0    # rad/s


def check_state(vel: jnp.ndarray, bias: jnp.ndarray,
                limits: HealthLimits = HealthLimits(),
                extra_tree: Any = None) -> jnp.ndarray:
    """Scalar bool health verdict for an estimator state.

    ``vel``: (..., 3) velocity; ``bias``: (..., 6) [acc, gyro] bias;
    ``extra_tree``: any further pytree that must be finite (e.g. covariance).
    """
    ok = jnp.all(jnp.isfinite(vel)) & jnp.all(jnp.isfinite(bias))
    speed2 = jnp.sum(vel * vel, axis=-1)
    ok &= jnp.all(speed2 <= limits.max_speed ** 2)
    ba2 = jnp.sum(bias[..., :3] ** 2, axis=-1)
    bg2 = jnp.sum(bias[..., 3:] ** 2, axis=-1)
    ok &= jnp.all(ba2 <= limits.max_bias_acc ** 2)
    ok &= jnp.all(bg2 <= limits.max_bias_gyro ** 2)
    if extra_tree is not None:
        ok &= all_finite(extra_tree)
    return ok


def guarded_update(prev_state: Any, new_state: Any,
                   healthy: jnp.ndarray) -> Any:
    """Select ``new_state`` where healthy, else keep ``prev_state``.

    Jittable elastic recovery: a diverged/NaN update never contaminates the
    running state; the caller can also count rejections from ``healthy``.
    """
    return jax.tree_util.tree_map(
        lambda new, old: jnp.where(healthy, new, old), new_state, prev_state)


def wrap_step(step_fn: Callable, health_fn: Callable[[Any], jnp.ndarray]):
    """Return a step function that applies :func:`guarded_update`.

    ``health_fn(new_state) -> bool scalar``. The wrapped function returns
    ``(state, healthy, *rest)`` where ``rest`` is whatever ``step_fn``
    returned beyond the state.
    """
    def wrapped(state, *args, **kwargs):
        out = step_fn(state, *args, **kwargs)
        new_state, rest = (out[0], out[1:]) if isinstance(out, tuple) else (
            out, ())
        healthy = health_fn(new_state)
        safe = guarded_update(state, new_state, healthy)
        return (safe, healthy) + tuple(rest)
    return wrapped
