"""Scoped matmul precision for the estimation algebra.

JAX's DEFAULT TPU matmul precision is a single bf16 pass (~8 mantissa
bits) — fine for rendering, image pyramids, and KNN distance rows, but
catastrophic for the estimator's linear algebra: normal-equation assembly
(AᵀΛA with Λ spanning ~8 orders of magnitude), EKF covariance updates, and
preintegration Jacobians diverge over multi-minute horizons (measured: a
345 s TPU drive stalls the smoother under anything below full-f32
precision — see SCALING.md "Multi-minute soak").

Rather than paying full-f32 for EVERY matmul in the package (the
round-3 global `jax_default_matmul_precision=highest` cost ~35% of
end-to-end throughput on matmuls that never feed the estimator), the
:func:`estimation_precision` decorator pins HIGHEST precision around
exactly the functions whose numerics demand it — smoother solves/
marginalization, EKF propagate/update, IMU preintegration, ICP normal
equations, and the degeneracy metrics' covariance algebra. Everything
else (raycast rendering, pyramids/KLT, KNN distance matmuls, point
transforms) runs at the hardware's fast default.

`jax.default_matmul_precision` is a trace-time setting, so the decorator
is effective inside jit: ops traced within the wrapped call (including
nested helpers and lax.scan bodies) inherit the precision.

Override for experiments with VIL_ESTIMATION_PRECISION=default|high|highest.
"""

from __future__ import annotations

import functools
import os

import jax

ESTIMATION_PRECISION = os.environ.get("VIL_ESTIMATION_PRECISION", "highest")


def estimation_precision(fn):
    """Decorator: run (trace) ``fn`` under full-precision matmuls."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision(ESTIMATION_PRECISION):
            return fn(*args, **kwargs)

    return wrapped
