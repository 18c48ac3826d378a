"""vil_sensor_fusion_tpu — a TPU-native visual-inertial-LiDAR odometry engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
AmeliaEScott/vil_sensor_fusion thesis stack (ROS + GTSAM + LOAM + ROVIO):

- ``core``       : SO(3)/SE(3) Lie algebra and IMU preintegration (lax.scan).
- ``graph``      : fixed-lag factor-graph smoother (on-manifold GN/LM with
                   dense-per-window normal equations; replaces GTSAM/iSAM2).
- ``ops``        : Pallas TPU kernels for the hot paths (KNN correspondence,
                   point-to-plane reductions, patch ops).
- ``frontends``  : LiDAR odometry (LOAM-equivalent feature extraction +
                   scan-to-map ICP with explicit 6x6 Hessian) and VIO.
- ``degeneracy`` : the thesis's degeneracy metric library + gating
                   (log-det Hessian thresholds), fully vectorized.
- ``fusion``     : the orchestration engine replicating gtsam_fusion_node
                   semantics (sensor registry, measurement timeline,
                   reserve/match/gap handling, solve cadence).
- ``parallel``   : device-mesh sharding (dp over sequences, window/voxel
                   sharding, psum-reduced normal equations).
- ``data``       : synthetic Carla-like dataset generation + conventions.
- ``eval``       : diagnostics (ATE/RPE/velocity errors), ROC/AUC.

Unlike the reference's asynchronous ROS callback graph, everything here runs
over a synchronous, replayable measurement timeline with static shapes, so
the whole estimator jit-compiles and is deterministic.
"""

__version__ = "0.1.0"

# Matmul precision policy. The estimator's linear algebra (normal-equation
# assembly, EKF covariance updates, preintegration Jacobians) REQUIRES
# full-f32 matmuls — under JAX's default single-bf16-pass TPU matmuls the
# estimator diverges within 20 s of drive, and even 3-pass "high" stalls the
# smoother mid-way through a 345 s drive (see SCALING.md "Multi-minute
# soak"). That precision is pinned PER-FUNCTION via
# ``_precision.estimation_precision`` on exactly the numerically-critical
# entry points (smoother solve/marginalization, EKF propagate/update,
# preintegration, ICP normal equations, eig solves), so the rest of the
# pipeline — rendering, pyramids/KLT, KNN distance rows, point transforms —
# keeps the hardware's fast default (a global "highest" costs ~35% of
# end-to-end throughput). VIL_MATMUL_PRECISION overrides the GLOBAL
# default; VIL_ESTIMATION_PRECISION overrides the estimator scope.
# (Pallas kernels pin their own dot precision — Mosaic has no 3-pass mode.)
import os as _os

import jax as _jax

_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("VIL_MATMUL_PRECISION", "default"))
