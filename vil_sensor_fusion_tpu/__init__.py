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

# Estimation-grade matmul precision. JAX's DEFAULT TPU matmul precision is
# a single bf16 pass (~8 mantissa bits) — fine for neural nets, catastrophic
# for this library's products: normal-equation assembly (AᵀΛA with Λ spanning
# ~8 orders of magnitude), EKF covariance algebra, and preintegration
# Jacobians. Measured end-to-end on a TPU drive: under default precision the
# estimator diverges within 20 s (fused error 560 m, half the events
# rejected by the health guard); "high" (3-pass bf16) matches "highest" on
# 30 s drives but STALLS the smoother mid-way through a 345 s drive (health
# acceptance collapses once accumulated covariance error trips the guard);
# only "highest" (native f32) survives the full 5:45-bag horizon. Override
# with VIL_MATMUL_PRECISION for experiments.
# (Pallas kernels pin their own dot precision — Mosaic has no 3-pass mode.)
import os as _os

import jax as _jax

_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("VIL_MATMUL_PRECISION", "highest"))
