"""Sharded execution of the estimator over a device mesh.

Two parallel axes (SURVEY.md §2c / BASELINE.json north star):

- **data**: independent sequences (bags) — each device runs the full fusion
  engine on its own shard of the batch. This is the throughput axis for
  batched evaluation/replay.
- **model**: the registration point sets — point-to-line/plane residual
  blocks are sharded over points and their 6×6 Gauss-Newton normal equations
  are reduced with ``psum`` over ICI (the distributed reduced-camera-system
  pattern: each device contributes Σ wᵢ JᵢᵀJᵢ, Σ wᵢ Jᵢᵀrᵢ for its points).

Everything uses ``shard_map`` over one global :class:`jax.sharding.Mesh`, so
the same code runs on 1 chip, a virtual 8-device CPU mesh (tests), or a pod
slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..fusion import engine as E
from .mesh import DATA_AXIS, MODEL_AXIS


def batched_fusion_run(mesh, cfg: E.FusionConfig):
    """Returns a jitted function running the fusion engine on a batch of
    sequences, batch axis sharded over the mesh's data axis.

    fn(states, timelines, imu_times, imu_accel, imu_gyro) →
      (final states, stacked FusedOutput); every input's leading axis is the
      batch.
    """

    def per_shard(states, timelines, it, ia, ig):
        return jax.vmap(
            lambda s, tl, t, a, g: E.run(cfg, s, tl, t, a, g)
        )(states, timelines, it, ia, ig)

    spec = P(DATA_AXIS)
    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_normal_eqs(mesh):
    """Returns a jitted function reducing ICP normal equations over
    point shards: inputs (res (N,r), J (N,r,6), w (N,)) with N sharded over
    the model axis; output the global (H (6,6), g (6,)) via psum."""

    def per_shard(res, J, w):
        H = jnp.einsum("qri,q,qrj->ij", J, w, J)
        g = jnp.einsum("qri,q,qr->i", J, w, res)
        H = jax.lax.psum(H, MODEL_AXIS)
        g = jax.lax.psum(g, MODEL_AXIS)
        return H, g

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_register(mesh, icp_cfg):
    """``icp.register`` with the query point sets sharded over the model
    axis and the map replicated: every GN iteration each device finds
    correspondences and accumulates normal equations for its point shard,
    then psums (H, g) over ICI so all devices apply the same global update
    (icp.register's ``axis_name`` path). Returns a function with register's
    positional signature (sans cfg) — directly usable as
    ``odometry.step(register_fn=...)``."""
    from ..frontends.lidar import icp as I

    n = mesh.shape[MODEL_AXIS]

    def per_shard(pose0, qc, mc, qs, ms, map_c, map_cm, map_s, map_sm):
        return I.register(pose0, qc, mc, qs, ms, map_c, map_cm, map_s,
                          map_sm, icp_cfg, axis_name=MODEL_AXIS)

    m = P(MODEL_AXIS)
    r = P()
    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(r, m, m, m, m, r, r, r, r),
        out_specs=r,
        check_vma=False,
    )

    def register_fn(pose0, qc, mc, qs, ms, map_c, map_cm, map_s, map_sm):
        # Pad the query axes to a multiple of the model-axis size; padded
        # rows carry mask 0 and contribute nothing.
        def pad2(x):
            return jnp.pad(x, ((0, (-x.shape[0]) % n), (0, 0)))

        def pad1(x):
            return jnp.pad(x, (0, (-x.shape[0]) % n))

        return sharded(pose0, pad2(qc), pad1(mc), pad2(qs), pad1(ms),
                       map_c, map_cm, map_s, map_sm)

    return register_fn


def make_sharded_lidar_step(mesh, cfg):
    """The REAL LiDAR odometry step (feature extraction → submap → sharded
    scan-to-map registration → map update) with the ICP normal equations
    model-parallel over the mesh. Feature extraction and map bookkeeping are
    replicated (cheap); the registration loop — the hot path — shards its
    points and reduces over ICI.

    fn(state, sweep, pose_guess) → (state, LidarOdomResult), jitted.
    """
    from ..frontends.lidar import odometry as O

    reg = make_sharded_register(mesh, cfg.icp)

    def stepfn(state, sweep, guess):
        return O.step(cfg, state, sweep, guess, register_fn=reg)

    return jax.jit(stepfn)


def sharded_metric_series(mesh, names):
    """Degeneracy metric evaluation over a (B, T, 6, 6) Hessian batch,
    B sharded over data — the whole-fleet version of score_series."""
    from ..degeneracy import gate

    def per_shard(mats):
        return jax.vmap(lambda m: gate.score_series(names, m))(mats)

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(DATA_AXIS),),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)
