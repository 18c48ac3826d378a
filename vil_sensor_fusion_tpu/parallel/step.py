"""The full multi-chip VIL step: everything the estimator does per round of
measurements, expressed once over the global mesh —

- data-parallel fusion: each data-shard runs the smoother engine over its
  own sequences (vmap inside shard_map),
- model-parallel registration: ICP residual blocks sharded over points,
  normal equations psum-reduced over ICI,
- a global ATE reduction (psum over data) as the 'loss' of the step.

This is what ``__graft_entry__.dryrun_multichip`` compiles and runs on an
N-device mesh, and what scaling benchmarks time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..core import lie
from ..fusion import engine as E
from .mesh import DATA_AXIS, MODEL_AXIS


def make_vil_step(mesh, cfg: E.FusionConfig):
    """Build the jitted multi-chip step.

    fn(states, timelines, imu_t, imu_a, imu_g, gt_poses,
       icp_res, icp_J, icp_w) →
      (final states, fused outputs, global ATE, (H, g))

    Leading batch axes shard over ``data``; the ICP point axis shards over
    ``model``.
    """

    def fusion_shard(states, timelines, it, ia, ig, gt_poses):
        es, out = jax.vmap(
            lambda s, tl, t, a, g: E.run(cfg, s, tl, t, a, g)
        )(states, timelines, it, ia, ig)
        err = lie.pose_trans(out.poses) - lie.pose_trans(gt_poses)
        sq = jnp.sum(err * err)
        n = jnp.asarray(err.shape[0] * err.shape[1], err.dtype)
        sq = jax.lax.psum(sq, DATA_AXIS)
        n = jax.lax.psum(n, DATA_AXIS)
        return es, out, jnp.sqrt(sq / n)

    def icp_shard(res, J, w):
        H = jnp.einsum("qri,q,qrj->ij", J, w, J)
        g = jnp.einsum("qri,q,qr->i", J, w, res)
        return (jax.lax.psum(H, MODEL_AXIS), jax.lax.psum(g, MODEL_AXIS))

    d = P(DATA_AXIS)
    m = P(MODEL_AXIS)
    fusion_sharded = shard_map(
        fusion_shard, mesh=mesh,
        in_specs=(d, d, d, d, d, d),
        out_specs=(d, d, P()),
        check_vma=False,
    )
    icp_sharded = shard_map(
        icp_shard, mesh=mesh,
        in_specs=(m, m, m), out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(states, timelines, imu_t, imu_a, imu_g, gt_poses,
             icp_res, icp_J, icp_w):
        es, out, ate = fusion_sharded(
            states, timelines, imu_t, imu_a, imu_g, gt_poses)
        H, g = icp_sharded(icp_res, icp_J, icp_w)
        return es, out, ate, (H, g)

    return step
