"""Multi-host execution (SURVEY.md §2c / BASELINE.json: ≥80 % frames/s
scaling at 2 hosts).

The reference never crosses a machine boundary — its "distribution" is ROS
processes on localhost (SURVEY.md §2c). The TPU-native story is
single-program multi-host JAX: every host runs this same program,
``jax.distributed.initialize`` wires the cluster, one global
:class:`jax.sharding.Mesh` spans (hosts × local devices), and arrays are
assembled from per-host shards with
``jax.make_array_from_process_local_data``. Collectives ride ICI within a
host/pod and DCN across hosts — exactly the layering the scaling-book
recipe prescribes; no NCCL/MPI analog exists in the reference to port.

On real pods each process sees its local TPU chips; in tests/benchmarks we
simulate hosts with CPU processes × virtual devices
(``--xla_force_host_platform_device_count``), which exercises the identical
code path (global mesh, cross-process collectives over distributed XLA).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join the cluster (idempotent per-process). Every host calls this
    before first backend use; afterwards ``jax.devices()`` is the GLOBAL
    device list and ``jax.local_devices()`` this host's slice."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_data_mesh() -> Mesh:
    """One data-parallel mesh over every device of every host."""
    return Mesh(np.array(jax.devices()), (DATA_AXIS,))


def host_sharded(mesh: Mesh, tree):
    """Assemble global arrays from per-host local batches: each host passes
    its OWN shard (leading axis = local batch); the result is one global
    array whose leading axis is the concatenation over hosts, sharded over
    the data axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))

    def mk(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(mk, tree)


def fusion_scaling_workload(batch_per_device: int = 1, n_events: int = 48,
                            n_imu: int = 512, reps: int = 5):
    """The scaling benchmark: the fusion engine data-parallel over the
    GLOBAL mesh with a psum'd global ATE (a genuine cross-host collective
    each pass). Returns (events_per_s, global_events) on every host;
    throughput is measured after a warm-up pass, synchronized via the
    collective itself.

    Weak scaling: each host contributes batch_per_device × local_devices
    sequences, so 2 hosts process twice the work — ≥80 % scaling means
    ≥1.6× the single-host events/s.
    """
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    import __graft_entry__ as ge

    from ..core import lie
    from ..fusion import engine as E
    from jax import shard_map

    mesh = global_data_mesh()
    n_local = len(jax.local_devices())
    local_batch = batch_per_device * n_local
    dtype = jnp.float32

    cfg, (es, tl, it, ia, ig) = ge._tiny_problem(
        dtype, n_events=n_events, n_imu=n_imu, batch=local_batch)
    gt = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype),
                          (local_batch, tl.times.shape[1], 7))
    args = host_sharded(mesh, (es, tl, it, ia, ig, gt))

    def shard_fn(es, tl, it, ia, ig, gt):
        es2, out = jax.vmap(
            lambda s, t, a, b, c: E.run(cfg, s, t, a, b, c)
        )(es, tl, it, ia, ig)
        err = lie.pose_trans(out.poses) - lie.pose_trans(gt)
        sq = jax.lax.psum(jnp.sum(err * err), DATA_AXIS)
        n = jax.lax.psum(
            jnp.asarray(err.shape[0] * err.shape[1], dtype), DATA_AXIS)
        return es2, out, jnp.sqrt(sq / n)

    d = P(DATA_AXIS)
    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh, in_specs=(d, d, d, d, d, d),
        out_specs=(d, d, P()), check_vma=False))

    es2, out, ate = fn(*args)
    jax.block_until_ready(ate)            # warm-up + cluster barrier
    assert np.isfinite(float(ate))

    t0 = time.perf_counter()
    for _ in range(reps):
        es2, out, ate = fn(*args)
    jax.block_until_ready(ate)
    dt = (time.perf_counter() - t0) / reps

    global_batch = local_batch * jax.process_count()
    global_events = global_batch * int(tl.times.shape[1])
    return global_events / dt, global_events
