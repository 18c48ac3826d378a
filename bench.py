"""End-of-round benchmark: fused odometry throughput per chip.

Runs the full VIL fusion engine (IMU preintegration + between-factors +
degeneracy gating + fixed-lag GN solves) over batched synthetic sequences on
the available accelerator and reports events/s per chip.

Baseline semantics: the reference is a live ROS system whose fused output is
capped at its sensor rate — 30 odometry events/s (20 Hz ROVIO + 10 Hz LOAM,
gtsam_fusion/config/carla/diagnostics_params.yaml). BASELINE.json's target is
≥5× real-time per chip, i.e. 150 events/s. ``vs_baseline`` is measured
events/s divided by that 150 ev/s target (1.0 = target met).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


REALTIME_EVENTS_PER_S = 30.0
TARGET_MULTIPLIER = 5.0


def main():
    from vil_sensor_fusion_tpu import fusion as fu
    from vil_sensor_fusion_tpu import graph as G
    from vil_sensor_fusion_tpu.data import synthetic as syn

    dtype = jnp.float32
    BATCH = 16          # parallel sequences (vmap — one chip)
    DUR = 8.0           # seconds of drive per sequence
    IMU_HZ = 200.0

    traj = syn.circle(radius=15.0, period=12.0)
    imu_t = jnp.arange(int(DUR * IMU_HZ) + 20, dtype=dtype) / IMU_HZ
    imu = syn.sample_imu(traj, imu_t)
    t_vio = (jnp.arange(int(DUR * 20), dtype=dtype) + 1.0) / 20.0
    t_lid = (jnp.arange(int(DUR * 10), dtype=dtype) + 1.0) / 10.0
    vio = syn.sample_odometry(traj, t_vio)
    lid = syn.sample_odometry(traj, t_lid)
    tl = fu.merge_timeline([
        (np.asarray(t_vio), np.asarray(vio.poses), np.asarray(vio.cov),
         np.ones(len(t_vio))),
        (np.asarray(t_lid), np.asarray(lid.poses), np.asarray(lid.cov),
         np.ones(len(t_lid))),
    ])
    tl = jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tl)

    cfg = fu.FusionConfig(
        smoother=G.SmootherConfig(window=8, between_slots=16, gn_iters=4),
        sensors=(
            fu.SensorSpec(name="vio", optimize_after_odom=True),
            fu.SensorSpec(name="lidar", optimize_after_odom=False),
        ),
        max_imu_per_gap=32,
    )
    t0 = jnp.zeros((), dtype)
    es = fu.init(cfg, traj.pose_fn(t0).astype(dtype),
                 traj.vel_fn(t0).astype(dtype), jnp.zeros(6, dtype), t0)

    def stack(x):
        return jnp.broadcast_to(x[None], (BATCH,) + x.shape)

    es_b = jax.tree_util.tree_map(stack, es)
    tl_b = jax.tree_util.tree_map(stack, tl)
    it_b = stack(imu.times.astype(dtype))
    ia_b = stack(imu.accel.astype(dtype))
    ig_b = stack(imu.gyro.astype(dtype))

    run = jax.jit(jax.vmap(
        lambda s, t, i1, i2, i3: fu.run(cfg, s, t, i1, i2, i3)))

    # Compile + warm up.
    out = run(es_b, tl_b, it_b, ia_b, ig_b)
    jax.block_until_ready(out)

    n_events = BATCH * int(tl.times.shape[0])
    reps = 3
    t_start = time.perf_counter()
    for _ in range(reps):
        out = run(es_b, tl_b, it_b, ia_b, ig_b)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t_start) / reps

    events_per_s = n_events / dt
    target = REALTIME_EVENTS_PER_S * TARGET_MULTIPLIER
    print(json.dumps({
        "metric": "fused_odometry_events_per_s_per_chip",
        "value": round(events_per_s, 1),
        "unit": "events/s",
        "vs_baseline": round(events_per_s / target, 3),
    }))


if __name__ == "__main__":
    main()
