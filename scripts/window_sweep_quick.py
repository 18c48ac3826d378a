"""Quick window sweep (no batch oracle): ATE-vs-GT of the streaming
fixed-lag engine across window sizes. Used to iterate on the
marginalization scheme (VERDICT r4 weak #1) without paying the f64
batch-MAP wall time — the full oracle is scripts/oracle_report.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def run_case(duration, noise, window, seed=0, gn_iters=5):
    from vil_sensor_fusion_tpu import fusion as fu
    from vil_sensor_fusion_tpu import graph as G
    from vil_sensor_fusion_tpu.data import synthetic as syn

    DTYPE = jnp.float64
    IMU_HZ = 200.0
    rng = np.random.default_rng(seed)
    traj = syn.circle(radius=10.0, period=20.0)
    t_imu = jnp.arange(int(duration * IMU_HZ) + 20, dtype=DTYPE) / IMU_HZ
    imu = syn.sample_imu(traj, t_imu)
    t_vio = (jnp.arange(int(duration * 20.0), dtype=DTYPE) + 1.0) / 20.0
    t_lid = (jnp.arange(int(duration * 10.0), dtype=DTYPE) + 1.0) / 10.0
    vio = syn.sample_odometry(traj, t_vio)
    lid = syn.sample_odometry(traj, t_lid)
    vp = np.asarray(vio.poses).copy()
    lp = np.asarray(lid.poses).copy()
    vp[:, 4:7] += rng.normal(0, noise, vp[:, 4:7].shape)
    lp[:, 4:7] += rng.normal(0, noise, lp[:, 4:7].shape)
    tl = fu.merge_timeline([
        (np.asarray(t_vio), vp, np.asarray(vio.cov), np.ones(len(t_vio))),
        (np.asarray(t_lid), lp, np.asarray(lid.cov), np.ones(len(t_lid))),
    ])
    cfg = fu.FusionConfig(
        smoother=G.SmootherConfig(window=window, between_slots=2 * window,
                                  gn_iters=gn_iters),
        sensors=(
            fu.SensorSpec(name="vio", optimize_after_odom=True,
                          covariance_linear=0.02, covariance_angular=0.02,
                          max_time_skip=0.2),
            fu.SensorSpec(name="lidar", optimize_after_odom=False,
                          covariance_linear=0.02, covariance_angular=0.02,
                          max_time_skip=0.3),
        ),
        max_imu_per_gap=32,
    )
    t0 = jnp.zeros((), DTYPE)
    pose0, vel0 = traj.pose_fn(t0).astype(DTYPE), traj.vel_fn(t0).astype(DTYPE)
    bias0 = jnp.zeros(6, DTYPE)
    es = fu.init(cfg, pose0, vel0, bias0, t0)
    _, out = jax.jit(lambda e, t: fu.run(cfg, e, t, imu.times, imu.accel,
                                         imu.gyro))(es, tl)
    gt = syn.sample_ground_truth(traj, tl.times)
    ate = float(np.sqrt(np.mean(np.sum(
        (np.asarray(out.poses)[:, 4:7]
         - np.asarray(gt.poses)[:, 4:7]) ** 2, axis=-1))))
    return ate


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=15.0)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--windows", default="4,6,10,16")
    ap.add_argument("--gn-iters", type=int, default=5)
    args = ap.parse_args()
    for w in map(int, args.windows.split(",")):
        ate = run_case(args.duration, args.noise, w, gn_iters=args.gn_iters)
        print(f"W={w:3d}  ate_stream={ate:.5f} m", flush=True)
