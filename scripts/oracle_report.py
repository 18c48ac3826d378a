"""Fixed-lag vs full-MAP oracle report (VERDICT r3 next #4, r4 next #1).

Runs the streaming fixed-lag engine and the offline f64 full-batch MAP
(graph/batch.py) over the same event timeline(s) and reports the
trajectory delta — the strongest reference-free substitute for GTSAM/iSAM2
parity available in this environment (iSAM2 keeps full history,
GraphManager.cpp:101-141; the fixed-lag smoother summarizes it with a
Schur marginal prior).

The sweep covers ≥2 durations × windows {4,6,10,16}; the batch MAP is
solved ONCE per duration (it is window-independent) and reused. The
acceptance property (pinned in tests/test_batch_oracle.py) is that the
delta-vs-batch must NOT grow with the window: under the first-estimates
marginal-prior policy (graph/smoother.py add_keyframe) a larger lag
re-optimizes more history and converges toward the batch answer.

Usage:  python scripts/oracle_report.py [--durations 15,30] [--noise 0.02]
Writes ORACLE.json at the repo root.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")     # the oracle is f64/CPU
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def _fusion_cfg(window):
    from vil_sensor_fusion_tpu import fusion as fu
    from vil_sensor_fusion_tpu import graph as G

    return fu.FusionConfig(
        smoother=G.SmootherConfig(window=window, between_slots=2 * window,
                                  gn_iters=5),
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


def build_problem(duration, noise, seed=0):
    """Timeline + IMU + ground truth + the (window-independent) batch MAP."""
    from vil_sensor_fusion_tpu import fusion as fu
    from vil_sensor_fusion_tpu.data import synthetic as syn
    from vil_sensor_fusion_tpu.graph import batch as B

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
    t0 = jnp.zeros((), DTYPE)
    pose0 = traj.pose_fn(t0).astype(DTYPE)
    vel0 = traj.vel_fn(t0).astype(DTYPE)
    bias0 = jnp.zeros(6, DTYPE)

    cfg_any = _fusion_cfg(4)          # batch ignores the window size
    t_b = time.perf_counter()
    sol = B.solve_batch(cfg_any, tl, imu.times, imu.accel, imu.gyro,
                        pose0, vel0, bias0, 0.0)
    t_batch = time.perf_counter() - t_b

    gt = syn.sample_ground_truth(traj, tl.times)
    gt_tr = np.asarray(gt.poses)[:, 4:7]
    batch_tr = np.asarray(sol.poses)[1:, 4:7]
    ate_batch = float(np.sqrt(np.mean(np.sum((batch_tr - gt_tr) ** 2,
                                             axis=-1))))
    return dict(tl=tl, imu=imu, pose0=pose0, vel0=vel0, bias0=bias0,
                batch_tr=batch_tr, gt_tr=gt_tr, ate_batch=ate_batch,
                n_between=sol.n_between, wall_batch=t_batch)


def run_window(prob, duration, noise, window):
    from vil_sensor_fusion_tpu import fusion as fu

    cfg = _fusion_cfg(window)
    es = fu.init(cfg, prob["pose0"], prob["vel0"], prob["bias0"],
                 jnp.zeros((), jnp.float64))
    t_s = time.perf_counter()
    imu = prob["imu"]
    _, out = jax.jit(lambda e, t: fu.run(cfg, e, t, imu.times, imu.accel,
                                         imu.gyro))(es, prob["tl"])
    jax.block_until_ready(out)
    t_stream = time.perf_counter() - t_s
    stream_tr = np.asarray(out.poses)[:, 4:7]
    d_tr = np.linalg.norm(stream_tr - prob["batch_tr"], axis=-1)
    ate_stream = float(np.sqrt(np.mean(np.sum(
        (stream_tr - prob["gt_tr"]) ** 2, axis=-1))))
    return {
        "duration_s": duration, "noise_m": noise, "window": window,
        "events": int(len(np.asarray(prob["tl"].times))),
        "n_between": prob["n_between"],
        "delta_mean_m": float(d_tr.mean()),
        "delta_max_m": float(d_tr.max()),
        "delta_last_m": float(d_tr[-1]),
        "ate_stream_m": ate_stream,
        "ate_batch_m": prob["ate_batch"],
        "wall_stream_s": round(t_stream, 2),
        "wall_batch_s": round(prob["wall_batch"], 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--durations", default="15,30")
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--windows", default="4,6,10,16")
    args = ap.parse_args()
    cases = []
    for dur in map(float, args.durations.split(",")):
        prob = build_problem(dur, args.noise)
        for w in map(int, args.windows.split(",")):
            c = run_window(prob, dur, args.noise, w)
            print(json.dumps(c), flush=True)
            cases.append(c)
    out = {
        "what": "streaming fixed-lag vs full-history f64 batch MAP, "
                "identical factor graphs (graph/batch.py); batch solved "
                "once per duration, windows swept with the FEJ "
                "marginal-prior policy (graph/smoother.py)",
        "cases": cases,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ORACLE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
