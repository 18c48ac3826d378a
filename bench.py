"""End-of-round benchmark: FULL VIL pipeline throughput per chip at the
reference rig.

Times the complete system on raw sensor streams — the job of the reference's
live stack (gtsam_fusion/launch/fusion.launch: ROVIO + LOAM +
degenerate_odometry_filter + gtsam_fusion_node) — at the reference's sensor
shapes (carla_tools/config/sensors.json): **800×600 camera @ 20 Hz** and the
full VLP-16 grid (16×1800 @ 10 Hz), over **distinct sequences** (one town
world per seed) batched on the data axis:

  stage "frontend"  — images → pyramids/Shi-Tomasi/LiDAR-depth (batched
                      phase) + KLT/slot scan (the ROVIO-equivalent tracker)
  stage "vio"       — error-state EKF over the frame stream
  stage "lidar"     — undistortion + features + two-stage LOAM registration
                      (scan-to-scan + scan-to-map) + voxel-map update
  stage "gate"      — log-det degeneracy gate on the ICP Hessians
  stage "fusion"    — IMU preintegration + between-factors + fixed-lag GN

Baseline semantics: the reference's fused output is capped at its sensor
rate — 30 odometry events/s (20 Hz ROVIO + 10 Hz LOAM,
gtsam_fusion/config/carla/diagnostics_params.yaml). BASELINE.json's target
is ≥5× real-time per chip = 150 events/s over the FULL pipeline.
``vs_baseline`` = measured events/s ÷ 150.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
The per-stage breakdown + KNN kernel microbench go to stderr.
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
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

_T0 = time.perf_counter()


def _progress(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


REALTIME_EVENTS_PER_S = 30.0
TARGET_MULTIPLIER = 5.0

# The reference rig, full fidelity (sensors.json): 800x600@20Hz camera,
# 16x1800@10Hz sweeps.
CAM_W, CAM_H = 800, 600
DURATION = 4.0
N_SLOTS = 24
BATCH = 8          # distinct sequences (one town world per seed)


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
        impls["approx"] = jax.jit(
            lambda a, b, c: knn_ops.knn_approx(a, b, c, k))
    else:
        impls["topk"] = jax.jit(
            lambda a, b, c: knn_ops.knn_topk(a, b, c, k))

    def chained(fn, reps):
        """One jitted program running ``reps`` data-dependent kernel calls:
        a single dispatch covers all reps, so per-call host→device dispatch
        latency (multi-ms through the axon tunnel on some hosts — 50×+ the
        kernel time) cancels out of the per-rep figure."""
        def body(qc, _):
            idx, _ = fn(qc, t, tm)
            # Data dependence built from the int32 index output: a distance
            # of +inf (possible when valid targets < k) would turn d*0.0
            # into NaN and silently poison every subsequent rep.
            return qc + (idx[0, 0] * 0).astype(qc.dtype), None
        return jax.jit(lambda qc: jax.lax.scan(body, qc, None,
                                               length=reps)[0])

    out = {}
    reps = 20
    for name, fn in impls.items():
        run = chained(fn, reps)
        jax.block_until_ready(run(q))      # compile + warm
        # Best-of-3 trials; the minimum is the honest kernel time.
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(q))
            best = min(best, (time.perf_counter() - t0) / reps)
        # The padded distance matmul: 2 * Q * 8 * M FLOPs.
        flops = 2.0 * Q * 8 * M
        out[name] = {"time_us": best * 1e6,
                     "matmul_gflops": flops / best / 1e9}
    return out


def main():
    from vil_sensor_fusion_tpu import fusion as fu
    from vil_sensor_fusion_tpu import graph as G
    from vil_sensor_fusion_tpu import utils as U
    from vil_sensor_fusion_tpu.core import lie
    from vil_sensor_fusion_tpu.data import scenarios
    from vil_sensor_fusion_tpu.degeneracy import gate as DG
    from vil_sensor_fusion_tpu.frontends import lidar as L
    from vil_sensor_fusion_tpu.frontends import vio as V
    from vil_sensor_fusion_tpu.frontends.vio import frontend as F
    from vil_sensor_fusion_tpu.fusion import engine as E

    dtype = jnp.float32
    dev = jax.devices()[0]

    cam = V.camera.carla_camera(width=CAM_W, height=CAM_H)  # fov 100°
    pose_ic = F.forward_camera_extrinsics(dtype)
    vio_cfg = V.VioConfig(num_landmarks=N_SLOTS, update_iters=2, cam=cam,
                          pose_ic=tuple(np.asarray(pose_ic)))
    fe_cfg = F.FrontendConfig(cam=cam, n_candidates=64, min_dist=24.0,
                              min_score=0.5)
    # Iteration budgets: the r5 operating point from the differential
    # ablation at bench shapes (8 lanes x 40 sweeps, full VLP-16 grid):
    # ONE correspondence round per stage (fit_every=4: KNN + line/plane
    # eigenfits once, then 4/3 GN steps on the frozen geometry — the
    # rounds were the dominant stage cost at ~92 ms each), submap budgets
    # 2048/4096, map capacities 24k/48k (soak residency peaks at
    # 17.5k/37.5k — 30% headroom), eig_sweeps=3, and the per-sweep
    # covariance eig hoisted out of the scan (odometry.run). Together:
    # 806 -> 489 ms per batched pass with registration error mean 0.049 /
    # max 0.15 m vs 0.044/0.12 at the r4 schedule — measured AFTER the
    # first-sweep undistortion fix (odometry.step), which is worth 5x on
    # its own (a distorted seed sweep permanently owns its voxels in the
    # first-observation-wins hashed map). Solution parity for the reuse
    # schedule: test_lidar.py::test_fit_reuse_schedule_matches_full_refresh.
    from vil_sensor_fusion_tpu.frontends.lidar import voxelmap as _vm
    lidar_cfg = L.LidarOdomConfig(
        icp=L.IcpConfig(iters=3, degen_eigval=5.0, fit_every=4,
                        final_refresh=False, eig_sweeps=3),
        odom_icp=L.IcpConfig(iters=4, max_corr_dist=2.0, degen_eigval=5.0,
                             fit_every=4, final_refresh=False,
                             eig_sweeps=3),
        corner_map=_vm.VoxelMapConfig(capacity=24576, leaf=0.2),
        surf_map=_vm.VoxelMapConfig(capacity=49152, leaf=0.4),
        submap_corners=2048, submap_surfs=4096,
        two_stage=True, undistort=True, guess_is_delta=True)
    gate_cfg = DG.GateConfig(rot_threshold=4.0, trans_threshold=-6.0,
                             normalize_per_corr=True)
    from vil_sensor_fusion_tpu.fusion import vil as VIL
    fusion_cfg = fu.FusionConfig(
        smoother=G.SmootherConfig(window=6, between_slots=12, gn_iters=4),
        sensors=VIL.VilConfig().fusion.sensors, max_imu_per_gap=32)

    # --- setup (untimed): B DISTINCT sequences (one world per seed) --------
    # Skeletons (trajectory, sweeps, IMU) on the host CPU backend — small
    # jits, no device round-trips; the heavy 800x600x80-frame camera render
    # runs on the TPU afterwards.
    _progress(f"building {BATCH} distinct scenario skeletons (CPU)")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        scs = [scenarios.build("town", duration=DURATION, vio_cfg=vio_cfg,
                               dtype=dtype, seed=b) for b in range(BATCH)]
    _progress("rendering camera streams on device")
    lanes = []
    for sc in scs:
        lanes.append(_lane_arrays(sc, cam, pose_ic, dtype, dev))
    stack = lambda xs: jnp.stack(xs, axis=0)
    images_b = stack([ln[0] for ln in lanes])
    pts_cam_b = stack([ln[1] for ln in lanes])
    ptv_b = stack([ln[2] for ln in lanes])
    sweeps_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, 0), *[sc.sweeps for sc in scs])
    sweeps_b = jax.device_put(sweeps_b, dev)

    sc0 = scs[0]
    imu_t = jax.device_put(jnp.asarray(sc0.imu_times, dtype), dev)
    imu_a_b = stack([jnp.asarray(sc.imu_accel, dtype) for sc in scs])
    imu_g_b = stack([jnp.asarray(sc.imu_gyro, dtype) for sc in scs])
    imu_w_b = (
        stack([jnp.asarray(sc.vio_frames.accel, dtype) for sc in scs]),
        stack([jnp.asarray(sc.vio_frames.gyro, dtype) for sc in scs]),
        stack([jnp.asarray(sc.vio_frames.dts, dtype) for sc in scs]),
    )
    T_v, T_l = len(sc0.vio_times), len(sc0.lidar_times)
    n_events = T_v + T_l
    guess_idx = jnp.asarray(sc0.lidar_guess_idx)

    @jax.jit
    def delta_guesses(vio_poses_b):
        """(B, Tv, 7) VIO poses -> (B, Tl, 7) RELATIVE priors (VIO motion
        between consecutive sweep frames; sweep 0 vs the initial pose).
        Jitted: executed eagerly this double-vmap dispatches every lie
        primitive as its own device call (~3 ms tunnel latency each) and
        the ~55 ms total lands inside the next stage's timer."""
        sel = vio_poses_b[:, guess_idx]
        prev = jnp.concatenate([pose0s[:sel.shape[0], None], sel[:, :-1]],
                               axis=1)
        return jax.vmap(jax.vmap(lie.pose_between))(prev, sel)

    # Shared static timeline merge (identical stamps per lane).
    all_t = np.concatenate([np.asarray(sc0.vio_times),
                            np.asarray(sc0.lidar_times)])
    order = jnp.asarray(np.argsort(all_t, kind="stable"))
    src = jnp.asarray(np.concatenate(
        [np.zeros(T_v, np.int32), np.ones(T_l, np.int32)])[np.asarray(order)])
    times_sorted = jnp.asarray(all_t[np.asarray(order)], dtype)

    # Initial states per lane.
    t0j = jnp.zeros((), dtype)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        pose0s = stack([sc.traj.pose_fn(t0j).astype(dtype) for sc in scs])
        vel0s = stack([sc.traj.vel_fn(t0j).astype(dtype) for sc in scs])
    pose0s = jax.device_put(pose0s, dev)
    vel0s = jax.device_put(vel0s, dev)
    zeros6 = jnp.zeros((BATCH, 6), dtype)
    vio_state0 = jax.vmap(lambda p, v, b: V.init(vio_cfg, p, v, b))(
        pose0s, vel0s, zeros6)
    lidar_state0 = jax.vmap(
        lambda p: L.odometry.init(lidar_cfg, dtype, pose0=p))(pose0s)
    es0 = jax.vmap(lambda p, v, b: fu.init(fusion_cfg, p, v, b,
                                           t0j - 1e-3))(pose0s, vel0s,
                                                        zeros6)

    # --- the pipeline: one jitted program PER STAGE, vmapped over lanes ----
    # (separate programs per stage: XLA faults when the batched frontend
    # phase fuses into the tracking scan — frontend.build_frames docstring —
    # and per-stage timing is what the reference's node graph exposes too.)
    fe1p = jax.jit(jax.vmap(lambda im: F.pyramids_batch(fe_cfg, im)))
    fe1c = jax.jit(jax.vmap(
        lambda im, p, v: F.candidates_batch(fe_cfg, im, p, v)))
    fe2 = jax.jit(jax.vmap(
        lambda py, cu, cs, cd, dm, iw: F.track_frames(
            fe_cfg, py, cu, cs, cd, dm, iw, N_SLOTS)[0]))
    vio_run = jax.jit(jax.vmap(lambda s, f: V.run(vio_cfg, s, f)))
    lidar_run = jax.jit(jax.vmap(
        lambda st, sw, g: L.odometry.run(lidar_cfg, st, sw, g)))
    gate_fn = jax.jit(jax.vmap(
        lambda h, n: DG.logdet_gate(h, gate_cfg, n_corr=n)))

    def mk_tl(vp, vc, lp, lc, keep_l):
        cov = jnp.concatenate([vc, lc], axis=0)[order]
        return E.Timeline(
            times=times_sorted, source=src,
            odo_pose=jnp.concatenate([vp, lp], axis=0)[order],
            odo_cov=cov,
            keep=jnp.concatenate([jnp.ones((T_v,), dtype), keep_l],
                                 axis=0)[order],
            valid=jnp.ones((T_v + T_l,), dtype),
            # Constant-diag noise specs here; the twist channel is unused.
            odo_twist_cov=cov,
        )

    fusion_run = jax.jit(jax.vmap(
        lambda es, vp, vc, lp, lc, kp, ia, ig: E.run(
            fusion_cfg, es, mk_tl(vp, vc, lp, lc, kp), imu_t, ia, ig)))

    def one_pass(timer: U.StageTimer):
        py = timer.time("frontend_pyr", fe1p, images_b)
        cu, cs, cd, dm = timer.time("frontend_detect", fe1c, images_b,
                                    pts_cam_b, ptv_b)
        frames = timer.time("frontend_track", fe2, py, cu, cs, cd, dm,
                            imu_w_b)
        _, vio_out = timer.time("vio", vio_run, vio_state0, frames)
        guesses = delta_guesses(vio_out.pose)
        _, lidar_out = timer.time("lidar", lidar_run, lidar_state0,
                                  sweeps_b, guesses)
        gate_res = timer.time("gate", gate_fn, lidar_out.hessian,
                              lidar_out.n_corr)
        _, fused = timer.time("fusion", fusion_run, es0, vio_out.pose,
                              vio_out.cov, lidar_out.pose, lidar_out.cov,
                              gate_res.keep, imu_a_b, imu_g_b)
        return fused

    _progress("compiling + warming the batched pipeline "
              f"({BATCH} lanes @ {CAM_W}x{CAM_H})")
    warm = U.StageTimer()
    fused = one_pass(warm)
    jax.block_until_ready(fused)
    assert np.isfinite(np.asarray(fused.poses)).all()
    _progress("warm; timing reps")

    timer = U.StageTimer()
    reps = 3
    t_start = time.perf_counter()
    for _ in range(reps):
        fused = one_pass(timer)
    jax.block_until_ready(fused)
    wall_b = (time.perf_counter() - t_start) / reps
    events_per_s_b = BATCH * n_events / wall_b
    target = REALTIME_EVENTS_PER_S * TARGET_MULTIPLIER
    summary = timer.summary()

    # --- single-stream latency at the same full-res rig --------------------
    # Same program structure the soak's streaming path uses (scripts/soak.py
    # estimator_chunk): batched pyramids + batched detection/depth as two
    # programs, then ONE fused estimator program covering
    # track→VIO→priors→two-stage LiDAR→gate→timeline→fixed-lag fusion.
    # The previous 7-program split paid a host round-trip between every
    # stage and measured ~2× slower than the soak on identical hardware
    # (BENCH_r04 3.71× vs SOAK_345 7.36× — VERDICT r4 weak #3).
    _progress("compiling single-stream (latency) pipeline")
    one = lambda tree: jax.tree_util.tree_map(lambda x: x[0], tree)
    fe1p_1 = jax.jit(lambda im: F.pyramids_batch(fe_cfg, im))
    fe1c_1 = jax.jit(lambda im, p, v: F.candidates_batch(fe_cfg, im, p, v))

    def estimator_single(py, cu, cs, cd, dm, iw, vs0, ls0, es_0,
                         pose0, sweeps, ia, ig):
        frames, _ = F.track_frames(fe_cfg, py, cu, cs, cd, dm, iw, N_SLOTS)
        _, vio_out = V.run(vio_cfg, vs0, frames)
        sel = vio_out.pose[guess_idx]
        prev = jnp.concatenate([pose0[None], sel[:-1]], axis=0)
        guesses = jax.vmap(lie.pose_between)(prev, sel)
        _, lidar_out = L.odometry.run(lidar_cfg, ls0, sweeps, guesses)
        gate_res = DG.logdet_gate(lidar_out.hessian, gate_cfg,
                                  n_corr=lidar_out.n_corr)
        _, fused = E.run(
            fusion_cfg, es_0,
            mk_tl(vio_out.pose, vio_out.cov, lidar_out.pose, lidar_out.cov,
                  gate_res.keep),
            imu_t, ia, ig)
        return fused

    est_1 = jax.jit(estimator_single)

    def one_pass_single():
        py = fe1p_1(images_b[0])
        cu, cs, cd, dm = fe1c_1(images_b[0], pts_cam_b[0], ptv_b[0])
        return est_1(py, cu, cs, cd, dm, one(imu_w_b), one(vio_state0),
                     one(lidar_state0), one(es0), pose0s[0], one(sweeps_b),
                     imu_a_b[0], imu_g_b[0])

    f1 = one_pass_single()
    jax.block_until_ready(f1)
    t0s = time.perf_counter()
    for _ in range(3):
        f1 = one_pass_single()
    jax.block_until_ready(f1)
    wall_1 = (time.perf_counter() - t0s) / 3

    _progress("KNN kernel microbench")
    diag = {
        "platform": jax.devices()[0].platform,
        "rig": f"{CAM_W}x{CAM_H}@20Hz camera, 16x1800@10Hz lidar "
               "(reference sensors.json shapes)",
        "duration_s": DURATION,
        "events_per_lane": n_events,
        "batch_distinct_sequences": BATCH,
        "wall_s_per_batched_pass": round(wall_b, 4),
        "events_per_s": round(events_per_s_b, 1),
        "realtime_factor_aggregate": round(BATCH * DURATION / wall_b, 2),
        "single_stream_wall_s": round(wall_1, 4),
        "realtime_factor_single_stream": round(DURATION / wall_1, 2),
        "stages_ms_batched": {k: round(v["mean_s"] * 1e3, 2)
                              for k, v in summary.items()},
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


def _lane_arrays(sc, cam, pose_ic, dtype, dev):
    """Render one lane's camera stream + camera-frame sweep points on the
    device (the heavy part of scenario construction at 800x600)."""
    from vil_sensor_fusion_tpu.data import scenarios

    sc_dev = sc._replace(
        sweeps=jax.device_put(sc.sweeps, dev),
        gt_vio_poses=np.asarray(sc.gt_vio_poses),
        gt_lidar_poses=np.asarray(sc.gt_lidar_poses),
        world=jax.device_put(sc.world, dev))
    imgs, pts, ptv = scenarios.render_frontend_inputs(
        sc_dev, cam, pose_ic, sweep_stride=4, dtype=dtype)
    return (jax.device_put(imgs, dev), jax.device_put(pts, dev),
            jax.device_put(ptv, dev))


if __name__ == "__main__":
    main()
