"""Per-stage TPU profiler at bench shapes, on synthetic inputs.

Times every sub-kernel of the VIL pipeline separately (random inputs at the
real shapes — control flow is static, so timings match the bench) to find
where each bench stage's milliseconds actually go (r4 batched pass:
lidar 1060 ms, fusion 353 ms, frontend_track 174 ms, frontend_detect
163 ms of a 2.05 s 8-lane pass).

Usage: python scripts/profile_stages.py [--res 400x300] [--frames 80]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vil_sensor_fusion_tpu.frontends.vio import frontend as F
from vil_sensor_fusion_tpu.frontends.vio import tracker as T
from vil_sensor_fusion_tpu.frontends.vio import camera as C
from vil_sensor_fusion_tpu.frontends import lidar as L
from vil_sensor_fusion_tpu.frontends.lidar import features as feat
from vil_sensor_fusion_tpu.frontends.lidar import icp as I
from vil_sensor_fusion_tpu.frontends.lidar import voxelmap as vm
from vil_sensor_fusion_tpu.frontends.lidar import rangeimage as RI
from vil_sensor_fusion_tpu.core import lie


def bench(name, fn, *args, reps=10):
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {dt*1e3:9.3f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="400x300")
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--sweeps", type=int, default=40)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    W, H = map(int, args.res.split("x"))
    Tn = args.frames
    Tl = args.sweeps
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform} res={W}x{H} "
          f"frames={Tn} sweeps={Tl}", flush=True)

    do = lambda sec: (not args.only) or (sec in args.only.split(","))

    # ---------------- frontend shapes ----------------
    images = jnp.asarray(rng.random((Tn, H, W)), dtype)
    P = (RI.RINGS * RI.AZIMUTH) // 4
    pts_cam = jnp.asarray(rng.uniform(-30, 30, (Tn, P, 3)), dtype)
    pts_cam = pts_cam.at[..., 2].set(jnp.abs(pts_cam[..., 2]) + 1.0)
    pv = jnp.ones((Tn, P), dtype)
    cam = C.Camera(fx=214.0 * W / 400, fy=214.0 * W / 400,
                   cx=W / 2.0, cy=H / 2.0, width=W, height=H)
    fe_cfg = F.FrontendConfig(cam=cam, n_candidates=64, min_dist=16.0,
                              min_score=0.5)
    M = 24
    imu_w = (jnp.zeros((Tn, 16, 3), dtype), jnp.zeros((Tn, 16, 3), dtype),
             jnp.full((Tn, 16), 0.003, dtype))

    if do("frontend"):
        print("--- frontend ---", flush=True)
        bench("pyramid (vmap T)",
              jax.jit(lambda im: jax.vmap(
                  lambda x: tuple(T.pyramid(x, 3)))(im)), images)
        bench("shi_tomasi score (vmap T)",
              jax.jit(lambda im: jax.vmap(T.shi_tomasi)(im)), images)
        bench("detect full (vmap T)",
              jax.jit(lambda im: jax.vmap(
                  lambda x: T.detect(x, 64, nms_radius=8, border=12))(im)),
              images)
        bench("project_sweep+depth_at 64q (vmap T)",
              jax.jit(lambda p, v: jax.vmap(
                  lambda a, b: F.depth_at(
                      fe_cfg, F.project_sweep(fe_cfg, a, b),
                      jnp.full((64, 2), 50.0, a.dtype)))(p, v)),
              pts_cam, pv)
        uv = jnp.asarray(rng.uniform(20, min(W, H) - 20, (M, 2)), dtype)
        valid = jnp.ones((M,), dtype)
        pyr_a = [jnp.asarray(rng.random((H // (2**l), W // (2**l))), dtype)
                 for l in range(3)]
        pyr_b = [jnp.asarray(rng.random((H // (2**l), W // (2**l))), dtype)
                 for l in range(3)]
        bench("klt_track 1 frame (24 slots)",
              jax.jit(lambda a0, a1, a2, b0, b1, b2, u, v: T.klt_track(
                  [a0, a1, a2], [b0, b1, b2], u, v, radius=4, iters=8)),
              *pyr_a, *pyr_b, uv, valid)
        bench("build_frames FULL (two-program)",
              lambda im, p, v: F.build_frames(
                  fe_cfg, im, p, v, imu_w, M), images, pts_cam, pv)

    # ---------------- lidar shapes ----------------
    sw_xyz = rng.uniform(-40, 40, (RI.RINGS, RI.AZIMUTH, 3))
    sweep = RI.Sweep(
        xyz=jnp.asarray(sw_xyz, dtype),
        rng=jnp.asarray(np.linalg.norm(sw_xyz, axis=-1), dtype),
        mask=jnp.ones((RI.RINGS, RI.AZIMUTH), dtype))
    cfg = L.LidarOdomConfig(icp=I.IcpConfig(iters=6, degen_eigval=5.0),
                            two_stage=True)
    state = L.odometry.init(cfg, dtype)
    # Populate maps.
    mc = vm.VoxelMap(
        points=jnp.asarray(rng.uniform(-60, 60, (32768, 3)), dtype),
        mask=jnp.ones((32768,), dtype))
    ms = vm.VoxelMap(
        points=jnp.asarray(rng.uniform(-60, 60, (65536, 3)), dtype),
        mask=jnp.ones((65536,), dtype))
    state = state._replace(corner_map=mc, surf_map=ms,
                           initialized=jnp.ones((), dtype))
    center = jnp.zeros((3,), dtype)
    pose = lie.pose_identity(dtype)

    nc, ns = feat.pool_sizes(RI.RINGS, RI.AZIMUTH)
    q_c = jnp.asarray(rng.uniform(-40, 40, (nc, 3)), dtype)
    q_s = jnp.asarray(rng.uniform(-40, 40, (ns, 3)), dtype)
    m_c = jnp.ones((nc,), dtype)
    m_s = jnp.ones((ns,), dtype)
    sub_c = vm.VoxelMap(points=jnp.asarray(
        rng.uniform(-40, 40, (4096, 3)), dtype), mask=jnp.ones((4096,), dtype))
    sub_s = vm.VoxelMap(points=jnp.asarray(
        rng.uniform(-40, 40, (8192, 3)), dtype), mask=jnp.ones((8192,), dtype))

    if do("lidar"):
        print("--- lidar ---", flush=True)
        bench("feat.extract", jax.jit(feat.extract), sweep)
        bench("undistort", jax.jit(
            lambda s: RI.undistort(s, jnp.full((6,), 0.01, dtype))), sweep)
        bench("submap corner 32k->4096",
              jax.jit(lambda m: vm.submap(m, center, 4096, 100.0)), mc)
        bench("submap surf 64k->8192",
              jax.jit(lambda m: vm.submap(m, center, 8192, 100.0)), ms)
        bench("insert corner (+1920)",
              jax.jit(lambda m: vm.insert(m, q_c[:1920], m_c[:1920], center,
                                          cfg.corner_map)), mc)
        bench("insert surf (+3984)",
              jax.jit(lambda m: vm.insert(m, q_s, m_s, center,
                                          cfg.surf_map)), ms)
        from vil_sensor_fusion_tpu.ops import knn as knn_ops
        bench("knn corner 1920x4096",
              jax.jit(lambda q, t, tm: knn_ops.knn(q, t, tm, 5)),
              q_c, sub_c.points, sub_c.mask)
        bench("knn surf 3984x8192",
              jax.jit(lambda q, t, tm: knn_ops.knn(q, t, tm, 5)),
              q_s, sub_s.points, sub_s.mask)
        from vil_sensor_fusion_tpu.ops import eig3 as E3
        covs = jnp.asarray(rng.random((ns, 3, 3)), dtype)
        covs = covs + jnp.swapaxes(covs, -1, -2)
        bench("eig3 batch (3984)", jax.jit(E3.eigh3), covs)
        bench("register 6 iters (map stage)",
              jax.jit(lambda p: I.register(
                  p, q_c, m_c, q_s, m_s, sub_c.points, sub_c.mask,
                  sub_s.points, sub_s.mask, cfg.icp)), pose)
        bench("register 8 iters (odom stage)",
              jax.jit(lambda p: I.register(
                  p, q_c[:1920], m_c[:1920], q_s[:3984], m_s[:3984],
                  q_c[:1920], m_c[:1920], q_s[:3984], m_s[:3984],
                  cfg.odom_icp)), pose)
        bench("odometry.step FULL (two_stage)",
              jax.jit(lambda st, sw, g: L.odometry.step(cfg, st, sw, g)),
              state, sweep, pose)
        cfg1 = cfg._replace(two_stage=False)
        bench("odometry.step FULL (single)",
              jax.jit(lambda st, sw, g: L.odometry.step(cfg1, st, sw, g)),
              state, sweep, pose)

    if do("fusion"):
        print("--- fusion+vio ---", flush=True)
        from vil_sensor_fusion_tpu import fusion as fu
        from vil_sensor_fusion_tpu import graph as G
        from vil_sensor_fusion_tpu.fusion import engine as E
        from vil_sensor_fusion_tpu.fusion import vil
        from vil_sensor_fusion_tpu.frontends import vio as V

        fcfg = fu.FusionConfig(
            smoother=G.SmootherConfig(window=6, between_slots=12, gn_iters=4),
            sensors=vil.VilConfig().fusion.sensors, max_imu_per_gap=32)
        Ev = Tn + Tl
        t_all = jnp.sort(jnp.asarray(rng.uniform(0, 4.0, (Ev,)), dtype))
        tl = E.Timeline(
            times=t_all,
            source=jnp.asarray(rng.integers(0, 2, (Ev,)), jnp.int32),
            odo_pose=jnp.broadcast_to(lie.pose_identity(dtype), (Ev, 7)),
            odo_cov=jnp.broadcast_to(jnp.eye(6, dtype=dtype) * 0.1,
                                     (Ev, 6, 6)),
            keep=jnp.ones((Ev,), dtype), valid=jnp.ones((Ev,), dtype),
            odo_twist_cov=jnp.broadcast_to(jnp.eye(6, dtype=dtype) * 0.1,
                                           (Ev, 6, 6)))
        es0 = fu.init(fcfg, lie.pose_identity(dtype), jnp.zeros(3, dtype),
                      jnp.zeros(6, dtype), jnp.asarray(-1e-3, dtype))
        n_imu = 800
        imu_t = jnp.linspace(0, 4.0, n_imu).astype(dtype)
        imu_a = jnp.zeros((n_imu, 3), dtype).at[:, 2].set(9.81)
        imu_g = jnp.zeros((n_imu, 3), dtype)
        bench(f"engine.run ({Ev} events)",
              jax.jit(lambda e, t: E.run(fcfg, e, t, imu_t, imu_a, imu_g)),
              es0, tl)

        vio_cfg = V.VioConfig(num_landmarks=M, update_iters=2, cam=cam,
                              pose_ic=tuple(np.asarray(
                                  F.forward_camera_extrinsics(dtype))))
        vs0 = V.init(vio_cfg, lie.pose_identity(dtype), jnp.zeros(3, dtype),
                     jnp.zeros(6, dtype))
        frames = V.pipeline.VioFrameInput(
            accel=imu_w[0], gyro=imu_w[1], dts=imu_w[2],
            obs_uv=jnp.asarray(rng.uniform(20, 200, (Tn, M, 2)), dtype),
            obs_valid=jnp.ones((Tn, M), dtype),
            obs_depth=jnp.zeros((Tn, M), dtype),
            new_uv=jnp.zeros((Tn, M, 2), dtype),
            new_depth=jnp.ones((Tn, M), dtype),
            new_enable=jnp.zeros((Tn, M), dtype))
        bench(f"vio.run ({Tn} frames)",
              jax.jit(lambda s, f: V.run(vio_cfg, s, f)), vs0, frames)

    print("done", flush=True)


if __name__ == "__main__":
    main()
