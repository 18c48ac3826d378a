"""LiDAR-stage operating-point ablation (VERDICT r4 next #6): time the
bench's batched lidar stage (8 lanes x 40 sweeps, full VLP-16 grid) under
candidate iteration/refresh schedules and report per-config registration
accuracy vs ground truth — picking the fastest schedule that holds the
error floor. Writes the table to stderr; meant for the real TPU.

Usage: python scripts/lidar_ablation.py [--duration 4] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=4.0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from vil_sensor_fusion_tpu.core import lie
    from vil_sensor_fusion_tpu.data import scenarios
    from vil_sensor_fusion_tpu.frontends import lidar as L

    dtype = jnp.float32
    dev = jax.devices()[0]
    print(f"platform={dev.platform}", file=sys.stderr, flush=True)

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        scs = [scenarios.build("town", duration=args.duration, dtype=dtype,
                               seed=b, distort_sweeps=True)
               for b in range(args.batch)]
    sweeps_b = jax.device_put(jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, 0), *[sc.sweeps for sc in scs]), dev)
    gt_b = np.stack([np.asarray(sc.gt_lidar_poses) for sc in scs])
    # Registration priors: GT relative motion + realistic VIO-grade noise.
    rng = np.random.default_rng(0)
    prev = np.concatenate([gt_b[:, :1], gt_b[:, :-1]], axis=1)
    guesses = jax.vmap(jax.vmap(lie.pose_between))(
        jnp.asarray(prev, dtype), jnp.asarray(gt_b, dtype))
    g = np.array(guesses)           # writable copy
    g[..., 4:7] += rng.normal(0, 0.01, g[..., 4:7].shape)
    guesses = jax.device_put(jnp.asarray(g, dtype), dev)
    pose0_b = jnp.asarray(gt_b[:, 0], dtype)

    def cfg_of(map_iters, odom_iters, fit_every, eig_sweeps,
               final_refresh=False):
        return L.LidarOdomConfig(
            icp=L.IcpConfig(iters=map_iters, degen_eigval=5.0,
                            fit_every=fit_every,
                            final_refresh=final_refresh,
                            eig_sweeps=eig_sweeps),
            odom_icp=L.IcpConfig(iters=odom_iters, max_corr_dist=2.0,
                                 degen_eigval=5.0, fit_every=fit_every,
                                 final_refresh=final_refresh,
                                 eig_sweeps=eig_sweeps),
            two_stage=True, undistort=True, guess_is_delta=True)

    CANDIDATES = {
        "r4_default (m4 o6 f2 e4)": cfg_of(4, 6, 2, 4),
        "m3 o4 f2 e4": cfg_of(3, 4, 2, 4),
        "m4 o6 f3 e4": cfg_of(4, 6, 3, 4),
        "m3 o4 f3 e3": cfg_of(3, 4, 3, 3),
        "m2 o4 f2 e3": cfg_of(2, 4, 2, 3),
        "m3 o3 f3 e3": cfg_of(3, 3, 3, 3),
    }

    results = {}
    for name, cfg in CANDIDATES.items():
        st0 = jax.vmap(lambda p: L.odometry.init(cfg, dtype, pose0=p))(
            pose0_b)
        run = jax.jit(jax.vmap(
            lambda st, sw, gu: L.odometry.run(cfg, st, sw, gu)))
        t0 = time.perf_counter()
        _, out = run(st0, sweeps_b, guesses)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            _, out = run(st0, sweeps_b, guesses)
        jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / args.reps
        err = np.linalg.norm(np.asarray(out.pose)[..., 4:7]
                             - gt_b[..., 4:7], axis=-1)
        results[name] = {
            "lidar_stage_ms": round(wall * 1e3, 1),
            "err_mean_m": round(float(err.mean()), 4),
            "err_max_m": round(float(err.max()), 4),
            "compile_s": round(compile_s, 1),
        }
        print(f"{name:28s} {wall*1e3:7.1f} ms  err mean "
              f"{err.mean():.4f} max {err.max():.4f}  "
              f"(compile {compile_s:.0f}s)", file=sys.stderr, flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
