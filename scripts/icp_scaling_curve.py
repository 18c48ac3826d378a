"""Virtual-mesh scaling curve for the model-parallel ICP registration
(parallel.make_sharded_lidar_step): the REAL odometry step sharded over
1/2/4/8 devices of the virtual CPU mesh.

On one physical machine the devices share cores, so this curve validates
the sharding/collective structure and measures its overhead — it is NOT a
wall-clock speedup claim (that needs real chips with their own silicon).
Prints one JSON object.
"""

import json
import sys
import time
from pathlib import Path

import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def main():
    from vil_sensor_fusion_tpu import parallel as par
    from vil_sensor_fusion_tpu.data import raycast as rc
    from vil_sensor_fusion_tpu.frontends import lidar as L

    dtype = jnp.float32
    w = rc.town_world(n_boxes=24, seed=7)
    p0 = jnp.array([1.0, 0, 0, 0, 0, 0, 1.5], dtype)
    p1 = jnp.array([1.0, 0, 0, 0, 0.4, 0, 1.5], dtype)
    sweep0 = rc.raycast(w, p0)
    sweep1 = rc.raycast(w, p1)
    cfg = L.LidarOdomConfig(icp=L.IcpConfig(iters=6, degen_eigval=5.0))

    out = {}
    for n in (1, 2, 4, 8):
        mesh = par.make_mesh(n_data=1, n_model=n,
                             devices=jax.devices()[:n])
        step = par.make_sharded_lidar_step(mesh, cfg)
        st = L.odometry.init(cfg, dtype)
        st, _ = step(st, sweep0, p0)
        st1, res = step(st, sweep1, p1)
        jax.block_until_ready(res)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            _, res = step(st, sweep1, p1)
        jax.block_until_ready(res)
        dt = (time.perf_counter() - t0) / reps
        out[str(n)] = {"step_ms": round(dt * 1e3, 2),
                       "n_corr": float(res.n_corr)}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
