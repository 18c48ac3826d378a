"""Multi-host scaling measurement (BASELINE target: ≥80 % frames/s scaling
at 2 hosts).

Two modes:

- worker: ``python scripts/multihost_bench.py worker <proc_id> <n_procs>
  <port> <local_devices> [batch_per_device]`` — joins the cluster via
  jax.distributed and runs the data-parallel fusion workload over the
  GLOBAL mesh. Process 0 prints one JSON line with global events/s.
- launch: ``python scripts/multihost_bench.py launch [--hosts 2]
  [--devices 4]`` — simulates N hosts as N CPU processes × virtual devices
  on this machine, measures 1-host and N-host throughput, prints the
  scaling table. On a real pod, run the worker mode once per host (or rely
  on the TPU runtime's automatic initialization) instead.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def worker(argv):
    proc_id, n_procs, port, local_devices = map(int, argv[:4])
    batch_per_device = int(argv[4]) if len(argv) > 4 else 1

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}").strip()
    sys.path.insert(0, str(REPO))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vil_sensor_fusion_tpu.parallel import multihost as MH

    MH.initialize(f"localhost:{port}", n_procs, proc_id)
    events_per_s, global_events = MH.fusion_scaling_workload(
        batch_per_device=batch_per_device)
    if proc_id == 0:
        print(json.dumps({
            "processes": n_procs,
            "local_devices": local_devices,
            "global_events": global_events,
            "events_per_s": round(events_per_s, 1),
        }))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_cluster(n_procs: int, local_devices: int,
                batch_per_device: int = 1, timeout: int = 900) -> dict:
    """Spawn n_procs worker processes on this machine; return proc 0's
    JSON result."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = ""          # drop any sitecustomize TPU hijack
    env.pop("JAX_PLATFORMS", None)
    procs = []
    for i in range(n_procs):
        procs.append(subprocess.Popen(
            [sys.executable, str(Path(__file__).resolve()), "worker",
             str(i), str(n_procs), str(port), str(local_devices),
             str(batch_per_device)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env))
    outs = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            raise RuntimeError(
                f"worker {i} failed rc={p.returncode}:\n{err[-3000:]}")
        outs.append(out)
    return json.loads(outs[0].strip().splitlines()[-1])


def launch(argv):
    hosts = 2
    devices = 4
    for a in argv:
        if a.startswith("--hosts"):
            hosts = int(a.split("=")[1])
        elif a.startswith("--devices"):
            devices = int(a.split("=")[1])

    one = run_cluster(1, devices)
    many = run_cluster(hosts, devices)
    scaling = many["events_per_s"] / (hosts * one["events_per_s"])
    print(json.dumps({
        "single_host": one,
        "multi_host": many,
        "hosts": hosts,
        "scaling_efficiency": round(scaling, 3),
        "target": 0.8,
        "meets_target": scaling >= 0.8,
    }, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2:])
    else:
        launch(sys.argv[1:])
