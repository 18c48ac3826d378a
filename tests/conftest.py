"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Two-tier invocation (the suite is ~63 min on this 2-core host):
  pytest -m "not slow" -q     # fast loop, <10 min: every subsystem's unit
                              # + smoke coverage
  pytest -q                   # full suite (nightly / pre-round): adds the
                              # long e2e drives, sharding-equality, oracle,
                              # soak and multi-process tests

The reference has no multi-node testing at all (SURVEY.md §4); here every test
run exercises an 8-device mesh on one host via
``--xla_force_host_platform_device_count`` so sharding paths are continuously
validated without TPU pods. f64 is enabled for numeric golden tests.

NOTE: this environment force-registers an `axon` TPU backend via
sitecustomize regardless of JAX_PLATFORMS, so we must override the platform
with an in-process config update *before* any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the fast tier is compile-dominated (the
# engine/EKF/ICP scans each cost 30-140 s to build on this 2-core host);
# caching executables across test sessions cuts repeat runs to the actual
# numeric work. Keys are HLO-content hashes, so code changes invalidate
# exactly the programs they touch.
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache", "tests-cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
