"""Device-mesh construction and sharding helpers.

The reference's only concurrency is ROS process pipelining + mutexes
(SURVEY.md §2c); it has no data/model parallelism to port. This module
defines the TPU-native scaling story instead:

- axis ``"data"``  — independent sequences/bags (batched evaluation, the
  dominant throughput axis for offline replay).
- axis ``"model"`` — intra-estimator parallelism: LiDAR/visual residual sets
  are sharded over points/features and their Gauss-Newton normal equations
  are reduced with ``psum`` over this axis (the distributed
  reduced-camera-system pattern of BASELINE.json's north star).

All collectives ride ICI via ``shard_map`` over one global mesh.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With 1 real TPU chip this is a (1, 1) mesh; tests force 8 virtual CPU
    devices so multi-device paths compile and execute continuously.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devs) // n_model
    use = np.array(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put every leaf with its leading axis sharded over data."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
