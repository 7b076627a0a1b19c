"""Device mesh and sharding helpers.

Parallelism layout (SURVEY.md §2 'Parallelism strategies' [B]): the model is
~25M params, so the production strategy is pure data-parallelism over ICI on
a v5e-8 — a 1-D ('data',) mesh, batch sharded on it, params replicated; XLA
inserts the gradient all-reduce (psum over ICI) from the sharding
annotations.  TP/PP/EP axes are deliberately absent (reserved in MeshConfig)
because the reference has no analog and the model doesn't need them.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dan_tpu.config import MeshConfig


def make_mesh(config: MeshConfig = MeshConfig(), n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = (
            len(devices)
            if config.data_parallel_size == -1
            else config.data_parallel_size
        )
    return Mesh(np.asarray(devices[:n_devices]), (config.data_axis,))


def batch_sharding(mesh: Mesh, config: MeshConfig = MeshConfig()) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(config.data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place_replicated(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh.

    Run this on the initial TrainState BEFORE the first jitted step call:
    otherwise the first call compiles for unplaced args and the second for
    mesh-replicated args — a wasted recompile of the whole train graph.
    """
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(batch, mesh: Mesh, config: MeshConfig = MeshConfig()):
    """Device-put a host batch pytree with the leading dim sharded."""
    sharding = batch_sharding(mesh, config)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
