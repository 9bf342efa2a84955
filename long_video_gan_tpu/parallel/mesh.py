"""Device mesh construction and sharding helpers.

The reference's distribution layer is torchrun + NCCL process groups with
manual flat-gradient all_reduce (torch_utils/distributed.py, utils.py:104-124).
Here the entire strategy is one `jax.sharding.Mesh`: the batch axis shards over
the "data" axis, parameters replicate, and every collective the reference
issues eagerly (grad averaging, magnitude-EMA means, stats reduction, weight
broadcast) becomes an XLA-inserted reduction inside the compiled step.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TIME_AXIS = "time"


def create_mesh(devices=None, axis_names: tuple[str, ...] = (DATA_AXIS,),
                shape: Optional[tuple[int, ...]] = None) -> Mesh:
    """Create a mesh over all (or the given) devices.

    Default: 1-D data-parallel mesh. Pass shape + axis_names for hybrid
    layouts, e.g. shape=(4, 2), axis_names=("data", "time") to combine batch
    sharding with temporal (sequence) sharding of long videos.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is not None:
        devices = devices.reshape(shape)
    elif len(axis_names) > 1:
        raise ValueError("multi-axis mesh requires an explicit shape")
    return Mesh(devices, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1, axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch, mesh: Mesh, axis: int = 0):
    """Place a host array (or pytree) with the batch axis sharded over the mesh.

    Single-host: plain device_put with a NamedSharding. Multi-host: `batch` is
    this process's local rows (total_batch // process_count of them) and the
    global array is assembled with jax.make_array_from_process_local_data —
    the TPU-native replacement for DistributedSampler + per-rank batches
    (reference utils.py:216-228, train_lres.py:65-67).
    """
    multihost = jax.process_count() > 1

    def put(x):
        sharding = batch_sharding(mesh, np.ndim(x), axis)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
