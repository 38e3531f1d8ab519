"""Mesh + sharding utilities (SURVEY.md §2.8).

Data parallelism is first-class: the batch axis is sharded over the ``data``
mesh axis and parameters are replicated; XLA inserts the ICI collectives
(gradient psum, sync-BN statistic reductions) automatically because the step
function is expressed over logically-global arrays. A ``model`` axis is kept
in the mesh shape for future tensor-parallel layouts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ICI-friendly layout: contiguous device ranges map to the model axis so
    model collectives ride neighbor links; the data axis spans the rest.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def fit_data_parallel(batch_size: int, available: Optional[int] = None) -> int:
    """Largest device count <= available that divides the global batch (the
    data axis size must divide the sharded dimension)."""
    if available is None:
        available = len(jax.devices())
    for n in range(min(batch_size, available), 0, -1):
        if batch_size % n == 0:
            return n
    return 1


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(batch, sharding):
    """Host batch -> global device array under ``sharding``.

    Single-process: plain ``device_put``. Multi-process (DCN): each process
    holds only ITS shard of the global batch (its data-loader slice), and
    ``jax.make_array_from_process_local_data`` assembles the logically-global
    array from per-process shards — ``device_put`` of a host array onto
    non-addressable devices would fail, and every host loading the full
    global batch would defeat the DCN design (SURVEY.md §2.8)."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sharding), batch
        )
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)
        ),
        batch,
    )


def shard_batch(batch, mesh: Mesh):
    """Put a host batch onto the mesh sharded over the data axis. In a
    multi-process run ``batch`` must be this process's shard (see
    :func:`put_global`)."""
    return put_global(batch, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    """Replicate a host tree onto every mesh device (all processes must pass
    the same values — true here because initialization is seed-deterministic)."""
    return put_global(tree, replicated_sharding(mesh))
