"""Mesh/sharding utility tests."""

import numpy as np
import pytest

import jax

from segtpu.parallel import (
    batch_sharding,
    fit_data_parallel,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from segtpu.parallel.distributed import maybe_initialize_distributed


def test_fit_data_parallel():
    assert fit_data_parallel(16, 8) == 8
    assert fit_data_parallel(4, 8) == 4
    assert fit_data_parallel(6, 8) == 6
    assert fit_data_parallel(7, 8) == 7
    assert fit_data_parallel(5, 4) == 1  # 5 % {4,3,2} != 0
    assert fit_data_parallel(1, 8) == 1


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == jax.device_count()
    assert mesh.shape["model"] == 1
    mesh2 = make_mesh(model_parallel=2)
    assert mesh2.shape["model"] == 2
    assert mesh2.shape["data"] == jax.device_count() // 2
    with pytest.raises(ValueError):
        make_mesh(n_devices=7, model_parallel=2)


def test_shard_and_replicate():
    mesh = make_mesh()
    batch = (np.zeros((8, 4, 4, 3), np.float32), np.zeros((8, 4, 4, 1), np.float32))
    sharded = shard_batch(batch, mesh)
    assert len(sharded[0].sharding.device_set) == jax.device_count()
    tree = replicate({"w": np.ones((3,))}, mesh)
    assert tree["w"].sharding == replicated_sharding(mesh)
    assert batch_sharding(mesh).spec != replicated_sharding(mesh).spec


def test_maybe_initialize_distributed_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert maybe_initialize_distributed() is False
