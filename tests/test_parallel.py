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


class TestTensorParallel:
    """Channel-sharded TP over the model axis (segtpu.parallel.tensor)."""

    def _state_and_batch(self, batch=8, patch=32, optimizer="sgd"):
        import jax.numpy as jnp

        from segtpu.data.shapes import ShapesDataset
        from segtpu.models import get_model
        from segtpu.train.optim import get_optimizer
        from segtpu.train.state import create_train_state

        model = get_model("unet")
        state = create_train_state(
            model, get_optimizer(optimizer, 1e-3), (batch, patch, patch, 3)
        )
        ds = ShapesDataset(batch, patch, seed=0)
        xs, ys = zip(*[ds[i] for i in range(batch)])
        return state, (jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys)))

    def test_tp_param_specs_shard_large_channel_dims(self):
        from jax.sharding import PartitionSpec as P

        from segtpu.parallel.tensor import tp_param_specs

        mesh = make_mesh(model_parallel=4)
        state, _ = self._state_and_batch()
        specs = tp_param_specs(state.params, mesh, min_features=64)
        leaves = jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, P)
        )
        sharded = [s for s in leaves if s != P()]
        assert sharded, "no parameter got a model-axis sharding"
        # every sharded leaf names only the model axis
        assert all(
            set(ax for ax in s if ax is not None) == {"model"} for s in sharded
        )
        # tp=1 mesh -> everything replicated
        specs1 = tp_param_specs(state.params, make_mesh(model_parallel=1))
        assert all(
            s == P()
            for s in jax.tree_util.tree_leaves(
                specs1, is_leaf=lambda x: isinstance(x, P)
            )
        )

    def test_tp_shard_state_shards_optimizer_moments(self):
        from segtpu.parallel.tensor import tp_shard_state

        state, _ = self._state_and_batch(optimizer="adam")
        mesh = make_mesh(model_parallel=4)
        tp_state = tp_shard_state(state, mesh)
        # params + optimizer moments really live sharded over the model axis
        kernel = tp_state.params["down1"]["conv0"]["Conv_0"]["kernel"]
        assert kernel.sharding.spec[-1] == "model"
        # each device holds only 1/tp of the kernel's output channels
        shard_shape = kernel.sharding.shard_shape(kernel.shape)
        assert shard_shape[-1] == kernel.shape[-1] // 4
        mu = tp_state.opt_state.inner_state[0].mu["down1"]["conv0"]["Conv_0"]["kernel"]
        assert mu.sharding.shard_shape(mu.shape) == shard_shape

    def test_dp_tp_step_matches_single_device(self):
        """2x4 (data x model) sharded train step == unsharded step.

        SGD keeps the comparison well-conditioned: adam's first-step update
        is ~lr*sign(g), so reduction-order noise on near-zero gradients
        would flip whole +-lr increments."""
        from segtpu.ops import default_metrics, get_loss
        from segtpu.parallel.tensor import tp_shard_state
        from segtpu.train.state import make_train_step

        state, batch = self._state_and_batch(optimizer="sgd")
        step = make_train_step(get_loss("bce"), default_metrics(), donate=False)
        rng = jax.random.PRNGKey(0)

        ref_state, ref_logs = step(state, batch, 1e-3, rng)

        mesh = make_mesh(model_parallel=4)
        assert mesh.shape["data"] == 2 and mesh.shape["model"] == 4
        tp_state = tp_shard_state(state, mesh)
        sharded_batch = shard_batch(batch, mesh)

        tp_out, tp_logs = step(tp_state, sharded_batch, 1e-3, rng)

        np.testing.assert_allclose(
            float(tp_logs["loss"]), float(ref_logs["loss"]), rtol=1e-5
        )
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_state.params),
            jax.tree_util.tree_leaves_with_path(tp_out.params),
        ):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, err_msg=str(pa)
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_state.batch_stats),
            jax.tree_util.tree_leaves(tp_out.batch_stats),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
