"""End-to-end slice tests: shapes data -> UNet -> jitted train step.

Covers: loss decreases (overfit), metrics computed in-step, grad masking
(frozen params), multi-device data-parallel equivalence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.data.shapes import ShapesDataset, DeviceShapes
from segtpu.data.pipeline import DataLoader
from segtpu.models import get_model
from segtpu.ops import get_loss, default_metrics
from segtpu.parallel import make_mesh, shard_batch, replicate
from segtpu.train.optim import get_optimizer
from segtpu.train.state import create_train_state, make_eval_step, make_train_step


def _fixed_batch(batch_size=4, patch=64, seed=0):
    ds = ShapesDataset(batch_size, patch, seed=seed)
    xs, ys = zip(*[ds[i] for i in range(batch_size)])
    return jnp.array(np.stack(xs)), jnp.array(np.stack(ys))


def test_overfit_single_batch():
    """The model must overfit one fixed batch — loss down, IoU up."""
    model = get_model("unet")
    tx = get_optimizer("adam", 1e-3)
    state = create_train_state(model, tx, (4, 64, 64, 3))
    step = make_train_step(get_loss("bce"), default_metrics(), donate=False)
    batch = _fixed_batch()
    rng = jax.random.PRNGKey(0)

    first_loss = None
    logs = None
    for i in range(30):
        state, logs = step(state, batch, 1e-3, rng)
        if first_loss is None:
            first_loss = float(logs["loss"])
    last_loss = float(logs["loss"])
    assert last_loss < first_loss * 0.7, (first_loss, last_loss)
    assert float(logs["accuracy"]) > 0.9
    assert np.isfinite(float(logs["grad_absmax"]))


def test_eval_step_uses_running_stats():
    model = get_model("unet")
    tx = get_optimizer("sgd", 1e-2)
    state = create_train_state(model, tx, (2, 64, 64, 3))
    ev = make_eval_step(get_loss("bce"), default_metrics(), with_pr_curve=True)
    batch = _fixed_batch(2)
    logs = ev(state, batch)
    assert set(logs) == {"loss", "iou", "accuracy", "pr_counts"}
    assert logs["pr_counts"][0].shape == (127,)


def test_frozen_mask_zeroes_grads():
    model = get_model("unet")
    tx = get_optimizer("sgd", 1e-2)
    state = create_train_state(model, tx, (2, 64, 64, 3))
    # freeze everything except the output head
    mask = jax.tree_util.tree_map(lambda _: False, state.params)
    mask["outc"] = jax.tree_util.tree_map(lambda _: True, state.params["outc"])
    step = make_train_step(get_loss("bce"), trainable_mask=mask, donate=False)
    batch = _fixed_batch(2)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    state2, _ = step(state, batch, 1e-2, jax.random.PRNGKey(0))
    # frozen params unchanged
    np.testing.assert_array_equal(
        np.asarray(state2.params["inc"]["conv0"]["Conv_0"]["kernel"]),
        p0["inc"]["conv0"]["Conv_0"]["kernel"],
    )
    # head moved
    assert not np.array_equal(
        np.asarray(state2.params["outc"]["Conv_0"]["kernel"]),
        p0["outc"]["Conv_0"]["kernel"],
    )


def test_data_parallel_matches_single_device():
    """Same batch, same init: sharded-over-8-devices step == single-device step
    (gradient averaging + sync-BN all via mesh semantics)."""
    model = get_model("unet")
    tx = get_optimizer("sgd", 1e-2)
    batch = _fixed_batch(8)

    state1 = create_train_state(model, tx, (8, 64, 64, 3))
    step1 = make_train_step(get_loss("bce"), donate=False)
    s1, logs1 = step1(state1, batch, 1e-2, jax.random.PRNGKey(0))

    mesh = make_mesh()
    state2 = create_train_state(model, tx, (8, 64, 64, 3))
    state2 = replicate(state2, mesh)
    sharded = shard_batch(batch, mesh)
    step2 = make_train_step(get_loss("bce"), donate=False)
    s2, logs2 = step2(state2, sharded, 1e-2, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(logs2["loss"]), float(logs1["loss"]), rtol=1e-5)
    k1 = np.asarray(s1.params["inc"]["conv0"]["Conv_0"]["kernel"])
    k2 = np.asarray(s2.params["inc"]["conv0"]["Conv_0"]["kernel"])
    # cross-device psum reduction order differs from the single-device sum;
    # tolerance covers fp32 noise amplified by the batch_size*loss scaling
    np.testing.assert_allclose(k2, k1, atol=5e-4)
    bs1 = np.asarray(jax.tree_util.tree_leaves(s1.batch_stats)[0])
    bs2 = np.asarray(jax.tree_util.tree_leaves(s2.batch_stats)[0])
    np.testing.assert_allclose(bs2, bs1, atol=1e-5)


def test_device_shapes_generator():
    gen = DeviceShapes(64)
    x, y = gen.batch(jax.random.PRNGKey(0), 4)
    assert x.shape == (4, 64, 64, 3) and y.shape == (4, 64, 64, 1)
    # ImageNet-normalized: roughly within +-3 std
    assert -3.0 <= float(x.min()) and float(x.max()) <= 3.0
    assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}
    assert float(y.mean()) > 0  # some ellipse pixels present


def test_dataloader_batching_and_shuffle():
    ds = ShapesDataset(20, 32, seed=3)
    dl = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True, seed=1)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    assert batches[0][0].shape == (8, 32, 32, 3)
    dl.set_epoch(1)
    batches2 = list(dl)
    assert not np.array_equal(batches[0][0], batches2[0][0])  # reshuffled+regen
