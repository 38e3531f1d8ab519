"""Checkpoint save/restore round-trip (SURVEY.md §4g)."""

import numpy as np

import jax
import jax.numpy as jnp

from segtpu.models import get_model
from segtpu.ops import get_loss
from segtpu.train.checkpoint import restore_snapshot, save_snapshot
from segtpu.train.optim import get_optimizer
from segtpu.train.state import create_train_state, make_train_step


def test_checkpoint_roundtrip(tmp_path):
    model = get_model("unet")
    tx = get_optimizer("adam", 1e-3)
    state = create_train_state(model, tx, (2, 32, 32, 3))

    # take a step so opt_state is non-trivial (adam moments move)
    step = make_train_step(get_loss("bce"), donate=False)
    rng = np.random.RandomState(0)
    batch = (jnp.array(rng.rand(2, 32, 32, 3), jnp.float32),
             jnp.array((rng.rand(2, 32, 32, 1) > 0.5).astype(np.float32)))
    state, _ = step(state, batch, 1e-3, jax.random.PRNGKey(0))

    path = str(tmp_path / "unet_checkpoint.ckpt")
    history = {"epoch": [0], "loss": [0.7], "val_loss": [0.6]}
    save_snapshot(state, 0.6, 0, history, path, args="-m unet -d shapes")

    fresh = create_train_state(model, tx, (2, 32, 32, 3))
    restored, start_epoch, hist, best = restore_snapshot(fresh, path)

    assert start_epoch == 1
    assert best == 0.6
    assert hist == history
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.batch_stats),
                    jax.tree_util.tree_leaves(restored.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_without_optimizer(tmp_path):
    model = get_model("unet")
    tx = get_optimizer("adam", 1e-3)
    state = create_train_state(model, tx, (1, 32, 32, 3))
    path = str(tmp_path / "snap.ckpt")
    save_snapshot(state, 1.0, 4, {}, path)
    fresh = create_train_state(model, tx, (1, 32, 32, 3))
    restored, start_epoch, _, _ = restore_snapshot(fresh, path, restore_opt=False)
    assert start_epoch == 5
    assert restored.opt_state is fresh.opt_state


def test_snapshot_overwrite(tmp_path):
    model = get_model("unet")
    tx = get_optimizer("sgd", 1e-3)
    state = create_train_state(model, tx, (1, 32, 32, 3))
    path = str(tmp_path / "snap.ckpt")
    save_snapshot(state, 1.0, 0, {}, path)
    save_snapshot(state, 0.5, 1, {"loss": [1.0, 0.5]}, path)
    _, start_epoch, hist, best = restore_snapshot(state, path)
    assert start_epoch == 2 and best == 0.5 and hist["loss"] == [1.0, 0.5]


def test_restore_across_optimizers(tmp_path):
    """An adam-trained checkpoint restores into an sgd-templated state with
    restore_opt=False (the submit/inference path — reference inria_submit
    restores weights only): opt_state shape mismatch must not matter."""
    model = get_model("unet")
    state = create_train_state(model, get_optimizer("adam", 1e-3), (1, 32, 32, 3))
    path = str(tmp_path / "snap.ckpt")
    save_snapshot(state, 0.7, 2, {}, path)

    sgd_state = create_train_state(model, get_optimizer("sgd", 1e-2), (1, 32, 32, 3))
    restored, start_epoch, _, best = restore_snapshot(
        sgd_state, path, restore_opt=False)
    assert start_epoch == 3 and best == 0.7
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
