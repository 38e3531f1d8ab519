"""Tests for the regularized trainer, afterburner stack, and LR finder."""

import numpy as np

import jax
import jax.numpy as jnp

from segtpu.data.pipeline import DataLoader
from segtpu.data.shapes import ShapesDataset
from segtpu.lr_finder import find_optimal_lr, smooth_losses
from segtpu.models import get_model
from segtpu.models.afterburner_stack import AfterburnerStack, head_frozen_mask
from segtpu.ops import get_loss
from segtpu.regularization import conv2d_regularization, make_conv2d_penalty
from segtpu.train.optim import get_optimizer, lr_finder_schedule
from segtpu.train.state import create_train_state, make_train_step


def test_conv2d_regularization_values():
    params = {
        "block": {
            "conv_a": {"Conv_0": {"kernel": jnp.array([1.0, -2.0]),
                                  "bias": jnp.array([3.0])}},
            "deconv": {"ConvTranspose_0": {"kernel": jnp.array([10.0]),
                                           "bias": jnp.array([10.0])}},
        }
    }
    # L1 over conv kernels: |1|+|-2| = 3; L2 over conv biases: 9
    # transposed conv excluded (reference isinstance(nn.Conv2d) check)
    got = conv2d_regularization(params, l1_factor=1.0, l2_factor=1.0)
    np.testing.assert_allclose(float(got), 12.0)
    got = conv2d_regularization(params, l1_factor=0.5, l2_factor=0.1)
    np.testing.assert_allclose(float(got), 0.5 * 3 + 0.1 * 9)


def test_penalty_changes_gradients():
    model = get_model("unet")
    tx = get_optimizer("sgd", 1e-2)
    rng = np.random.RandomState(0)
    batch = (jnp.array(rng.rand(2, 32, 32, 3), jnp.float32),
             jnp.array((rng.rand(2, 32, 32, 1) > 0.5).astype(np.float32)))

    s0 = create_train_state(model, tx, (2, 32, 32, 3))
    plain = make_train_step(get_loss("bce"), donate=False)
    penal = make_train_step(get_loss("bce"), donate=False,
                            param_penalty=make_conv2d_penalty(0.1, 0.1))
    sp, _ = plain(s0, batch, 1e-2, jax.random.PRNGKey(0))
    sr, _ = penal(s0, batch, 1e-2, jax.random.PRNGKey(0))
    a = np.asarray(sp.params["inc"]["conv0"]["Conv_0"]["kernel"])
    b = np.asarray(sr.params["inc"]["conv0"]["Conv_0"]["kernel"])
    assert not np.allclose(a, b)


def test_afterburner_stack_freezes_head_but_updates_its_bn_stats():
    head = get_model("unet")  # stand-in head (linknet34 is slow on CPU)
    model = AfterburnerStack(head=head)
    tx = get_optimizer("adam", 1e-3)
    state = create_train_state(model, tx, (2, 32, 32, 3))
    assert set(state.params.keys()) == {"head", "afterburner"}

    mask = head_frozen_mask(state)
    step = make_train_step(get_loss("bce"), trainable_mask=mask, donate=False)
    rng = np.random.RandomState(1)
    batch = (jnp.array(rng.rand(2, 32, 32, 3), jnp.float32),
             jnp.array((rng.rand(2, 32, 32, 1) > 0.5).astype(np.float32)))

    s2, logs = step(state, batch, 1e-3, jax.random.PRNGKey(0))
    # head params frozen
    for a, b in zip(jax.tree_util.tree_leaves(state.params["head"]),
                    jax.tree_util.tree_leaves(s2.params["head"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # afterburner params moved
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params["afterburner"]),
                        jax.tree_util.tree_leaves(s2.params["afterburner"]))
    )
    assert moved
    # head BN running stats still update (reference never evals the head)
    stats_moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.batch_stats["head"]),
                        jax.tree_util.tree_leaves(s2.batch_stats["head"]))
    )
    assert stats_moved


def test_lr_finder_schedule_and_sweep():
    lrs = lr_finder_schedule()
    assert len(lrs) == 30
    assert lrs[0] == 1e-8 and lrs[1] == 2e-8

    model = get_model("unet")
    tx = get_optimizer("sgd", 1e-8)
    state = create_train_state(model, tx, (2, 32, 32, 3))
    ds = ShapesDataset(8, 32, seed=0)
    loader = DataLoader(ds, batch_size=2, shuffle=False, workers=2)
    lrs, losses = find_optimal_lr(state, get_loss("bce"), loader, n_steps=6)
    assert len(losses) == 6
    assert np.isfinite(losses).all()
    sm = smooth_losses(np.arange(8.0))
    np.testing.assert_allclose(sm, [1.5, 2.5, 3.5, 4.5, 5.5])
