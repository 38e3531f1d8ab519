"""Unit tests for segtpu.ops.losses against independent NumPy oracles.

Oracle formulas are re-derived from first principles (sigmoid/BCE/Jaccard
definitions) and cross-checked against the reference's documented quirks
(SURVEY.md §2.3), not copied from the reference code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.ops import losses


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _bce_with_logits_np(x, t):
    # stable: softplus(x) - x*t
    return np.logaddexp(0.0, x) - x * t


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 16, 16, 1).astype(np.float32) * 3
    targets = (rng.rand(4, 16, 16, 1) > 0.6).astype(np.float32)
    return logits, targets


def test_dice_loss(data):
    logits, t = data
    p = _sigmoid(logits)
    expected = 1 - 2 * (p * t).sum() / (p.sum() + t.sum() + 1e-7)
    got = losses.dice_loss(jnp.array(logits), jnp.array(t))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_jaccard_loss(data):
    logits, t = data
    p = _sigmoid(logits)
    i = (p * t).sum()
    u = p.sum() + t.sum()
    expected = 1 - i / (u - i + 1e-7)
    got = losses.jaccard_loss(jnp.array(logits), jnp.array(t))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_smooth_jaccard_loss(data):
    logits, t = data
    p = _sigmoid(logits)
    i = (p * t).sum()
    u = p.sum() + t.sum()
    expected = 1 - (i + 100) / (u - i + 100)
    got = losses.smooth_jaccard_loss(jnp.array(logits), jnp.array(t))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_bce_with_sigmoid_double_squash_quirk(data):
    """The registered `bce` applies logsigmoid then BCE-with-logits again."""
    logits, t = data
    x = np.log(_sigmoid(logits))  # logsigmoid
    expected = _bce_with_logits_np(x, t).mean()
    got = losses.bce_with_sigmoid_loss(jnp.array(logits), jnp.array(t))
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    # sanity: this is NOT the conventional bce
    conventional = _bce_with_logits_np(logits, t).mean()
    assert abs(float(got) - conventional) > 1e-3


def test_bce_with_logits(data):
    logits, t = data
    expected = _bce_with_logits_np(logits, t).mean()
    got = losses.bce_with_logits(jnp.array(logits), jnp.array(t))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_bce_smooth_jaccard_combo(data):
    logits, t = data
    l1 = float(losses.bce_with_sigmoid_loss(jnp.array(logits), jnp.array(t)))
    l2 = float(losses.smooth_jaccard_loss(jnp.array(logits), jnp.array(t)))
    expected = (l1 * 1.0 + l2 * 0.5) / 1.5
    got = losses.bce_smooth_jaccard_loss(jnp.array(logits), jnp.array(t))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_focal_binary_sum_reduction(data):
    logits, t = data
    x = np.log(_sigmoid(logits))
    logpt = -_bce_with_logits_np(x, t)
    pt = np.exp(logpt)
    expected = (-((1 - pt) ** 2) * logpt).sum()
    got = losses.focal_loss_binary(jnp.array(logits), jnp.array(t))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_focal_multi_matches_manual():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 8, 8, 4).astype(np.float32)
    targets = rng.randint(0, 4, size=(2, 8, 8))
    targets[0, :2, :2] = -100  # ignored region
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    valid = targets != -100
    safe = np.where(valid, targets, 0)
    logpt = np.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    logpt = np.where(valid, logpt, 0.0)
    pt = np.exp(logpt)
    loss = np.where(valid, -((1 - pt) ** 2) * logpt, 0.0)
    expected = loss.mean()  # mean over ALL elements incl. ignored (torch behavior)
    got = losses.focal_loss_multi(jnp.array(logits), jnp.array(targets))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_jaccard_multi_absent_class_contributes_zero():
    rng = np.random.RandomState(2)
    logits = rng.randn(1, 8, 8, 3).astype(np.float32)
    targets = np.zeros((1, 8, 8), dtype=np.int32)
    targets[0, 4:, 4:] = 1  # class 2 never appears
    loss_vec = losses.jaccard_loss_multi(
        jnp.array(logits), jnp.array(targets), reduce=False
    )
    assert float(loss_vec[2]) == 0.0
    assert float(loss_vec[0]) > 0.0


def test_jaccard_multi_class_weights_normalized():
    rng = np.random.RandomState(3)
    logits = rng.randn(1, 8, 8, 2).astype(np.float32)
    targets = rng.randint(0, 2, size=(1, 8, 8))
    lw = losses.jaccard_loss_multi(
        jnp.array(logits), jnp.array(targets), class_weights=jnp.array([2.0, 2.0])
    )
    vec = losses.jaccard_loss_multi(jnp.array(logits), jnp.array(targets), reduce=False)
    np.testing.assert_allclose(lw, float(vec[0]) * 0.5 + float(vec[1]) * 0.5, rtol=1e-5)


def test_registry_names():
    for name in ["jaccard", "bce_jaccard", "focal", "bce"]:
        assert callable(losses.get_loss(name))
    assert callable(losses.get_loss("BCE"))  # case-insensitive
    with pytest.raises(ValueError):
        losses.get_loss("nope")


def test_losses_are_jittable_and_differentiable(data):
    logits, t = data
    for name in ["jaccard", "bce_jaccard", "focal", "bce", "dice"]:
        fn = losses.get_loss(name)
        val = jax.jit(fn)(jnp.array(logits), jnp.array(t))
        assert np.isfinite(float(val))
        g = jax.grad(lambda l: fn(l, jnp.array(t)))(jnp.array(logits))
        assert np.isfinite(np.asarray(g)).all()
