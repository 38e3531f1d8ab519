"""Tests for metrics + PR curve counting (vs naive threshold-loop oracle)."""

import numpy as np

import jax.numpy as jnp

from segtpu.ops import meters, metrics


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_jaccard_score():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 8, 8, 1).astype(np.float32)
    t = (rng.rand(2, 8, 8, 1) > 0.5).astype(np.float32)
    p = _sigmoid(logits)
    i = (p * t).sum()
    u = p.sum() + t.sum()
    expected = i / (u - i + 1e-7)
    got = metrics.jaccard_score(jnp.array(logits), jnp.array(t))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_pixel_accuracy():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 8, 8, 1).astype(np.float32)
    t = (rng.rand(2, 8, 8, 1) > 0.5).astype(np.float32)
    expected = ((_sigmoid(logits) > 0.5) == (t > 0.5)).mean()
    got = metrics.pixel_accuracy(jnp.array(logits), jnp.array(t))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_pr_curve_counts_vs_naive_loop():
    rng = np.random.RandomState(2)
    logits = rng.randn(1, 16, 16, 1).astype(np.float32) * 2
    t = (rng.rand(1, 16, 16, 1) > 0.7).astype(np.int32)

    n = 127
    thresholds = np.arange(0.0, 1.0, 1.0 / n, dtype=np.float32)
    p = _sigmoid(logits).reshape(-1)
    tt = t.reshape(-1)
    tp = np.zeros(n, dtype=np.int64)
    tn = np.zeros(n, dtype=np.int64)
    fp = np.zeros(n, dtype=np.int64)
    fn = np.zeros(n, dtype=np.int64)
    for i, thr in enumerate(thresholds):
        pred = (p > thr).astype(np.int32)
        tp[i] = ((pred == 1) & (tt == 1)).sum()
        tn[i] = ((pred == 0) & (tt == 0)).sum()
        fp[i] = ((pred == 1) & (tt == 0)).sum()
        fn[i] = ((pred == 0) & (tt == 1)).sum()

    gtp, gtn, gfp, gfn = metrics.pr_curve_counts(jnp.array(logits), jnp.array(t))
    np.testing.assert_array_equal(np.asarray(gtp), tp)
    np.testing.assert_array_equal(np.asarray(gtn), tn)
    np.testing.assert_array_equal(np.asarray(gfp), fp)
    np.testing.assert_array_equal(np.asarray(gfn), fn)


def test_pr_meter_accumulates():
    m = meters.PRCurveMeter()
    rng = np.random.RandomState(3)
    total_tp = np.zeros(127, dtype=np.uint64)
    for _ in range(3):
        logits = rng.randn(1, 8, 8, 1).astype(np.float32)
        t = (rng.rand(1, 8, 8, 1) > 0.5).astype(np.int32)
        tp, tn, fp, fn = metrics.pr_curve_counts(jnp.array(logits), jnp.array(t))
        m.update_counts(tp, tn, fp, fn)
        total_tp += np.asarray(tp, dtype=np.uint64)
    np.testing.assert_array_equal(m.tp, total_tp)
    prec = m.precision()
    assert prec.shape == (127,)


def test_average_meter_semantics():
    m = meters.AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    m.update(2.0, n=2)
    assert m.count == 4
    assert m.avg == 2.0
    assert str(m) == "2.000"
    m.reset()
    assert m.count == 0
