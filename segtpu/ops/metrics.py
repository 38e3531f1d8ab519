"""Device-resident segmentation metrics (reference lib/metrics.py).

Pure jnp functions designed to fuse into the same compiled program as the
train/eval step, so metric computation costs no extra device round-trips
(unlike the reference, which syncs `.item()` per batch per metric).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def jaccard_score(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Soft IoU on sigmoid probs, global reduction (reference lib/metrics.py:9-23)."""
    p = jax.nn.sigmoid(logits)
    t = targets.astype(p.dtype)
    intersection = jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t)
    return intersection / (union - intersection + _EPS)


def pixel_accuracy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Thresholded (0.5) pixelwise accuracy (reference lib/metrics.py:26-43)."""
    pred = jax.nn.sigmoid(logits) > 0.5
    t = targets > 0.5 if targets.dtype != jnp.bool_ else targets
    correct = jnp.sum((pred == t).astype(jnp.float32))
    return correct / targets.size


def hard_iou(logits: jnp.ndarray, targets: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Hard (thresholded) IoU — extra metric beyond the reference set."""
    pred = (jax.nn.sigmoid(logits) > threshold).astype(jnp.float32)
    t = targets.astype(jnp.float32)
    intersection = jnp.sum(pred * t)
    union = jnp.sum(pred) + jnp.sum(t) - intersection
    return intersection / (union + _EPS)


METRIC_REGISTRY = {
    "iou": jaccard_score,
    "accuracy": pixel_accuracy,
}


def default_metrics():
    """The reference's metric set: {'iou', 'accuracy'} (torch_train.py:376)."""
    return dict(METRIC_REGISTRY)


def pr_curve_counts(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    n_thresholds: int = 127,
):
    """Confusion counts over a threshold sweep (reference lib/train_utils.py:92-131).

    Computes tp/tn/fp/fn at thresholds arange(0, 1, 1/n) — but as a single
    device pass: bucket sigmoid probs into threshold bins with a one-hot
    matmul (MXU-friendly), split counts by target class, and suffix-sum, vs.
    the reference's 127 full passes over the flattened arrays on host.

    Returns (tp, tn, fp, fn) int32 arrays of shape (n_thresholds,).
    """
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = (targets.reshape(-1) > 0.5).astype(jnp.float32)

    thresholds = jnp.arange(n_thresholds, dtype=p.dtype) / n_thresholds
    # bin i collects probs in (thr[i], thr[i+1]]; probs <= thr[0]=0 land in bin -1
    # (never predicted positive). searchsorted with side='left' on p gives the
    # count of thresholds strictly below p, i.e. how many thresholds this pixel
    # is "positive" for.
    n_above = jnp.searchsorted(thresholds, p, side="left")  # in [0, n]
    onehot = jax.nn.one_hot(n_above - 1, n_thresholds, dtype=jnp.float32)
    # pixel with n_above = k is positive for thresholds 0..k-1 -> contributes to
    # suffix bins. Build per-bin counts then prefix-sum from the top.
    pos_bins = onehot.T @ t                      # (n,) counts of true pixels whose n_above-1 == bin
    neg_bins = onehot.T @ (1.0 - t)
    # tp(i) = # {p > thr[i], t=1} = sum_{bin >= i} pos_bins[bin]
    tp = jnp.cumsum(pos_bins[::-1])[::-1]
    fp = jnp.cumsum(neg_bins[::-1])[::-1]
    n_pos = jnp.sum(t)
    n_neg = t.size - n_pos
    fn = n_pos - tp
    tn = n_neg - fp
    return (tp.astype(jnp.int32), tn.astype(jnp.int32),
            fp.astype(jnp.int32), fn.astype(jnp.int32))
