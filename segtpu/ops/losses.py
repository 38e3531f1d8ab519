"""Segmentation losses as pure jnp functions (binary + multiclass).

Behavioral parity with the reference's lib/losses.py (all reductions are
*global* over the batch, not per-sample), including its deliberate quirks:

  * ``bce`` is the reference's BCEWithSigmoidLoss (lib/losses.py:46-53), which
    applies ``logsigmoid`` to the logits and then feeds the result through
    ``binary_cross_entropy_with_logits`` *again* (a double squashing). We
    reproduce it exactly so training curves / val-IoU match; the mathematically
    conventional loss is available as :func:`bce_with_logits`.
  * ``focal`` (lib/losses.py:78-101) uses the same logsigmoid-then-BCE pattern
    and the registry constructs it with ``size_average=False`` -> sum
    reduction (reference torch_train.py:91-92).
  * ``bce_jaccard`` is BCEWithLogitsLossAndSmoothJaccard (lib/losses.py:56-75):
    weights (1, 0.5), normalized by weight sum.

All functions take ``logits`` and ``targets`` of identical shape (NHWC, with
C=1 for binary) and return a scalar. Everything is jit-compatible and fuses
into the surrounding train step — loss + metric share one compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def _bce_with_logits_elementwise(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable elementwise BCE-with-logits.

    BCEWithLogits(x, t) = softplus(x) - x*t
    (equivalent to -[t*log(sigmoid(x)) + (1-t)*log(1-sigmoid(x))]).
    """
    return jax.nn.softplus(x) - x * t


# ---------------------------------------------------------------------------
# Binary losses (registered set + extras)
# ---------------------------------------------------------------------------

def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """1 - 2*I/(sum_p + sum_t + eps) on sigmoid probs (reference lib/losses.py:7-15)."""
    p = jax.nn.sigmoid(logits)
    t = targets.astype(p.dtype)
    intersection = jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t) + _EPS
    return 1.0 - 2.0 * intersection / union


def jaccard_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """1 - I/(U - I + eps), global reduction (reference lib/losses.py:18-28)."""
    p = jax.nn.sigmoid(logits)
    t = targets.astype(p.dtype)
    intersection = jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t)
    jac = intersection / (union - intersection + _EPS)
    return 1.0 - jac


def smooth_jaccard_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, smooth: float = 100.0
) -> jnp.ndarray:
    """Additively smoothed Jaccard (reference lib/losses.py:31-43, smooth=100)."""
    p = jax.nn.sigmoid(logits)
    t = targets.astype(p.dtype)
    intersection = jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t)
    jac = (intersection + smooth) / (union - intersection + smooth)
    return 1.0 - jac


def bce_with_sigmoid_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """The reference's registered ``bce`` loss (lib/losses.py:46-53).

    Quirk preserved: logits pass through logsigmoid first, and the result is
    treated as logits for a second BCE-with-logits. Mean reduction.
    """
    x = jax.nn.log_sigmoid(logits)
    t = targets.astype(x.dtype)
    return jnp.mean(_bce_with_logits_elementwise(x, t))


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Conventional (non-quirk) BCE-with-logits, mean reduction."""
    t = targets.astype(logits.dtype)
    return jnp.mean(_bce_with_logits_elementwise(logits, t))


def bce_smooth_jaccard_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    bce_weight: float = 1.0,
    jaccard_weight: float = 0.5,
) -> jnp.ndarray:
    """BCEWithLogitsLossAndSmoothJaccard (reference lib/losses.py:56-75).

    Weighted combination normalized by the weight sum; cites Iglovikov et al.,
    arXiv:1706.06169.
    """
    loss1 = bce_with_sigmoid_loss(logits, targets) * bce_weight
    loss2 = smooth_jaccard_loss(logits, targets) * jaccard_weight
    return (loss1 + loss2) / (bce_weight + jaccard_weight)


def focal_loss_binary(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    size_average: bool = False,
) -> jnp.ndarray:
    """Binary focal loss (reference lib/losses.py:78-101).

    Quirks preserved: the logsigmoid-then-BCEWithLogits squash, and the
    registry's ``size_average=False`` -> *sum* reduction
    (reference torch_train.py:91-92).
    """
    x = jax.nn.log_sigmoid(logits)
    t = targets.astype(x.dtype)
    logpt = -_bce_with_logits_elementwise(x, t)
    pt = jnp.exp(logpt)
    loss = -((1.0 - pt) ** gamma) * logpt
    return jnp.mean(loss) if size_average else jnp.sum(loss)


# ---------------------------------------------------------------------------
# Multiclass losses (reference lib/losses.py:105-232; not registry-reachable
# in the reference but part of its public surface)
# ---------------------------------------------------------------------------

def focal_loss_multi(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    size_average: bool = True,
    ignore_index: int = -100,
    from_logits: bool = False,
) -> jnp.ndarray:
    """Multiclass focal loss (reference lib/losses.py:105-134).

    ``logits``: (N, H, W, C) raw scores (or log-probs if ``from_logits``);
    ``targets``: (N, H, W) int class ids. NHWC — class axis last (TPU layout),
    vs. the reference's NCHW dim=1.
    """
    if not from_logits:
        logp = jax.nn.log_softmax(logits, axis=-1)
    else:
        logp = logits
    valid = targets != ignore_index
    safe_t = jnp.where(valid, targets, 0)
    logpt = jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
    logpt = jnp.where(valid, logpt, 0.0)
    pt = jnp.exp(logpt)
    loss = -((1.0 - pt) ** gamma) * logpt
    loss = jnp.where(valid, loss, 0.0)
    # torch nll_loss(reduce=False) emits 0 at ignored positions and the
    # subsequent mean() divides by the *full* element count — mirror that.
    return jnp.mean(loss) if size_average else jnp.sum(loss)


def jaccard_loss_multi(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int = -100,
    from_logits: bool = False,
    class_weights: jnp.ndarray | None = None,
    reduce: bool = True,
    smooth: float = 100.0,
) -> jnp.ndarray:
    """Multiclass smoothed Jaccard (reference lib/losses.py:137-195).

    Per-class global Jaccard over non-ignored pixels; classes absent from the
    target contribute 0 (reference's ``num_preds == 0`` branch). Class weights
    are normalized to sum to 1 (reference lib/losses.py:151).
    """
    if from_logits:
        probs = jnp.exp(logits)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    n_classes = probs.shape[-1]
    valid = (targets != ignore_index).astype(probs.dtype)

    def per_class(cls_idx):
        t = (targets == cls_idx).astype(probs.dtype) * valid
        p = probs[..., cls_idx] * valid
        num_preds = jnp.sum(t)
        intersection = jnp.sum(p * t)
        union = jnp.sum(p) + jnp.sum(t)
        jac = (intersection + smooth) / (union - intersection + smooth)
        return jnp.where(num_preds == 0, 0.0, 1.0 - jac)

    loss = jnp.stack([per_class(c) for c in range(n_classes)])
    if class_weights is not None:
        w = jnp.asarray(class_weights, dtype=loss.dtype)
        loss = loss * (w / jnp.sum(w))
    return jnp.sum(loss) if reduce else loss


def focal_and_jaccard_loss_multi(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    jaccard_weight: float = 1.0,
    class_weights: jnp.ndarray | None = None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """Focal + Jaccard multiclass combo (reference lib/losses.py:198-216)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    fl = focal_loss_multi(logp, targets, ignore_index=ignore_index, from_logits=True)
    jl = jaccard_loss_multi(
        logp, targets, ignore_index=ignore_index, from_logits=True,
        class_weights=class_weights,
    )
    return (fl + jl) / (1.0 + jaccard_weight)


def nll_and_jaccard_loss_multi(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    jaccard_weight: float = 1.0,
    class_weights: jnp.ndarray | None = None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """NLL + Jaccard multiclass combo (reference lib/losses.py:219-232)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = targets != ignore_index
    safe_t = jnp.where(valid, targets, 0)
    picked = jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = jnp.asarray(class_weights, dtype=logp.dtype)
        pix_w = jnp.where(valid, w[safe_t], 0.0)
    else:
        pix_w = valid.astype(logp.dtype)
    # torch NLLLoss mean reduction divides by the sum of per-pixel weights.
    nll = -jnp.sum(picked * pix_w) / jnp.maximum(jnp.sum(pix_w), _EPS)
    jl = jaccard_loss_multi(
        logp, targets, ignore_index=ignore_index, from_logits=True,
        class_weights=class_weights,
    )
    return (nll + jl) / (1.0 + jaccard_weight)


# ---------------------------------------------------------------------------
# Registry (reference torch_train.py:82-97)
# ---------------------------------------------------------------------------

LOSS_REGISTRY = {
    "jaccard": jaccard_loss,
    "bce_jaccard": bce_smooth_jaccard_loss,
    "focal": focal_loss_binary,          # sum reduction, as registered
    "bce": bce_with_sigmoid_loss,        # the reference's double-squash bce
    # extras beyond the reference registry (non-quirk variants):
    "dice": dice_loss,
    "bce_logits": bce_with_logits,
    "smooth_jaccard": smooth_jaccard_loss,
}


def get_loss(name: str):
    """name -> loss fn, mirroring reference torch_train.py:82-97."""
    key = name.lower()
    if key not in LOSS_REGISTRY:
        raise ValueError(name)
    return LOSS_REGISTRY[key]
