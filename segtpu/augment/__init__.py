"""Augmentation pipeline (reference lib/augmentations.py, 538 LoC).

Two tiers, both capability-complete vs the reference:

  * :mod:`segtpu.augment.device` — batched, jit-compiled, ``jax.random``-keyed
    NHWC transforms that run on the TPU inside the input pipeline (geometric
    D4 ops, crops, flips, photometric jitter, normalize). TPU-first: the
    augmentation cost rides the accelerator instead of host workers.
  * :mod:`segtpu.augment.host` — NumPy/OpenCV per-sample transforms with the
    reference's exact combinator API (Sequential/OneOf/OneOrOther/ImageOnly/
    MaskOnly) for host-side pipelines and parity checks.

D4 test-time augmentation (reference aug:476-511) is here as batched device
ops used by tiled inference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "tta_d4_aug_batch",
    "tta_d4_deaug_batch",
    "tta_d4_aug",
    "tta_d4_deaug",
    "pad_to_multiple",
    "unpad",
]


def tta_d4_aug_batch(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N*8, H, W, C): each sample expanded to its 8 D4-group
    transforms in the reference's order (aug:476-491):
    [id, rot90, rot180, rot270, fliplr, fliplr.rot90, fliplr.rot180,
    fliplr.rot270]."""
    views = [
        x,
        jnp.rot90(x, 1, axes=(1, 2)),
        jnp.rot90(x, 2, axes=(1, 2)),
        jnp.rot90(x, 3, axes=(1, 2)),
        jnp.flip(x, axis=2),
        jnp.flip(jnp.rot90(x, 1, axes=(1, 2)), axis=2),
        jnp.flip(jnp.rot90(x, 2, axes=(1, 2)), axis=2),
        jnp.flip(jnp.rot90(x, 3, axes=(1, 2)), axis=2),
    ]
    # interleave so sample i occupies rows [8i, 8i+8) like the reference list
    stacked = jnp.stack(views, axis=1)  # (N, 8, H, W, C)
    n, _, h, w, c = stacked.shape
    return stacked.reshape(n * 8, h, w, c)


def tta_d4_deaug_batch(x: jnp.ndarray) -> jnp.ndarray:
    """(N*8, H, W, C) -> (N, H, W, C): invert each D4 transform and average
    groups of 8 (reference aug:494-511)."""
    assert x.shape[0] % 8 == 0
    n = x.shape[0] // 8
    g = x.reshape(n, 8, *x.shape[1:])
    inv = [
        g[:, 0],
        jnp.rot90(g[:, 1], -1, axes=(1, 2)),
        jnp.rot90(g[:, 2], -2, axes=(1, 2)),
        jnp.rot90(g[:, 3], -3, axes=(1, 2)),
        jnp.flip(g[:, 4], axis=2),
        jnp.rot90(jnp.flip(g[:, 5], axis=2), -1, axes=(1, 2)),
        jnp.rot90(jnp.flip(g[:, 6], axis=2), -2, axes=(1, 2)),
        jnp.rot90(jnp.flip(g[:, 7], axis=2), -3, axes=(1, 2)),
    ]
    return sum(inv) * (1.0 / 8.0)


# Host list-based API (reference-compatible shape: list of HWC arrays)

def tta_d4_aug(images):
    """List-of-HWC form (reference tta_d4_aug, aug:476-491)."""
    res = []
    for image in images:
        res.extend([
            image,
            np.rot90(image, 1),
            np.rot90(image, 2),
            np.rot90(image, 3),
            np.fliplr(image),
            np.fliplr(np.rot90(image, 1)),
            np.fliplr(np.rot90(image, 2)),
            np.fliplr(np.rot90(image, 3)),
        ])
    return res


def tta_d4_deaug(image_list):
    """List-of-HWC inverse + mean (reference tta_d4_deaug, aug:494-511)."""
    assert len(image_list) % 8 == 0
    res = []
    for i in range(0, len(image_list), 8):
        img = (
            image_list[i + 0]
            + np.rot90(image_list[i + 1], -1)
            + np.rot90(image_list[i + 2], -2)
            + np.rot90(image_list[i + 3], -3)
            + np.fliplr(image_list[i + 4])
            + np.rot90(np.fliplr(image_list[i + 5]), -1)
            + np.rot90(np.fliplr(image_list[i + 6]), -2)
            + np.rot90(np.fliplr(image_list[i + 7]), -3)
        ) * (1.0 / 8.0)
        res.append(img)
    return res


def pad_to_multiple(image: np.ndarray, pad_size: int):
    """Pad H/W up to a multiple of pad_size with border replicate
    (reference pad, aug:513-533). Returns (padded, (top, btm, left, right))."""
    rows, cols = image.shape[:2]
    pad_rows = rows % pad_size
    pad_cols = cols % pad_size
    if pad_rows == 0 and pad_cols == 0:
        return image, (0, 0, 0, 0)
    pad_rows = pad_size - pad_rows
    pad_cols = pad_size - pad_cols
    top = pad_rows // 2
    btm = pad_rows - top
    left = pad_cols // 2
    right = pad_cols - left
    pads = [(top, btm), (left, right)] + [(0, 0)] * (image.ndim - 2)
    return np.pad(image, pads, mode="edge"), (top, btm, left, right)


def unpad(image: np.ndarray, pad):
    """Inverse of :func:`pad_to_multiple` (reference unpad, aug:535-538)."""
    top, btm, left, right = pad
    rows, cols = image.shape[:2]
    return image[top:rows - btm, left:cols - right]
