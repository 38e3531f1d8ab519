"""Misc utilities (reference lib/common.py:15-50, lib/train_utils.py:72-89)."""

from __future__ import annotations

import glob
import os
from typing import Tuple

import numpy as np

import jax


def auto_file(filename: str, where: str = ".") -> str:
    """Recursive unique-filename search (reference lib/train_utils.py:72-89)."""
    prob = os.path.join(where, filename)
    if os.path.exists(prob) and os.path.isfile(prob):
        return filename

    files = list(glob.iglob(os.path.join(where, "**", filename), recursive=True))
    if len(files) == 0:
        raise FileNotFoundError(
            "Given file could not be found with recursive search:" + filename
        )
    if len(files) > 1:
        raise FileNotFoundError(
            "More than one file matches given filename. Please specify it explicitly"
            + filename
        )
    return files[0]


def count_parameters(params) -> Tuple[int, int]:
    """(total, trainable) parameter counts (reference lib/common.py:15-20).

    In the functional paradigm all params in the tree are trainable unless a
    mask says otherwise, so both numbers are the tree size.
    """
    total = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    return total, total


def maybe_device(x, device=None):
    """Put an array on an accelerator when one exists (the reference's
    maybe_cuda analogue, lib/common.py:11-12)."""
    try:
        return jax.device_put(x, device)
    except Exception:
        return x


def find_in_dir(dirname: str):
    """Sorted full paths of directory entries (reference lib/common.py:23)."""
    return [os.path.join(dirname, fname) for fname in sorted(os.listdir(dirname))]


def read_rgb(fname: str) -> np.ndarray:
    """Read an image file as RGB uint8 HWC (reference lib/common.py:39-43)."""
    import cv2

    x = cv2.imread(fname, cv2.IMREAD_COLOR)
    if x is None:
        raise IOError(f"cannot read image {fname}")
    return cv2.cvtColor(x, cv2.COLOR_BGR2RGB)


def read_gray(fname: str) -> np.ndarray:
    import cv2

    x = cv2.imread(fname, cv2.IMREAD_GRAYSCALE)
    if x is None:
        raise IOError(f"cannot read image {fname}")
    return x


def read_mask(fname: str) -> np.ndarray:
    """Read a mask file as binary {0,1} uint8 HW (reference lib/common.py:46-50)."""
    x = read_gray(fname)
    return (x > 0).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2, normalize: bool = True):
    """Tile a batch NHWC into one HWC image (torchvision make_grid equivalent,
    for TensorBoard image logging at reference torch_train.py:221-223)."""
    images = np.asarray(images, dtype=np.float32)
    if images.ndim == 3:
        images = images[..., None]
    if normalize:
        lo, hi = images.min(), images.max()
        if hi > lo:
            images = (images - lo) / (hi - lo)
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nr = (n + ncol - 1) // ncol
    grid = np.zeros((nr * (h + pad) + pad, ncol * (w + pad) + pad, c), np.float32)
    for i in range(n):
        r, cl = divmod(i, ncol)
        y0 = r * (h + pad) + pad
        x0 = cl * (w + pad) + pad
        grid[y0:y0 + h, x0:x0 + w] = images[i]
    return grid


def show_landmarks_batch(data, out: str = None):
    """Visualize a batch of images + masks as two grids
    (reference lib/common.py:25-36). Headless: saves to ``out`` if given."""
    import matplotlib
    if out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x, y = data
    grid_x = make_grid(np.asarray(x))
    grid_y = make_grid(np.asarray(y))
    f, (ax1, ax2) = plt.subplots(2, 1)
    ax1.imshow(np.squeeze(grid_x))
    ax2.imshow(np.squeeze(grid_y))
    plt.title("Batch from dataloader")
    if out:
        f.savefig(out, dpi=120)
        plt.close(f)
    else:
        plt.show()
    return f
