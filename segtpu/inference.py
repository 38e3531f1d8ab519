"""Whole-image and tiled prediction (reference inria_submit.py:217-257).

TPU-native redesign of the reference's per-tile host loop:

  * tiles are one (T, p, p, C) batch; D4 TTA is a batched device transform
    (x8); the model runs over fixed-size chunks under jit (one compile);
  * sigmoid, TTA inversion/averaging, and the pyramid-weighted overlap merge
    (scatter-add) all happen on device — the only host<->device transfers are
    the input image and the final mask.
"""

from __future__ import annotations

import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from segtpu.augment import (
    pad_to_multiple,
    tta_d4_aug_batch,
    tta_d4_deaug_batch,
    unpad,
)
from segtpu.tiles import ImageSlicer


def predict_full(image: np.ndarray, predict_fn: Callable, test_transform=None,
                 pad_size: int = 32, tta: bool = True) -> np.ndarray:
    """Whole-image prediction: pad to /32, D4 TTA, average
    (reference predict_full, inria_submit.py:217-234).

    ``predict_fn(x: (N,H,W,C)) -> (N,H,W,1) sigmoid probs`` — typically
    ``make_predict_step`` partially applied with a TrainState.
    """
    padded, pads = pad_to_multiple(image, pad_size)
    if tta and padded.shape[0] != padded.shape[1]:
        # batched D4 TTA needs a square canvas (rot90 views share one shape);
        # replicate-pad the short side up and fold the extra into `pads`
        side = max(padded.shape[0], padded.shape[1])
        eh, ew = side - padded.shape[0], side - padded.shape[1]
        extra = [(0, eh), (0, ew)] + [(0, 0)] * (padded.ndim - 2)
        padded = np.pad(padded, extra, mode="edge")
        pads = (pads[0], pads[1] + eh, pads[2], pads[3] + ew)
    if test_transform is not None:
        padded, _ = test_transform(padded, None)
    x = jnp.asarray(padded[None].astype(np.float32))
    if tta:
        x = tta_d4_aug_batch(x)
    y = predict_fn(x)
    if tta:
        y = tta_d4_deaug_batch(y)
    mask = np.asarray(y[0, ..., 0])
    return unpad(mask, pads)


def predict_tiled(image: np.ndarray, predict_fn: Callable, test_transform=None,
                  patch_size: int = 224, batch_size: int = 8,
                  tta: bool = True, weight: str = "pyramid",
                  mesh=None, slice_on_device: bool = True,
                  threshold: float = None) -> np.ndarray:
    """Sliding-window tiled prediction with weighted fusion + D4 TTA
    (reference predict_tiled, inria_submit.py:237-257: step = patch/2,
    pyramid weights).

    Device-resident end to end: the (reflect-padded) image transfers ONCE,
    tiles are gathered on-chip inside the compiled sweep (``lax.map`` over
    fixed-size chunks: dynamic-slice -> TTA expand -> model -> TTA inverse),
    the pyramid merge is a scatter-add, and only the fused mask returns — vs
    the reference's per-batch CPU<->GPU round trips (inria_submit.py:248-253)
    and vs shipping the (overlap-duplicated) tile batch.
    ``slice_on_device=False`` falls back to host slicing (native tileio).
    """
    if test_transform is not None:
        image, _ = test_transform(image, None)
    image = np.asarray(image, dtype=np.float32)
    if image.ndim == 2:
        image = image[..., None]

    slicer = ImageSlicer(image.shape, patch_size, patch_size // 2, weight=weight)
    n_tiles = len(slicer.crops)

    group = 8 if tta else 1
    chunk = max(1, batch_size // group) if tta else batch_size
    if mesh is not None:
        # tile-parallel over the mesh's data axis (SURVEY.md §2.8: tiles are
        # the sharded axis of the long-input analogue): round the chunk up to
        # a multiple of the axis size so each device owns an equal shard
        n_data = mesh.shape.get("data", 1)
        chunk = max(chunk, n_data)
        chunk += (-chunk) % n_data
    n_chunks = -(-n_tiles // chunk)
    pad = n_chunks * chunk - n_tiles

    if slice_on_device and mesh is None:
        # crops repeated for the padded tail (re-predicting a real tile is
        # cheaper than shipping zeros; its result is dropped before merge)
        ys = [c[1] for c in slicer.crops] + [slicer.crops[0][1]] * pad
        xs = [c[0] for c in slicer.crops] + [slicer.crops[0][0]] * pad
        padded = np.pad(
            image,
            [(slicer.margin_top, slicer.margin_bottom),
             (slicer.margin_left, slicer.margin_right), (0, 0)],
            mode="reflect",
        )
        preds = _run_tiles_gather(
            predict_fn, tta, jnp.asarray(padded),
            jnp.asarray(ys, jnp.int32), jnp.asarray(xs, jnp.int32),
            n_chunks, chunk, patch_size,
        )
    else:
        tiles = slicer.split_batch(image)  # (T, p, p, C)
        if pad:
            tiles = np.concatenate(
                [tiles, np.zeros((pad, *tiles.shape[1:]), tiles.dtype)]
            )
        device_tiles = jnp.asarray(tiles)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            device_tiles = jax.device_put(
                device_tiles, NamedSharding(mesh, P(None))
            )
            preds = _run_tiles_sharded(predict_fn, tta, device_tiles, n_chunks,
                                       chunk, mesh)
        else:
            preds = _run_tiles(predict_fn, tta, device_tiles, n_chunks, chunk)
    merged = slicer.merge_device(preds[:n_tiles])
    if threshold is not None:
        # threshold on device and fetch uint8 (4x less host transfer)
        mask = jax.jit(lambda m: ((m > threshold) * 255).astype(jnp.uint8))(merged)
        return np.asarray(mask)[..., 0]
    return np.asarray(merged)[..., 0]


@functools.partial(jax.jit, static_argnums=(0, 1, 5, 6, 7))
def _run_tiles_gather(predict_fn, tta: bool, padded, ys, xs,
                      n_chunks: int, chunk: int, patch: int):
    """On-device slicing variant: gather each chunk's tiles from the padded
    image with dynamic slices inside the scan."""
    c = padded.shape[-1]

    def cut(y, x):
        return jax.lax.dynamic_slice(padded, (y, x, 0), (patch, patch, c))

    def body(i):
        sel = jax.lax.dynamic_slice(ys, (i * chunk,), (chunk,))
        selx = jax.lax.dynamic_slice(xs, (i * chunk,), (chunk,))
        tiles = jax.vmap(cut)(sel, selx)
        x = tta_d4_aug_batch(tiles) if tta else tiles
        y = predict_fn(x)
        return tta_d4_deaug_batch(y) if tta else y

    out = jax.lax.map(body, jnp.arange(n_chunks))
    return out.reshape(n_chunks * chunk, *out.shape[2:])


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4))
def _run_tiles(predict_fn, tta: bool, tiles, n_chunks: int, chunk: int):
    chunks = tiles.reshape(n_chunks, chunk, *tiles.shape[1:])

    def body(c):
        x = tta_d4_aug_batch(c) if tta else c
        y = predict_fn(x)
        return tta_d4_deaug_batch(y) if tta else y

    out = jax.lax.map(body, chunks)
    return out.reshape(n_chunks * chunk, *out.shape[2:])


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4, 5))
def _run_tiles_sharded(predict_fn, tta: bool, tiles, n_chunks: int,
                       chunk: int, mesh):
    """Tile-parallel variant: each scanned chunk is sharded over the mesh's
    data axis, so every chip processes chunk/n_data tiles per step and XLA
    keeps the whole sweep collective-free (no cross-tile dependencies)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    chunks = tiles.reshape(n_chunks, chunk, *tiles.shape[1:])
    shard = NamedSharding(mesh, P(None, "data"))
    chunks = jax.lax.with_sharding_constraint(chunks, shard)

    def body(c):
        x = tta_d4_aug_batch(c) if tta else c
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data")))
        y = predict_fn(x)
        return tta_d4_deaug_batch(y) if tta else y

    out = jax.lax.map(body, chunks)
    return out.reshape(n_chunks * chunk, *out.shape[2:])
