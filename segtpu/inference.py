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


def _device_affine(test_transform):
    """(scale, mean, std) when ``test_transform`` is an affine image-only
    normalize chain (the submit CLI's ``Normalize(INRIA stats)`` path,
    reference inria_submit.py:286-288) or None/empty.

    When expressible, the normalize runs on device after a compact upload —
    a uint8 image transfers 4x fewer bytes through the host<->device link
    than pre-normalized float32 (the dominant non-compute cost of 5000^2
    tiled inference on this machine). Returns None when the transform has
    non-affine parts, which keeps the host path.
    """
    from segtpu.augment import host as aug

    if test_transform is None:
        chain = []
    elif isinstance(test_transform, aug.Sequential):
        chain = list(test_transform.transforms)
    else:
        chain = [test_transform]

    scale, mean, std = np.float32(1.0), np.float32(0.0), np.float32(1.0)
    seen = False
    for part in chain:
        if isinstance(part, aug.MaskOnly):
            continue  # no mask at inference time
        inner = part.trans if isinstance(part, aug.ImageOnly) else part
        if isinstance(inner, aug.NormalizeImage) and not seen:
            scale = np.float32(inner.scale)
            mean = np.asarray(inner.mean, np.float32)
            std = np.asarray(inner.std, np.float32)
            seen = True
            continue
        return None
    return scale, mean, std


def _compact_image(image: np.ndarray, affine):
    """Keep the smallest dtype that the device path can normalize: uint8
    uploads as-is (cast + affine happen on device, matching the host float32
    pipeline up to XLA's FMA contraction of the multiply-subtract)."""
    image = np.asarray(image)
    if affine is not None and image.dtype == np.uint8:
        return image
    return np.asarray(image, dtype=np.float32)


@functools.partial(jax.jit, static_argnums=(1,))
def _cast_affine(x, affine):
    """One whole-array device kernel: cast to float32 and apply
    ``(x*scale - mean)/std`` in the host op order (augment/host.py
    NormalizeImage); matches the host result to ~1ulp (XLA contracts the
    multiply-subtract into an FMA). Applied ONCE per image/tile-batch right
    after the compact upload — the downstream compute graph then sees the
    same float32 arrays as the host-transform path (keeping the image uint8
    inside the gather loop instead measured ~30% slower per dynamic-slice:
    the (32,128) int8 tiling relayouts every cut)."""
    x = x.astype(jnp.float32)
    if affine is None:
        return x
    scale, mean, std = affine
    return (x * np.float32(scale) - jnp.asarray(mean)) / jnp.asarray(std)


def _apply_affine(x: jnp.ndarray, affine) -> jnp.ndarray:
    if affine is None and x.dtype == jnp.float32:
        return x
    return _cast_affine(x, _hashable_affine(affine))


def _hashable_affine(affine):
    """jit-static form of (scale, mean, std): nested tuples of floats."""
    if affine is None:
        return None
    scale, mean, std = affine
    return (float(scale), tuple(np.ravel(mean).tolist()),
            tuple(np.ravel(std).tolist()))


def predict_full(image: np.ndarray, predict_fn: Callable, test_transform=None,
                 pad_size: int = 32, tta: bool = True) -> np.ndarray:
    """Whole-image prediction: pad to /32, D4 TTA, average
    (reference predict_full, inria_submit.py:217-234).

    ``predict_fn(x: (N,H,W,C)) -> (N,H,W,1) sigmoid probs`` — typically
    ``make_predict_step`` partially applied with a TrainState.
    """
    affine = _device_affine(test_transform)
    if affine is None and test_transform is not None:
        image, _ = test_transform(image, None)
    image = _compact_image(image, affine)
    padded, pads = pad_to_multiple(image, pad_size)
    if tta and padded.shape[0] != padded.shape[1]:
        # batched D4 TTA needs a square canvas (rot90 views share one shape);
        # replicate-pad the short side up and fold the extra into `pads`
        side = max(padded.shape[0], padded.shape[1])
        eh, ew = side - padded.shape[0], side - padded.shape[1]
        extra = [(0, eh), (0, ew)] + [(0, 0)] * (padded.ndim - 2)
        padded = np.pad(padded, extra, mode="edge")
        pads = (pads[0], pads[1] + eh, pads[2], pads[3] + ew)
    x = _apply_affine(jnp.asarray(padded[None]), affine)
    if tta:
        x = tta_d4_aug_batch(x)
    y = predict_fn(x)
    if tta:
        y = tta_d4_deaug_batch(y)
    mask = np.asarray(y[0, ..., 0])
    return unpad(mask, pads)


def _prep_tiled(image: np.ndarray, test_transform, patch_size: int,
                batch_size: int, tta: bool, weight: str, mesh,
                slice_on_device: bool):
    """Host half of predict_tiled: transform fallback, compact dtype,
    slicer geometry, reflect pad / tile split, and the device upload. Pure
    host CPU + one async transfer — safe to run in a prefetch thread while
    the device sweeps the previous image."""
    affine = _device_affine(test_transform)
    if affine is None and test_transform is not None:
        image, _ = test_transform(image, None)
    image = _compact_image(image, affine)
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
        data = (jnp.asarray(padded), jnp.asarray(ys, jnp.int32),
                jnp.asarray(xs, jnp.int32))
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
        data = (device_tiles,)
    return slicer, affine, data, n_tiles, n_chunks, chunk


def _dispatch_tiled(prep, predict_fn, patch_size: int, tta: bool, mesh,
                    slice_on_device: bool, threshold):
    """Device half of predict_tiled: enqueue the compiled sweep + merge and
    return the DEVICE mask without blocking (JAX dispatch is async — the
    caller decides when to fetch)."""
    slicer, affine, data, n_tiles, n_chunks, chunk = prep
    if slice_on_device and mesh is None:
        padded, ys, xs = data
        preds = _run_tiles_gather(
            predict_fn, tta, _apply_affine(padded, affine), ys, xs,
            n_chunks, chunk, patch_size,
        )
    else:
        device_tiles = _apply_affine(data[0], affine)
        if mesh is not None:
            preds = _run_tiles_sharded(predict_fn, tta, device_tiles, n_chunks,
                                       chunk, mesh)
        else:
            preds = _run_tiles(predict_fn, tta, device_tiles, n_chunks, chunk)
    merged = slicer.merge_device(preds[:n_tiles])
    if threshold is not None:
        # threshold on device and fetch uint8 (4x less host transfer)
        return jax.jit(
            lambda m: ((m > threshold) * 255).astype(jnp.uint8))(merged)
    return merged


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
    prep = _prep_tiled(image, test_transform, patch_size, batch_size, tta,
                       weight, mesh, slice_on_device)
    mask = _dispatch_tiled(prep, predict_fn, patch_size, tta, mesh,
                           slice_on_device, threshold)
    return np.asarray(mask)[..., 0]


def predict_tiled_stream(items, predict_fn, test_transform=None,
                         patch_size: int = 224, batch_size: int = 8,
                         tta: bool = True, weight: str = "pyramid",
                         mesh=None, slice_on_device: bool = True,
                         threshold: float = None, depth: int = 1):
    """Pipelined predict_tiled over many images: yields ``(key, mask)``.

    ``items`` is an iterable of ``(key, load_fn)`` where ``load_fn() ->
    HWC ndarray`` (read+decode). Three overlapped stages (vs the reference's
    strictly serial per-image loop, inria_submit.py:296-306):

      * a prefetch thread runs load + host prep (reflect pad / tile split)
        + the async upload for image i+1,
      * the main thread dispatches the compiled device sweep for image i
        (non-blocking — JAX enqueues),
      * up to ``depth`` device masks stay in flight; fetching mask i-1
        blocks only until ITS sweep retires, so the device transfer and the
        host-side decode of later images ride under the current sweep.

    Masks yield in input order. ``depth=0`` degenerates to the serial path.
    """
    import queue as _queue
    import threading

    items = list(items)
    if not items:
        return

    prepped = _queue.Queue(maxsize=max(1, depth + 1))
    errors = []

    def producer():
        try:
            for key, load_fn in items:
                image = load_fn()
                prep = _prep_tiled(image, test_transform, patch_size,
                                   batch_size, tta, weight, mesh,
                                   slice_on_device)
                prepped.put((key, prep))
        except BaseException as e:  # surfaced in the consumer
            errors.append(e)
            prepped.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    inflight = []
    try:
        for _ in range(len(items)):
            got = prepped.get()
            if got is None:
                raise errors[0]
            key, prep = got
            mask = _dispatch_tiled(prep, predict_fn, patch_size, tta, mesh,
                                   slice_on_device, threshold)
            inflight.append((key, mask))
            if len(inflight) > depth:
                k, m = inflight.pop(0)
                yield k, np.asarray(m)[..., 0]
        for k, m in inflight:
            yield k, np.asarray(m)[..., 0]
    finally:
        t.join(timeout=1.0)


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
