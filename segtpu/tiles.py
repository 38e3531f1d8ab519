"""Tiled inference engine (reference lib/tiles.py).

``ImageSlicer`` slices a huge image into overlapping tiles and merges tiled
predictions back with weighted fusion — the reference's spatial analogue of
sequence parallelism (SURVEY.md §2.8): 5000x5000 INRIA images that cannot fit
one model pass.

TPU-native redesign vs the reference's Python loops:
  * weight-matrix computation is vectorized NumPy (the reference's O(W*H)
    Python double loop, tiles.py:6-27, took seconds per tile size);
  * ``split`` gathers all tiles in one strided slice pass;
  * ``merge`` has two paths: exact NumPy parity (float64 accumulate, margin
    crop — tiles.py:137-161) and :func:`merge_device`, a jit-compiled XLA
    scatter-add over the tile batch axis for on-device fusion.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def compute_pyramid_weight(width: int, height: int):
    """Center-weighted fusion matrix W = alpha * De / (Dc + De)
    (reference compute_patch_weight_loss, tiles.py:6-27), vectorized.

    Indexing parity: the first axis is the reference's ``i`` (over width).
    """
    xc, yc = width * 0.5, height * 0.5
    i = np.arange(width, dtype=np.float64)[:, None]
    j = np.arange(height, dtype=np.float64)[None, :]

    dc = np.sqrt((i - xc + 0.5) ** 2 + (j - yc + 0.5) ** 2)
    de_l = np.sqrt((i + 0.5) ** 2 + 0.25)
    de_r = np.sqrt((i - width + 0.5) ** 2 + 0.25)
    de_b = np.sqrt(0.25 + (j + 0.5) ** 2)
    de_t = np.sqrt(0.25 + (j - height + 0.5) ** 2)
    de = np.minimum(np.minimum(de_l, de_r), np.minimum(de_b, de_t))

    frac = de / (dc + de)
    alpha = (width * height) / frac.sum()
    w = alpha * frac
    return w, dc, de


class ImageSlicer:
    """Slice an image into tiles and merge predictions back with fusion
    (reference ImageSlicer, tiles.py:30-168 — same constructor contract)."""

    def __init__(self, image_shape, tile_size: int, tile_step: int = 0,
                 image_margin: int = 0, weight: str = "mean"):
        self.image_height = image_shape[0]
        self.image_width = image_shape[1]
        self.tile_size = tile_size
        self.tile_step = tile_step

        weights = {"mean": self._mean, "pyramid": self._pyramid}
        self.weight_name = weight
        self.compute_weight = weights[weight]

        if tile_step < 1 or tile_step > tile_size:
            raise ValueError()

        overlap = tile_size - tile_step

        self.margin_left = self.margin_right = 0
        self.margin_top = self.margin_bottom = 0

        if image_margin == 0:
            nw = max(1, math.ceil((self.image_width - overlap) / tile_step))
            nh = max(1, math.ceil((self.image_height - overlap) / tile_step))

            extra_w = self.tile_step * nw - (self.image_width - overlap)
            extra_h = self.tile_step * nh - (self.image_height - overlap)

            self.margin_left = extra_w // 2
            self.margin_right = extra_w - self.margin_left
            self.margin_top = extra_h // 2
            self.margin_bottom = extra_h - self.margin_top
        else:
            if (self.image_width - overlap + 2 * image_margin) % tile_step != 0:
                raise ValueError()
            if (self.image_height - overlap + 2 * image_margin) % tile_step != 0:
                raise ValueError()
            self.margin_left = self.margin_right = image_margin
            self.margin_top = self.margin_bottom = image_margin

        self.crops: List[Tuple[int, int, int, int]] = []
        for y in range(0, self.image_height + self.margin_top + self.margin_bottom
                       - tile_size + 1, tile_step):
            for x in range(0, self.image_width + self.margin_left + self.margin_right
                           - tile_size + 1, tile_step):
                self.crops.append((x, y, tile_size, tile_size))

    # -- padding ------------------------------------------------------------

    def _pad(self, image: np.ndarray) -> np.ndarray:
        """Reflect-pad (BORDER_REFLECT101 == np.pad 'reflect')."""
        pads = [(self.margin_top, self.margin_bottom),
                (self.margin_left, self.margin_right)]
        if image.ndim == 3:
            pads.append((0, 0))
        return np.pad(image, pads, mode="reflect")

    # -- slicing ------------------------------------------------------------

    def split(self, image: np.ndarray) -> List[np.ndarray]:
        """Cut all tiles (reference split, tiles.py:98-117)."""
        assert image.shape[0] == self.image_height
        assert image.shape[1] == self.image_width
        padded = self._pad(image)
        tiles = []
        for x, y, tw, th in self.crops:
            tiles.append(np.ascontiguousarray(padded[y:y + th, x:x + tw]))
        return tiles

    def split_batch(self, image: np.ndarray) -> np.ndarray:
        """All tiles stacked as one (T, tile, tile, C) batch — the input to
        batched device inference. Uses the native threaded extractor
        (segtpu/native/tileio.cpp) when available: one pass, virtual
        reflect-101 borders, no padded intermediate copy."""
        if image.ndim == 2:
            image = image[..., None]
        from segtpu import native

        xs = [c[0] for c in self.crops]
        ys = [c[1] for c in self.crops]
        out = native.extract_tiles(image, xs, ys, self.tile_size,
                                   self.margin_top, self.margin_left)
        if out is not None:
            return out
        return np.stack(self.split(image))

    def cut_patch(self, image: np.ndarray, slice_index: int) -> np.ndarray:
        """Cut one tile lazily (reference cut_patch, tiles.py:119-135)."""
        assert image.shape[0] == self.image_height
        assert image.shape[1] == self.image_width
        padded = self._pad(image)
        x, y, tw, th = self.crops[slice_index]
        return np.ascontiguousarray(padded[y:y + th, x:x + tw])

    @property
    def target_shape(self):
        return (self.image_height + self.margin_bottom + self.margin_top,
                self.image_width + self.margin_right + self.margin_left)

    # -- merging ------------------------------------------------------------

    def merge(self, tiles: Sequence[np.ndarray], dtype=np.float32) -> np.ndarray:
        """Weighted-fusion merge, exact reference parity (tiles.py:137-161)."""
        if len(tiles) != len(self.crops):
            raise ValueError

        channels = 1 if tiles[0].ndim == 2 else tiles[0].shape[2]
        target = (*self.target_shape, channels)
        w = self.compute_weight(self.tile_size)

        from segtpu import native

        stacked = np.asarray(
            [t if t.ndim == 3 else t[..., None] for t in tiles], np.float32
        )
        merged = native.merge_tiles(
            stacked, [c[0] for c in self.crops], [c[1] for c in self.crops],
            w, target[0], target[1],
        )
        if merged is not None:
            image, norm = merged
        else:
            image = np.zeros(target, dtype=np.float64)
            norm = np.zeros(target, dtype=np.float64)
            w3 = np.repeat(np.asarray(w)[:, :, None], channels, axis=2)
            for tile, (x, y, tw, th) in zip(tiles, self.crops):
                t = tile if tile.ndim == 3 else tile[..., None]
                image[y:y + th, x:x + tw] += t * w3
                norm[y:y + th, x:x + tw] += w3

        norm = np.clip(norm, a_min=np.finfo(norm.dtype).eps, a_max=None)
        out = np.divide(image, norm).astype(dtype)
        return out[self.margin_top:self.image_height + self.margin_top,
                   self.margin_left:self.image_width + self.margin_left]

    def merge_device(self, tiles: jnp.ndarray) -> jnp.ndarray:
        """On-device merge of the tile batch (T, t, t, C).

        Equivalent to :meth:`merge` up to fp32 accumulation; stays on device
        so tiled inference never round-trips per tile.

        When the tile size is a multiple of the step (the standard
        half-overlap sweep), the crops form a regular grid and the merge is
        SCATTER-FREE: tiles split into (t/step)^2 groups of disjoint,
        abutting tiles, each group placed by pure reshape onto an offset
        canvas and summed — full-bandwidth adds instead of XLA's
        sort-and-loop scatter (trace: the scatter path cost ~4.2 s of the
        5000^2 INRIA sweep: 3.5 s `while` + 0.56 s index `sort`). The
        normalization map is data-independent and precomputed on host.
        """
        th, tw = self.tile_size, self.tile_size
        w = jnp.asarray(self.compute_weight(self.tile_size), jnp.float32)[None, :, :, None]
        ny, nx = self._grid_shape()
        if (self.tile_size % self.tile_step == 0
                and ny * nx == len(self.crops)):
            # the normalization map is data-independent and built INSIDE the
            # jit with the same scatter-free group placement (a host-side
            # float64 accumulation loop here measured 2-20+ s/image under
            # host load, plus a ~100 MB upload — pure overhead per image)
            return _merge_regular(
                tiles.astype(jnp.float32), w,
                ny, nx, self.tile_size, self.tile_step,
                self.target_shape[0], self.target_shape[1],
                self.margin_top, self.margin_left,
                self.image_height, self.image_width,
            )
        ys = jnp.asarray([c[1] for c in self.crops], jnp.int32)
        xs = jnp.asarray([c[0] for c in self.crops], jnp.int32)
        return _merge_scatter(
            tiles.astype(jnp.float32), ys, xs, w,
            self.target_shape[0], self.target_shape[1],
            self.margin_top, self.margin_left,
            self.image_height, self.image_width,
        )

    def _grid_shape(self):
        """(ny, nx) of the regular crop grid (crops are y-outer row-major)."""
        xs = {c[0] for c in self.crops}
        ys = {c[1] for c in self.crops}
        return len(ys), len(xs)

    def _mean(self, tile_size: int) -> np.ndarray:
        return np.ones((tile_size, tile_size), dtype=np.float32)

    def _pyramid(self, tile_size: int) -> np.ndarray:
        w, _, _ = compute_pyramid_weight(tile_size, tile_size)
        return w.astype(np.float64)


import functools


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
def _merge_regular(tiles, w, ny, nx, t, step, H, W,
                   m_top, m_left, img_h, img_w):
    """Scatter-free merge for a regular grid (y-outer row-major crops at
    multiples of ``step``; ``r = t // step`` groups per axis). The
    weight-normalization canvas is accumulated the same way on device
    (data-independent; XLA folds much of it) instead of on host."""
    r = t // step
    c = tiles.shape[-1]
    wt = tiles * w
    view = wt.reshape(ny, nx, t, t, c)
    acc = jnp.zeros((H, W, c), jnp.float32)
    norm = jnp.zeros((H, W, 1), jnp.float32)
    for gy in range(r):
        my = len(range(gy, ny, r))
        for gx in range(r):
            mx = len(range(gx, nx, r))
            if my == 0 or mx == 0:
                continue
            sub = view[gy::r, gx::r]                      # (my, mx, t, t, c)
            canvas = sub.transpose(0, 2, 1, 3, 4).reshape(my * t, mx * t, c)
            oy, ox = gy * step, gx * step
            pad = ((oy, H - oy - my * t), (ox, W - ox - mx * t))
            acc = acc + jnp.pad(canvas, pad + ((0, 0),))
            wcanvas = jnp.tile(w[0], (my, mx, 1))
            norm = norm + jnp.pad(wcanvas, pad + ((0, 0),))
    out = acc[m_top:img_h + m_top, m_left:img_w + m_left]
    norm = norm[m_top:img_h + m_top, m_left:img_w + m_left]
    return out / jnp.maximum(norm, jnp.finfo(jnp.float32).eps)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def _merge_scatter(tiles, ys, xs, w, H, W, m_top, m_left, img_h, img_w):
    t = tiles.shape[1]
    c = tiles.shape[-1]
    acc = jnp.zeros((H, W, c), jnp.float32)
    norm = jnp.zeros((H, W, 1), jnp.float32)

    row = jnp.arange(t, dtype=jnp.int32)
    # (T, t) absolute rows / cols for each tile
    rr = ys[:, None] + row[None, :]
    cc = xs[:, None] + row[None, :]
    # scatter-add each tile's weighted values; index grids (T, t, t)
    ridx = jnp.broadcast_to(rr[:, :, None], (tiles.shape[0], t, t))
    cidx = jnp.broadcast_to(cc[:, None, :], (tiles.shape[0], t, t))
    acc = acc.at[ridx, cidx].add(tiles * w)
    norm = norm.at[ridx, cidx].add(jnp.broadcast_to(w, tiles[..., :1].shape))
    out = acc / jnp.maximum(norm, jnp.finfo(jnp.float32).eps)
    return out[m_top:img_h + m_top, m_left:img_w + m_left]
