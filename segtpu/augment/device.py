"""Batched on-device augmentations (jit-compiled, jax.random-keyed, NHWC).

The TPU-first replacement for the reference's per-sample OpenCV transforms in
DataLoader worker processes (reference lib/augmentations.py + SURVEY.md §7):
whole batches are augmented on the accelerator in the same compiled program
region as the train step's input, so the host pipeline only loads/decodes.

Geometry uses a single fused affine warp (one gather pass) with reflect-101
border semantics, matching cv2.warpPerspective(..., BORDER_REFLECT_101) up to
interpolation order. Masks warp with the same grid.

Every op takes (key, images[, masks]) and draws per-sample parameters.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _split(key, n):
    return tuple(jax.random.split(key, n))


def _bernoulli(key, p, n):
    return jax.random.uniform(key, (n,)) < p


def _per_sample_where(flag, a, b):
    return jnp.where(flag[:, None, None, None], a, b)


# ---------------------------------------------------------------------------
# D4 geometric ops
# ---------------------------------------------------------------------------

def random_vertical_flip(key, x, m=None, prob: float = 0.5):
    """(reference aug:93-102)."""
    flag = _bernoulli(key, prob, x.shape[0])
    x = _per_sample_where(flag, jnp.flip(x, 1), x)
    if m is not None:
        m = _per_sample_where(flag, jnp.flip(m, 1), m)
    return x, m


def random_horizontal_flip(key, x, m=None, prob: float = 0.5):
    """(reference aug:105-114)."""
    flag = _bernoulli(key, prob, x.shape[0])
    x = _per_sample_where(flag, jnp.flip(x, 2), x)
    if m is not None:
        m = _per_sample_where(flag, jnp.flip(m, 2), m)
    return x, m


def random_transpose(key, x, m=None, prob: float = 0.5):
    """(reference aug:117-126; square images)."""
    flag = _bernoulli(key, prob, x.shape[0])
    x = _per_sample_where(flag, jnp.transpose(x, (0, 2, 1, 3)), x)
    if m is not None:
        m = _per_sample_where(flag, jnp.transpose(m, (0, 2, 1, 3)), m)
    return x, m


def random_rotate90(key, x, m=None, prob: float = 0.5):
    """Per-sample k in {0,1,2,3} (reference aug:129-139; square images)."""
    k1, k2 = _split(key, 2)
    fire = _bernoulli(k1, prob, x.shape[0])
    # reference uses randint(0, 4) inclusive -> 5 values, but rot90(4)==rot90(0)
    factor = jax.random.randint(k2, (x.shape[0],), 0, 5) % 4
    factor = jnp.where(fire, factor, 0)

    def rot_all(a):
        return jnp.stack([a, jnp.rot90(a, 1, (1, 2)), jnp.rot90(a, 2, (1, 2)),
                          jnp.rot90(a, 3, (1, 2))])

    rx = rot_all(x)
    x = jnp.take_along_axis(
        rx, factor[None, :, None, None, None], axis=0
    )[0]
    if m is not None:
        rm = rot_all(m)
        m = jnp.take_along_axis(
            rm, factor[None, :, None, None, None], axis=0
        )[0]
    return x, m


# ---------------------------------------------------------------------------
# Affine warp (rotation / shift / scale / SSR) with reflect-101 border
# ---------------------------------------------------------------------------

def _reflect101(coord, size):
    """Fold coordinates into [0, size-1] with reflect-101 semantics."""
    period = 2.0 * (size - 1.0)
    c = jnp.abs(coord) % period
    return jnp.where(c > size - 1.0, period - c, c)


def _bilinear_sample(img, ys, xs):
    """img (H,W,C); ys/xs (h,w) float coords -> (h,w,C)."""
    h, w = img.shape[0], img.shape[1]
    ys = _reflect101(ys, h)
    xs = _reflect101(xs, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    top = img[y0, x0] * (1 - wx) + img[y0, x1] * wx
    bot = img[y1, x0] * (1 - wx) + img[y1, x1] * wx
    return top * (1 - wy) + bot * wy


def affine_warp(img, matrix):
    """Warp one HWC image by the 2x3 *inverse* map (output->input coords)."""
    h, w = img.shape[0], img.shape[1]
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    xs = matrix[0, 0] * xx + matrix[0, 1] * yy + matrix[0, 2]
    ys = matrix[1, 0] * xx + matrix[1, 1] * yy + matrix[1, 2]
    return _bilinear_sample(img, ys, xs)


def _ssr_inverse_matrix(angle_deg, scale, dx, dy, width, height):
    """Inverse (output->input) affine for rotate(angle)+scale about center,
    then translate by (dx, dy) — cv2.getRotationMatrix2D-compatible."""
    a = angle_deg * math.pi / 180.0
    cos, sin = jnp.cos(a), jnp.sin(a)
    cx, cy = width * 0.5, height * 0.5
    # forward: p_out = R*s*(p - c) + c + t; inverse: p_in = R^T/s*(p_out - c - t) + c
    inv_s = 1.0 / scale
    m00 = cos * inv_s
    m01 = sin * inv_s
    m10 = -sin * inv_s
    m11 = cos * inv_s
    tx = cx - m00 * (cx + dx) - m01 * (cy + dy)
    ty = cy - m10 * (cx + dx) - m11 * (cy + dy)
    return jnp.array([[m00, m01, tx], [m10, m11, ty]])


def shift_scale_rotate(key, x, m=None, shift_limit: float = 0.0625,
                       scale_limit: float = 0.1, rotate_limit: float = 45.0,
                       prob: float = 0.5):
    """Batched SSR (reference aug:224-259): per-sample random angle/scale/
    shift, one fused warp. Mask warped with the same grid (linear interp,
    like the reference's warpPerspective on the mask)."""
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    k1, k2, k3, k4, k5 = _split(key, 5)
    fire = _bernoulli(k1, prob, n)
    angle = jax.random.uniform(k2, (n,), minval=-rotate_limit, maxval=rotate_limit)
    scale = jax.random.uniform(k3, (n,), minval=1 - scale_limit, maxval=1 + scale_limit)
    dx = jax.random.uniform(k4, (n,), minval=-shift_limit, maxval=shift_limit) * w
    dy = jax.random.uniform(k5, (n,), minval=-shift_limit, maxval=shift_limit) * h

    angle = jnp.where(fire, angle, 0.0)
    scale = jnp.where(fire, scale, 1.0)
    dx = jnp.where(fire, dx, 0.0)
    dy = jnp.where(fire, dy, 0.0)

    mats = jax.vmap(
        lambda a, s, tx, ty: _ssr_inverse_matrix(a, s, tx, ty, w, h)
    )(angle, scale, dx, dy)

    x = jax.vmap(affine_warp)(x, mats)
    if m is not None:
        m = jax.vmap(affine_warp)(m, mats)
    return x, m


def random_rotate(key, x, m=None, limit: float = 90.0, prob: float = 0.5):
    """(reference aug:142-161)."""
    return shift_scale_rotate(key, x, m, shift_limit=0.0, scale_limit=0.0,
                              rotate_limit=limit, prob=prob)


def random_shift(key, x, m=None, limit: float = 4.0, prob: float = 0.5):
    """(reference aug:164-187)."""
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    k1, k2, k3 = _split(key, 3)
    fire = _bernoulli(k1, prob, n)
    dx = jnp.round(jax.random.uniform(k2, (n,), minval=-limit, maxval=limit))
    dy = jnp.round(jax.random.uniform(k3, (n,), minval=-limit, maxval=limit))
    dx = jnp.where(fire, dx, 0.0)
    dy = jnp.where(fire, dy, 0.0)
    mats = jax.vmap(
        lambda tx, ty: _ssr_inverse_matrix(0.0, 1.0, tx, ty, w, h)
    )(dx, dy)
    x = jax.vmap(affine_warp)(x, mats)
    if m is not None:
        m = jax.vmap(affine_warp)(m, mats)
    return x, m


def random_crop(key, x, m, size: int):
    """Per-sample random crop to (size, size) (reference aug:283-344)."""
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    k1, k2 = _split(key, 2)
    i = jax.random.randint(k1, (n,), 0, h - size + 1)
    j = jax.random.randint(k2, (n,), 0, w - size + 1)

    def crop(img, ii, jj):
        return jax.lax.dynamic_slice(
            img, (ii, jj, 0), (size, size, img.shape[-1])
        )

    x = jax.vmap(crop)(x, i, j)
    if m is not None:
        m = jax.vmap(crop)(m, i, j)
    return x, m


def center_crop(x, m, size: int):
    """(reference aug:262-280)."""
    h, w = x.shape[1], x.shape[2]
    dy, dx = (h - size) // 2, (w - size) // 2
    x = x[:, dy:dy + size, dx:dx + size]
    if m is not None:
        m = m[:, dy:dy + size, dx:dx + size]
    return x, m


# ---------------------------------------------------------------------------
# Photometric (image-only)
# ---------------------------------------------------------------------------

def random_brightness(key, x, limit: float = 0.1, prob: float = 0.5):
    """alpha-scale, clipped to the image's own max (reference aug:380-392)."""
    n = x.shape[0]
    k1, k2 = _split(key, 2)
    fire = _bernoulli(k1, prob, n)
    alpha = 1.0 + limit * jax.random.uniform(k2, (n,), minval=-1, maxval=1)
    alpha = jnp.where(fire, alpha, 1.0)[:, None, None, None]
    maxval = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    return jnp.clip(alpha * x, 0, maxval)


def random_contrast(key, x, limit: float = 0.1, prob: float = 0.5):
    """(reference aug:395-409): blend with the gray mean."""
    n = x.shape[0]
    k1, k2 = _split(key, 2)
    fire = _bernoulli(k1, prob, n)
    alpha = 1.0 + limit * jax.random.uniform(k2, (n,), minval=-1, maxval=1)
    alpha = jnp.where(fire, alpha, 1.0)[:, None, None, None]
    gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
    # the reference adds the scalar 3*(1-alpha)*mean(gray) (aug:402-405)
    gray_mean = 3.0 * jnp.mean(gray, axis=(1, 2))[:, None, None, None]
    maxval = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    return jnp.clip(alpha * x + (1.0 - alpha) * gray_mean, 0, maxval)


def random_saturation(key, x, limit: float = 0.3, prob: float = 0.5):
    """(reference aug:412-427): blend with per-pixel gray."""
    n = x.shape[0]
    k1, k2 = _split(key, 2)
    fire = _bernoulli(k1, prob, n)
    alpha = 1.0 + jax.random.uniform(k2, (n,), minval=-limit, maxval=limit)
    alpha = jnp.where(fire, alpha, 1.0)[:, None, None, None]
    gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]
    maxval = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    return jnp.clip(alpha * x + (1.0 - alpha) * gray, 0, maxval)


def random_grayscale(key, x, prob: float = 0.5):
    """(reference aug:65-73)."""
    n = x.shape[0]
    fire = _bernoulli(key, prob, n)
    gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]
    gray3 = jnp.broadcast_to(gray, x.shape)
    return _per_sample_where(fire, gray3, x)


def normalize(x, scale: float = 1.0 / 255.0,
              mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    """(reference aug:452-460)."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x * scale - mean) / std


def make_binary(m):
    """(reference aug:86-90)."""
    return (m > 0).astype(m.dtype)


# ---------------------------------------------------------------------------
# Prebuilt pipelines (jitted once, keyed per step)
# ---------------------------------------------------------------------------

def shapes_train_pipeline(key, x, m):
    """Device equivalent of the SHAPES train transform
    (shapes.py:48: ImageOnly(NormalizeImage) only)."""
    return normalize(x), m


def eval_normalize(x, m, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    """Deterministic eval-side normalize (for raw loaders)."""
    return normalize(x, mean=mean, std=std), m


def dsb2018_train_pipeline(key, x, m):
    """Device equivalent of the reference DSB2018Sliced train transform
    (dsb2018.py:76-84): normalize -> rot90 -> vflip -> hflip -> SSR(15) ->
    binarize. Input: raw uint8-range float images."""
    k = jax.random.split(key, 4)
    x = normalize(x)
    x, m = random_rotate90(k[0], x, m)
    x, m = random_vertical_flip(k[1], x, m)
    x, m = random_horizontal_flip(k[2], x, m)
    x, m = shift_scale_rotate(k[3], x, m, rotate_limit=15.0)
    m = make_binary(m)
    return x, m


def get_device_pipelines(dataset_name: str):
    """(train_fn(key,x,m), eval_fn(x,m)) for a dataset whose loaders yield
    RAW pixels, or None when the dataset has no device pipeline."""
    name = dataset_name.lower()
    if name == "shapes":
        return shapes_train_pipeline, lambda x, m: (normalize(x), m)
    if name == "dsb2018":
        return dsb2018_train_pipeline, lambda x, m: (normalize(x), make_binary(m))
    if name.startswith("inria"):
        from segtpu.data.inria import INRIA_MEAN, INRIA_STD
        return (
            inria_train_pipeline,
            lambda x, m: (normalize(x, mean=INRIA_MEAN, std=INRIA_STD),
                          make_binary(m)),
        )
    return None


def inria_train_pipeline(key, x, m, grayscale: bool = False):
    """Device equivalent of the INRIA train transform (Inria.py:48-57)."""
    from segtpu.data.inria import INRIA_MEAN, INRIA_STD

    k = jax.random.split(key, 6)
    x = random_grayscale(k[0], x, prob=1.0 if grayscale else 0.5)
    x = random_brightness(k[1], x)
    x = random_contrast(k[2], x)
    x, m = random_vertical_flip(k[3], x, m)
    x, m = random_horizontal_flip(k[4], x, m)
    x, m = shift_scale_rotate(k[5], x, m, rotate_limit=15.0)
    x = normalize(x, mean=INRIA_MEAN, std=INRIA_STD)
    m = make_binary(m)
    return x, m
