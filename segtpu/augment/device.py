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


def random_invert(key, x, prob: float = 0.5):
    """img.max() - img (reference aug:76-83)."""
    fire = _bernoulli(key, prob, x.shape[0])
    maxval = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    return _per_sample_where(fire, maxval - x, x)


def random_filter(key, x, limit: float = 0.5, prob: float = 0.5):
    """Blur/sharpen blend (reference aug:351-371): alpha * filter2D(img,
    ones(3,3)/9 * 0.2) + (1 - alpha) * img, clipped to the image max.
    cv2.filter2D's default border is reflect-101."""
    n = x.shape[0]
    k1, k2 = _split(key, 2)
    fire = _bernoulli(k1, prob, n)
    alpha = limit * jax.random.uniform(k2, (n,))
    alpha = jnp.where(fire, alpha, 0.0)[:, None, None, None]

    c = x.shape[-1]
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    kernel = jnp.full((3, 3, 1, 1), (1.0 / 9.0) * 0.2, x.dtype)
    kernel = jnp.tile(kernel, (1, 1, 1, c))
    blurred = jax.lax.conv_general_dilated(
        pad, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    maxval = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    return jnp.clip(alpha * blurred + (1.0 - alpha) * x, 0, maxval)


def shift_scale(key, x, m=None, limit: int = 4, prob: float = 0.25):
    """Reflect-pad by ``limit``, crop a random square of side
    size ~ U(size0, size0 + 2*limit) at a random offset, resize back
    (reference aug:190-221) — expressed as one fused affine warp:
    out(u, v) = in(u * s + dy - limit, v * s + dx - limit), s = size/size0."""
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    size0 = float(w)
    size1 = size0 + 2 * limit
    k1, k2, k3, k4 = _split(key, 4)
    fire = _bernoulli(k1, prob, n)
    size = jnp.round(jax.random.uniform(k2, (n,), minval=size0, maxval=size1))
    dx = jnp.round(jax.random.uniform(k3, (n,)) * (size1 - size))
    dy = jnp.round(jax.random.uniform(k4, (n,)) * (size1 - size))
    s = jnp.where(fire, size / size0, 1.0)
    dx = jnp.where(fire, dx - limit, 0.0)
    dy = jnp.where(fire, dy - limit, 0.0)

    zeros = jnp.zeros_like(s)
    mats = jnp.stack([
        jnp.stack([s, zeros, dx], -1),
        jnp.stack([zeros, s, dy], -1),
    ], -2)
    x = jax.vmap(affine_warp)(x, mats)
    if m is not None:
        m = jax.vmap(affine_warp)(m, mats)
    return x, m


def _rgb_to_hsv_cv2(x):
    """RGB (0-255 float) -> cv2-convention HSV: H in [0, 180), S/V in [0, 255]."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    s = jnp.where(v > 0, diff / jnp.where(v > 0, v, 1.0) * 255.0, 0.0)
    h = jnp.where(
        v == r, 60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                  240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(diff > 0, h, 0.0)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0  # cv2 8-bit convention
    return h, s, v


def _hsv_to_rgb_cv2(h, s, v):
    h = h * 2.0  # back to degrees
    s = s / 255.0
    c = v * s
    hp = h / 60.0
    xcomp = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    m = v - c
    zeros = jnp.zeros_like(c)
    idx = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [c, xcomp, zeros, zeros, xcomp, c])
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [xcomp, c, c, xcomp, zeros, zeros])
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [zeros, zeros, xcomp, c, c, xcomp])
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def random_hsv_shift(key, x, hue_shift_limit=(-10, 10),
                     sat_shift_limit=(-25, 25), val_shift_limit=(-25, 25),
                     prob: float = 0.5):
    """HSV channel shifts with saturating-add semantics
    (reference aug:430-449; cv2.add saturates at [0, 255], H wraps its
    8-bit-convention range)."""
    n = x.shape[0]
    k1, k2, k3, k4 = _split(key, 4)
    fire = _bernoulli(k1, prob, n)[:, None, None]
    dh = jax.random.uniform(k2, (n, 1, 1), minval=hue_shift_limit[0],
                            maxval=hue_shift_limit[1])
    ds = jax.random.uniform(k3, (n, 1, 1), minval=sat_shift_limit[0],
                            maxval=sat_shift_limit[1])
    dv = jax.random.uniform(k4, (n, 1, 1), minval=val_shift_limit[0],
                            maxval=val_shift_limit[1])
    h, s, v = _rgb_to_hsv_cv2(x)
    h = jnp.clip(h + jnp.where(fire, dh, 0.0), 0.0, 180.0)
    s = jnp.clip(s + jnp.where(fire, ds, 0.0), 0.0, 255.0)
    v = jnp.clip(v + jnp.where(fire, dv, 0.0), 0.0, 255.0)
    return _hsv_to_rgb_cv2(h, s, v)


def clahe(x, clip_limit: float = 2.0, grid: int = 8):
    """Contrast-limited adaptive histogram equalization on the luma channel
    (reference aug:463-475: cv2 CLAHE on YUV's Y).

    Device formulation: per-tile 256-bin histograms via scatter-add, excess
    clipped and redistributed uniformly, per-tile CDF LUTs, bilinear
    interpolation of the four surrounding tile LUTs per pixel — the cv2
    algorithm expressed batched; differs from cv2 only at uint8
    rounding/interp-order level. Images are 0-255 floats; H and W must be
    divisible by ``grid``.
    """
    n, h, w, _ = x.shape
    th, tw = h // grid, w // grid
    tile_px = th * tw
    nbins = 256

    # The reference feeds RGB-ordered pixels into cv2's BGR2YUV
    # (read_rgb -> CLAHE, common.py/aug:463), so its effective luma weights
    # are R/B-swapped: Y = 0.114 R + 0.587 G + 0.299 B. Reproduced as-is.
    y = 0.114 * x[..., 0] + 0.587 * x[..., 1] + 0.299 * x[..., 2]
    y8 = jnp.clip(jnp.round(y), 0, 255).astype(jnp.int32)

    tiles = y8.reshape(n, grid, th, grid, tw).transpose(0, 1, 3, 2, 4)
    tiles = tiles.reshape(n, grid * grid, tile_px)

    def hist_one(t):
        return jnp.zeros((nbins,), jnp.float32).at[t].add(1.0)

    hists = jax.vmap(jax.vmap(hist_one))(tiles)  # (n, tiles, 256)

    clip_at = jnp.maximum(jnp.floor(clip_limit * tile_px / nbins), 1.0)
    clipped = jnp.minimum(hists, clip_at)
    excess = (hists - clipped).sum(-1, keepdims=True)
    # cv2's integer redistribution: every bin gets excess // nbins; the
    # remaining (excess % nbins) counts go one each to bins 0, step, 2*step,
    # ... with step = nbins // residual — bit-exact with cv2's LUTs.
    redist = jnp.floor(excess / nbins)
    resid = excess - redist * nbins
    step = jnp.where(resid > 0,
                     jnp.floor(nbins / jnp.maximum(resid, 1.0)),
                     float(nbins + 1)).astype(jnp.int32)
    i = jnp.arange(nbins, dtype=jnp.int32)
    bonus = ((i % step == 0) & ((i // step).astype(jnp.float32) < resid)
             ).astype(jnp.float32)
    clipped = clipped + redist + bonus

    # cv2: lut[i] = round(cdf[i] * (nbins - 1) / tile_px) (cdf sums to
    # tile_px after redistribution; cvRound == round-half-even == jnp.round)
    cdf = jnp.cumsum(clipped, axis=-1)
    luts = jnp.clip(jnp.round(cdf * (nbins - 1.0) / tile_px), 0, 255)
    luts = luts.reshape(n, grid, grid, nbins)

    # bilinear interpolation between the 4 surrounding tile LUTs (cv2 border
    # tiles clamp to the edge mapping)
    # cv2 grid: txf = x / tile_w - 0.5 (no half-pixel offset)
    yy = jnp.arange(h, dtype=jnp.float32) / th - 0.5
    xx = jnp.arange(w, dtype=jnp.float32) / tw - 0.5
    # weights from the UNCLAMPED floor (cv2 clamps indices after computing
    # the weight, so border pixels blend a tile with itself)
    y0u = jnp.floor(yy).astype(jnp.int32)
    x0u = jnp.floor(xx).astype(jnp.int32)
    wy = (yy - y0u)[None, :, None]
    wx = (xx - x0u)[None, None, :]
    y0 = jnp.clip(y0u, 0, grid - 1)
    x0 = jnp.clip(x0u, 0, grid - 1)
    y1 = jnp.clip(y0u + 1, 0, grid - 1)
    x1 = jnp.clip(x0u + 1, 0, grid - 1)

    def apply_one(lut, y8_img):
        sub00 = lut[y0][:, x0]
        sub01 = lut[y0][:, x1]
        sub10 = lut[y1][:, x0]
        sub11 = lut[y1][:, x1]
        pick = lambda sub: jnp.take_along_axis(
            sub, y8_img[..., None], axis=-1)[..., 0]
        top = pick(sub00) * (1 - wx[0]) + pick(sub01) * wx[0]
        bot = pick(sub10) * (1 - wx[0]) + pick(sub11) * wx[0]
        return top * (1 - wy[0]) + bot * wy[0]

    new_y = jax.vmap(apply_one)(luts, y8)

    # put the equalized luma back: scale chroma-preserving (YUV U/V unchanged
    # == add the luma delta to each RGB channel)
    delta = (new_y - y)[..., None]
    return jnp.clip(x + delta, 0, 255)


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
