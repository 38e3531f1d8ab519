"""ImageSlicer tests: weight parity vs the reference formula (naive loop),
split->merge round-trip identity, device merge == host merge, D4 TTA
invertibility (SURVEY.md §4 b/c)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from segtpu import tiles
from segtpu.augment import (
    pad_to_multiple,
    tta_d4_aug,
    tta_d4_aug_batch,
    tta_d4_deaug,
    tta_d4_deaug_batch,
    unpad,
)


def naive_pyramid_weight(width, height):
    """Direct transcription of the published formula (O(n^2) loop oracle)."""
    xc, yc, xl, xr, yb, yt = width * .5, height * .5, 0, width, 0, height
    Dc = np.zeros((width, height))
    De = np.zeros((width, height))
    for i in range(width):
        for j in range(height):
            Dc[i, j] = math.hypot(i - xc + 0.5, j - yc + 0.5)
            cands = [
                math.hypot(i - xl + 0.5, 0.5),
                math.hypot(i - xr + 0.5, 0.5),
                math.hypot(0.5, j - yb + 0.5),
                math.hypot(0.5, j - yt + 0.5),
            ]
            De[i, j] = min(cands)
    frac = De / (Dc + De)
    alpha = (width * height) / frac.sum()
    return alpha * frac


def test_pyramid_weight_matches_naive():
    w, _, _ = tiles.compute_pyramid_weight(32, 32)
    expected = naive_pyramid_weight(32, 32)
    np.testing.assert_allclose(w, expected, rtol=1e-10)


@pytest.mark.parametrize("weight", ["mean", "pyramid"])
@pytest.mark.parametrize("shape,tile,step", [
    ((100, 100), 64, 32),
    ((97, 131), 64, 32),
    ((64, 64), 64, 64),
    ((200, 100, 3), 64, 48),
])
def test_split_merge_roundtrip_identity(shape, tile, step, weight):
    """merge(split(x)) == x — the reference's core invariant."""
    rng = np.random.RandomState(0)
    img = rng.rand(*shape).astype(np.float32)
    slicer = tiles.ImageSlicer(shape, tile, step, weight=weight)
    parts = slicer.split(img)
    merged = slicer.merge(parts)
    if img.ndim == 2:
        merged = merged[..., 0]
    np.testing.assert_allclose(merged, img, atol=1e-5)


def test_crop_count_and_shapes():
    slicer = tiles.ImageSlicer((100, 100), 64, 32)
    parts = slicer.split(np.zeros((100, 100, 3), np.float32))
    assert all(p.shape == (64, 64, 3) for p in parts)
    assert len(parts) == len(slicer.crops)
    batch = slicer.split_batch(np.zeros((100, 100, 3), np.float32))
    assert batch.shape == (len(slicer.crops), 64, 64, 3)


def test_cut_patch_matches_split():
    rng = np.random.RandomState(1)
    img = rng.rand(90, 110, 3).astype(np.float32)
    slicer = tiles.ImageSlicer(img.shape, 64, 32)
    parts = slicer.split(img)
    for idx in [0, len(parts) // 2, len(parts) - 1]:
        np.testing.assert_array_equal(slicer.cut_patch(img, idx), parts[idx])


@pytest.mark.parametrize("weight", ["mean", "pyramid"])
def test_device_merge_matches_host(weight):
    rng = np.random.RandomState(2)
    img = rng.rand(100, 100, 2).astype(np.float32)
    slicer = tiles.ImageSlicer(img.shape, 64, 32, weight=weight)
    parts = slicer.split(img)
    # simulate "predictions": arbitrary per-tile values
    preds = [p * 0.5 + 0.1 for p in parts]
    host = slicer.merge(preds)
    dev = np.asarray(slicer.merge_device(jnp.asarray(np.stack(preds))))
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_invalid_tile_step_raises():
    with pytest.raises(ValueError):
        tiles.ImageSlicer((100, 100), 64, 0)
    with pytest.raises(ValueError):
        tiles.ImageSlicer((100, 100), 64, 65)


def test_tta_d4_batch_roundtrip():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(3, 16, 16, 1).astype(np.float32))
    aug = tta_d4_aug_batch(x)
    assert aug.shape == (24, 16, 16, 1)
    rec = tta_d4_deaug_batch(aug)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-6)


def test_tta_d4_batch_matches_host_list():
    rng = np.random.RandomState(4)
    imgs = [rng.rand(8, 8, 1).astype(np.float32) for _ in range(2)]
    host = tta_d4_aug(imgs)
    dev = np.asarray(tta_d4_aug_batch(jnp.asarray(np.stack(imgs))))
    for i, h in enumerate(host):
        np.testing.assert_allclose(dev[i], h, atol=1e-6)
    host_back = tta_d4_deaug(host)
    dev_back = np.asarray(tta_d4_deaug_batch(jnp.asarray(np.stack(host))))
    for i, h in enumerate(host_back):
        np.testing.assert_allclose(dev_back[i], h, atol=1e-6)


def test_tta_deaug_asserts_multiple_of_8():
    with pytest.raises(AssertionError):
        tta_d4_deaug([np.zeros((4, 4))] * 7)


def test_pad_unpad_roundtrip():
    rng = np.random.RandomState(5)
    img = rng.rand(50, 70, 3).astype(np.float32)
    padded, pads = pad_to_multiple(img, 32)
    assert padded.shape[0] % 32 == 0 and padded.shape[1] % 32 == 0
    np.testing.assert_array_equal(unpad(padded, pads), img)
    same, pads0 = pad_to_multiple(np.zeros((64, 64)), 32)
    assert pads0 == (0, 0, 0, 0) and same.shape == (64, 64)


def test_merge_regular_equals_scatter():
    """The scatter-free regular-grid device merge matches the scatter-add
    path bit-for-bit in structure (same math, different schedule)."""
    import jax.numpy as jnp
    from segtpu.tiles import ImageSlicer, _merge_scatter

    rng = np.random.RandomState(3)
    for weight in ("mean", "pyramid"):
        s = ImageSlicer((100, 140), 32, 16, weight=weight)
        assert s.tile_size % s.tile_step == 0
        tiles = jnp.asarray(
            rng.rand(len(s.crops), 32, 32, 1).astype(np.float32))
        got = np.asarray(s.merge_device(tiles))  # regular path
        ys = jnp.asarray([c[1] for c in s.crops], jnp.int32)
        xs = jnp.asarray([c[0] for c in s.crops], jnp.int32)
        w = jnp.asarray(s.compute_weight(32), jnp.float32)[None, :, :, None]
        ref = np.asarray(_merge_scatter(
            tiles, ys, xs, w, s.target_shape[0], s.target_shape[1],
            s.margin_top, s.margin_left, s.image_height, s.image_width))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
