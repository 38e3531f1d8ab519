"""Native tile I/O core: parity with the NumPy reference paths."""

import numpy as np
import pytest

from segtpu import native
from segtpu.tiles import ImageSlicer

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native tileio not built"
)


@pytest.mark.parametrize("dtype", [np.float32, np.uint8])
@pytest.mark.parametrize("shape,tile,step", [
    ((100, 100, 3), 64, 32),
    ((97, 131, 1), 64, 32),
    ((64, 64, 3), 64, 64),
])
def test_native_extract_matches_python_split(dtype, shape, tile, step):
    rng = np.random.RandomState(0)
    img = (rng.rand(*shape) * 255).astype(dtype)
    slicer = ImageSlicer(shape, tile, step)
    py_tiles = np.stack(slicer.split(img))
    nat = native.extract_tiles(
        img, [c[0] for c in slicer.crops], [c[1] for c in slicer.crops],
        tile, slicer.margin_top, slicer.margin_left,
    )
    assert nat is not None
    np.testing.assert_array_equal(nat, py_tiles)


def test_native_merge_matches_python_merge():
    rng = np.random.RandomState(1)
    img = rng.rand(100, 120, 2).astype(np.float32)
    slicer = ImageSlicer(img.shape, 64, 32, weight="pyramid")
    tiles = [t * 0.3 + 0.2 for t in slicer.split(img)]

    # python reference accumulation
    w = slicer.compute_weight(64)
    target = (*slicer.target_shape, 2)
    acc = np.zeros(target, np.float64)
    norm = np.zeros(target, np.float64)
    w3 = np.repeat(np.asarray(w)[:, :, None], 2, axis=2)
    for tile, (x, y, tw, th) in zip(tiles, slicer.crops):
        acc[y:y + th, x:x + tw] += tile * w3
        norm[y:y + th, x:x + tw] += w3

    nat = native.merge_tiles(
        np.stack(tiles), [c[0] for c in slicer.crops],
        [c[1] for c in slicer.crops], w, target[0], target[1],
    )
    assert nat is not None
    np.testing.assert_allclose(nat[0], acc, rtol=1e-12)
    np.testing.assert_allclose(nat[1], norm, rtol=1e-12)


def test_slicer_uses_native_and_stays_correct():
    """split_batch/merge keep the round-trip invariant on the native path."""
    rng = np.random.RandomState(2)
    img = rng.rand(150, 90, 3).astype(np.float32)
    slicer = ImageSlicer(img.shape, 64, 48, weight="pyramid")
    batch = slicer.split_batch(img)
    merged = slicer.merge(list(batch))
    np.testing.assert_allclose(merged, img, atol=1e-5)
