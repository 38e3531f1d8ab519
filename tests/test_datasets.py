"""Dataset pipeline tests over synthetic on-disk fixtures: DSB2018 (sliced +
file-based), INRIA (tiled + sliced), loaders, split determinism."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from segtpu.data import get_dataset
from segtpu.data.common import ConcatDataset, TiledImagesDataset
from segtpu.data.dsb2018 import DSB2018, DSB2018Sliced
from segtpu.data.inria import INRIASliced, cut_dataset_in_patches


def _write_dsb(tmp_path, n=6, size=130):
    rng = np.random.RandomState(0)
    (tmp_path / "images").mkdir(parents=True, exist_ok=True)
    (tmp_path / "masks").mkdir(parents=True, exist_ok=True)
    for i in range(n):
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        mask = np.zeros((size, size), np.uint8)
        cv2.circle(mask, (size // 2, size // 2), 10 + i, 255, -1)
        cv2.imwrite(str(tmp_path / "images" / f"img{i:02d}.png"), img)
        cv2.imwrite(str(tmp_path / "masks" / f"img{i:02d}.png"), mask)
    return str(tmp_path)


def test_dsb2018_sliced_pipeline(tmp_path):
    root = _write_dsb(tmp_path)
    train, test, nc = DSB2018Sliced(root, grayscale=False, patch_size=64)
    assert nc == 1
    assert len(train) > 0 and len(test) > 0
    x, y = train[0]
    assert x.shape == (64, 64, 3) and y.shape == (64, 64, 1)
    assert x.dtype == np.float32
    assert set(np.unique(y)) <= {0.0, 1.0}
    # registry path
    train2, _, _ = get_dataset("dsb2018", root, False, 64)
    assert len(train2) == len(train)


def test_dsb2018_split_determinism(tmp_path):
    root = _write_dsb(tmp_path)
    t1, v1, _ = DSB2018Sliced(root, False, 64)
    t2, v2, _ = DSB2018Sliced(root, False, 64)
    assert len(t1) == len(t2) and len(v1) == len(v2)
    # same seed-1234 split -> same raw patches in the same order
    np.testing.assert_array_equal(t1.images[0], t2.images[0])


def test_dsb2018_filebased_crops(tmp_path):
    root = _write_dsb(tmp_path, size=100)
    train, test, _ = DSB2018(root, grayscale=False, patch_size=64)
    x, y = train[0]
    assert x.shape == (64, 64, 3)
    xv, yv = test[0]
    assert xv.shape == (64, 64, 3)


def _write_inria(tmp_path, n=4, size=120, names=None):
    rng = np.random.RandomState(1)
    (tmp_path / "images").mkdir(parents=True, exist_ok=True)
    (tmp_path / "gt").mkdir(parents=True, exist_ok=True)
    if names is None:
        names = ["austin1", "austin2", "vienna1", "vienna2"][:n]
    for name in names:
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        gt = ((rng.rand(size, size) > 0.7) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "images" / f"{name}.tif"), img)
        cv2.imwrite(str(tmp_path / "gt" / f"{name}.tif"), gt)
    return str(tmp_path)


def test_inria_tiled_dataset(tmp_path):
    root = _write_inria(tmp_path)
    from segtpu.data.inria import INRIA
    # target_shape must match actual image size for the test fixture
    from segtpu.data import inria as inria_mod
    train = TiledImagesDataset(
        [os.path.join(root, "images", "austin1.tif")],
        [os.path.join(root, "gt", "austin1.tif")],
        tile_size=64, target_shape=(120, 120),
        transform=inria_mod._test_transform(),
    )
    assert len(train) > 1
    x, y = train[0]
    assert x.shape == (64, 64, 3) and y.shape == (64, 64, 1)
    assert set(np.unique(y)) <= {0.0, 1.0}


def test_cut_dataset_in_patches_and_sliced(tmp_path, monkeypatch):
    # stratified split by geocode needs enough unique image ids for the 10%
    # test fraction to cover both locations
    names = [f"austin{i}" for i in range(1, 11)] + [f"vienna{i}" for i in range(1, 11)]
    root = _write_inria(tmp_path, size=120, names=names)
    out = str(tmp_path / "sliced")
    # patch the hard-coded 5000x5000 slicer shape via monkeypatching ImageSlicer?
    # simpler: call the slicing logic directly at this size
    from segtpu.tiles import ImageSlicer
    from segtpu.utils import find_in_dir, read_mask, read_rgb
    os.makedirs(os.path.join(out, "images"), exist_ok=True)
    os.makedirs(os.path.join(out, "gt"), exist_ok=True)
    slicer = ImageSlicer((120, 120), 64, 32)
    for image_fname, mask_fname in zip(
        sorted(find_in_dir(os.path.join(root, "images"))),
        sorted(find_in_dir(os.path.join(root, "gt"))),
    ):
        basename = os.path.splitext(os.path.basename(image_fname))[0]
        for index, patch in enumerate(slicer.split(read_rgb(image_fname))):
            cv2.imwrite(os.path.join(out, "images", f"{basename}_{index}.tif"), patch)
        for index, patch in enumerate(slicer.split(read_mask(mask_fname) * 255)):
            cv2.imwrite(os.path.join(out, "gt", f"{basename}_{index}.tif"), patch)

    train, test, nc = INRIASliced(out, grayscale=False)
    assert nc == 1
    assert len(train) > 0 and len(test) > 0
    x, y = test[0]
    assert x.shape[2] == 3 and y.shape[2] == 1
    # geocode-stratified: austin/vienna both present in train
    train_names = {os.path.basename(f)[:6] for f in train.images}
    assert len(train_names) == 2


def test_concat_dataset_indexing():
    class Fake:
        def __init__(self, vals):
            self.vals = vals
        def __len__(self):
            return len(self.vals)
        def __getitem__(self, i):
            return self.vals[i]

    cd = ConcatDataset([Fake([0, 1]), Fake([2]), Fake([3, 4, 5])])
    assert len(cd) == 6
    assert [cd[i] for i in range(6)] == [0, 1, 2, 3, 4, 5]


def test_shapes_device_registry_and_loader():
    """shapes-device: jit-generated batches, host-free pipeline; same split
    sizes/class count as the host `shapes` entry."""
    import jax.numpy as jnp

    from segtpu.data.shapes import DeviceShapesSet

    train, valid, nc = get_dataset("shapes-device", patch_size=32)
    assert nc == 1 and isinstance(train, DeviceShapesSet)
    assert len(train) == 1024 and len(valid) == 128
    assert train.num_channels == 3

    loader = train.take(8).loader(batch_size=4)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    x, y = batches[0]
    assert isinstance(x, jnp.ndarray) and x.shape == (4, 32, 32, 3)
    assert y.shape == (4, 32, 32, 1)
    assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}

    # train batches are fresh per epoch; the val split ignores the epoch
    loader.set_epoch(1)
    x1, _ = next(iter(loader))
    assert not np.allclose(np.asarray(x), np.asarray(x1))
    vloader = valid.take(8).loader(batch_size=4)
    v0 = np.asarray(next(iter(vloader))[0])
    vloader.set_epoch(3)
    assert np.array_equal(v0, np.asarray(next(iter(vloader))[0]))


def test_shapes_device_grayscale():
    """-g on shapes-device: luma-from-raw then gray normalization, matching
    the host ShapesDataset order."""
    train, _, _ = get_dataset("shapes-device", patch_size=32, grayscale=True)
    assert train.num_channels == 1
    x, y = next(iter(train.take(4).loader(batch_size=4)))
    assert x.shape == (4, 32, 32, 1) and y.shape == (4, 32, 32, 1)
    assert np.isfinite(np.asarray(x)).all()
