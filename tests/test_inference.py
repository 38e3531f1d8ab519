"""Tiled/full inference tests: identity round-trips, TTA equivariance, and
the submit CLI end-to-end on a tiny synthetic INRIA-style dataset."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from segtpu.inference import predict_full, predict_tiled


def _identity_predict(x):
    """A 'model' that returns the mean channel as its sigmoid output."""
    return jnp.mean(x, axis=-1, keepdims=True)


def test_predict_tiled_identity_roundtrip():
    rng = np.random.RandomState(0)
    image = rng.rand(100, 140, 3).astype(np.float32)
    out = predict_tiled(image, _identity_predict, patch_size=64, batch_size=8,
                        tta=True)
    assert out.shape == (100, 140)
    np.testing.assert_allclose(out, image.mean(-1), atol=1e-4)


def test_predict_tiled_no_tta_and_mean_weight():
    rng = np.random.RandomState(1)
    image = rng.rand(96, 96, 3).astype(np.float32)
    out = predict_tiled(image, _identity_predict, patch_size=64, batch_size=4,
                        tta=False, weight="mean")
    np.testing.assert_allclose(out, image.mean(-1), atol=1e-4)


def test_predict_full_identity():
    rng = np.random.RandomState(2)
    image = rng.rand(50, 70, 3).astype(np.float32)
    out = predict_full(image, _identity_predict)
    assert out.shape == (50, 70)
    np.testing.assert_allclose(out, image.mean(-1), atol=1e-4)


def test_predict_tiled_d4_equivariance():
    """A D4-equivariant predictor => TTA output == no-TTA output."""
    rng = np.random.RandomState(3)
    image = rng.rand(64, 64, 3).astype(np.float32)
    a = predict_tiled(image, _identity_predict, patch_size=64, batch_size=8, tta=True)
    b = predict_tiled(image, _identity_predict, patch_size=64, batch_size=1, tta=False)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_predict_tiled_stream_matches_per_image():
    """The pipelined multi-image stream yields, in order, exactly the
    per-image predict_tiled masks (different shapes + a threshold leg)."""
    from segtpu.inference import predict_tiled_stream

    rng = np.random.RandomState(7)
    images = [rng.rand(100, 140, 3).astype(np.float32),
              rng.rand(96, 96, 3).astype(np.float32),
              rng.rand(64, 130, 3).astype(np.float32)]
    items = [(f"im{i}", (lambda im=im: im)) for i, im in enumerate(images)]

    for threshold in (None, 0.5):
        got = list(predict_tiled_stream(
            items, _identity_predict, patch_size=64, batch_size=8, tta=True,
            threshold=threshold, depth=1))
        assert [k for k, _ in got] == ["im0", "im1", "im2"]
        for (k, mask), im in zip(got, images):
            want = predict_tiled(im, _identity_predict, patch_size=64,
                                 batch_size=8, tta=True, threshold=threshold)
            np.testing.assert_array_equal(mask, want)


def test_predict_tiled_stream_propagates_load_errors():
    from segtpu.inference import predict_tiled_stream

    def boom():
        raise RuntimeError("decode failed")

    items = [("ok", lambda: np.zeros((64, 64, 3), np.float32)),
             ("bad", boom)]
    with pytest.raises(RuntimeError, match="decode failed"):
        list(predict_tiled_stream(items, _identity_predict, patch_size=64))


@pytest.mark.slow
def test_submit_cli_end_to_end(tmp_path):
    """Train 1 step -> checkpoint -> submit CLI writes thresholded .tif masks."""
    import cv2
    import jax

    from segtpu.models import get_model
    from segtpu.ops import get_loss
    from segtpu.train.checkpoint import save_snapshot
    from segtpu.train.optim import get_optimizer
    from segtpu.train.state import create_train_state
    from segtpu import submit_cli

    # tiny fake INRIA layout
    data_dir = tmp_path / "data"
    (data_dir / "images").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for name in ["austin1", "vienna2"]:
        img = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(data_dir / "images" / f"{name}.tif"), img)

    model = get_model("unet")
    tx = get_optimizer("sgd", 1e-2)
    state = create_train_state(model, tx, (1, 64, 64, 3))
    ckpt = tmp_path / "unet_checkpoint.ckpt"
    save_snapshot(state, 0.5, 0, {}, str(ckpt), args="test")

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        submit_cli.main([
            "-m", "unet", "-c", "unet_checkpoint.ckpt", "-p", "64", "-b", "8",
            "-dd", str(data_dir), "--submits-dir", str(tmp_path / "submits"),
        ])
        # same checkpoint through the s2d execution path -> same masks
        submit_cli.main([
            "-m", "unet", "-c", "unet_checkpoint.ckpt", "-p", "64", "-b", "8",
            "-dd", str(data_dir), "--s2d", "-x", "s2d_run",
            "--submits-dir", str(tmp_path / "submits"),
        ])
    finally:
        os.chdir(cwd)

    out_dir = tmp_path / "submits" / "inria_unet_64_rgb"
    outs = sorted(os.listdir(out_dir))
    assert outs == ["austin1.tif", "vienna2.tif"]
    mask = cv2.imread(str(out_dir / "austin1.tif"), cv2.IMREAD_GRAYSCALE)
    assert mask.shape == (96, 96)
    assert set(np.unique(mask)) <= {0, 255}
    s2d_mask = cv2.imread(str(tmp_path / "submits" / "s2d_run" / "austin1.tif"),
                          cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(s2d_mask, mask)


def test_predict_tiled_mesh_matches_single_device():
    """Tile-parallel inference over the 8-device mesh == single-device."""
    from segtpu.parallel import make_mesh

    rng = np.random.RandomState(5)
    image = rng.rand(100, 100, 3).astype(np.float32)
    single = predict_tiled(image, _identity_predict, patch_size=64,
                           batch_size=8, tta=True)
    mesh = make_mesh()
    sharded = predict_tiled(image, _identity_predict, patch_size=64,
                            batch_size=8, tta=True, mesh=mesh)
    np.testing.assert_allclose(sharded, single, atol=1e-5)
    np.testing.assert_allclose(sharded, image.mean(-1), atol=1e-4)


def test_uint8_device_normalize_matches_host_transform():
    """A uint8 image + affine Normalize transform takes the compact-upload
    path (uint8 to the device, cast+normalize on chip) and must match
    pre-normalizing on the host in float32 (up to XLA's FMA contraction of
    the multiply-subtract, ~1ulp)."""
    from segtpu.augment import host as aug
    from segtpu.inference import _device_affine

    transform = aug.Sequential([
        aug.ImageOnly(aug.NormalizeImage(mean=(0.4, 0.45, 0.5),
                                         std=(0.2, 0.25, 0.3))),
    ])
    assert _device_affine(transform) is not None
    # non-affine chains refuse the device path
    assert _device_affine(
        aug.Sequential([aug.ImageOnly(aug.CLAHE())])) is None

    rng = np.random.RandomState(7)
    image = (rng.rand(100, 140, 3) * 255).astype(np.uint8)
    host_norm, _ = transform(image.astype(np.float32), None)

    for tta in (True, False):
        compact = predict_tiled(image, _identity_predict, transform,
                                patch_size=64, batch_size=8, tta=tta)
        host = predict_tiled(host_norm, _identity_predict, None,
                             patch_size=64, batch_size=8, tta=tta)
        np.testing.assert_allclose(compact, host, atol=2e-6)

    full_compact = predict_full(image, _identity_predict, transform)
    full_host = predict_full(host_norm, _identity_predict, None)
    np.testing.assert_allclose(full_compact, full_host, atol=2e-6)


def test_device_slicing_matches_host_slicing():
    rng = np.random.RandomState(6)
    image = rng.rand(130, 90, 3).astype(np.float32)
    a = predict_tiled(image, _identity_predict, patch_size=64, batch_size=16,
                      tta=True, slice_on_device=True)
    b = predict_tiled(image, _identity_predict, patch_size=64, batch_size=16,
                      tta=True, slice_on_device=False)
    np.testing.assert_allclose(a, b, atol=1e-5)
