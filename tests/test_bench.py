"""bench.py helper tests (the measurement itself runs on TPU via the driver)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_training_batch_synthetic_fallback():
    x, y = bench._training_batch(2, 64, data_dir=None)
    assert x.shape == (2, 64, 64, 3) and y.shape == (2, 64, 64, 1)


def test_training_batch_dsb_branch(tmp_path):
    cv2 = pytest.importorskip("cv2")
    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        img = (rng.rand(150, 150, 3) * 255).astype(np.uint8)
        m = np.zeros((150, 150), np.uint8)
        cv2.circle(m, (75, 75), 20 + i, 255, -1)
        cv2.imwrite(str(tmp_path / "images" / f"i{i}.png"), img)
        cv2.imwrite(str(tmp_path / "masks" / f"i{i}.png"), m)
    x, y = bench._training_batch(2, 64, data_dir=str(tmp_path))
    assert x.shape == (2, 64, 64, 3) and y.shape == (2, 64, 64, 1)
    assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}


@pytest.mark.slow
def test_measure_tpu_smoke_on_cpu():
    """The measurement loop itself runs (tiny config on the CPU backend)."""
    ips = bench.measure_tpu(batch_size=2, patch=32, steps=2, warmup=1,
                            model_name="unet", bf16=False)
    assert ips > 0


def test_bench_configs_cover_baseline():
    """--all reproduces every BASELINE.json config (VERDICT r1 item 6),
    plus the albunet config-#3 companion (round 4)."""
    assert len(bench.BENCH_CONFIGS) == 6
    kinds = [c["kind"] for c in bench.BENCH_CONFIGS.values()]
    assert kinds.count("tiled") == 1
    models = {c.get("model_name") for c in bench.BENCH_CONFIGS.values()}
    assert {"zf_unet", "linknet34", "unet11", "albunet", "tiramisu67"} <= models


@pytest.mark.slow
def test_measure_tpu_freeze_encoder_smoke():
    """Config #3's frozen-encoder path builds the mask and steps."""
    ips = bench.measure_tpu(batch_size=2, patch=32, steps=2, warmup=1,
                            model_name="unet11", bf16=False,
                            optimizer="adam", freeze_encoder=True)
    assert ips > 0


@pytest.mark.slow
def test_measure_tiled_inference_smoke():
    """Config #5's tiled-inference measurement on a small image."""
    secs = bench.measure_tiled_inference(patch=32, image_size=96,
                                         batch_size=8, model_name="unet",
                                         bf16=False)
    assert secs > 0
