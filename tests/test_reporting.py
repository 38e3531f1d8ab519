"""Reporting tools e2e: experiment plots from CSVs, loss-shape plots,
batch visualizer."""

import os

import numpy as np
import pandas as pd
import pytest


def _write_history_csv(path):
    df = pd.DataFrame({
        "epoch": [0, 1, 2],
        "loss": [0.9, 0.5, 0.3],
        "val_loss": [0.8, 0.6, 0.4],
        "iou": [0.1, 0.3, 0.5],
        "accuracy": [0.6, 0.8, 0.9],
        "val_iou": [0.1, 0.25, 0.45],
        "val_accuracy": [0.55, 0.75, 0.85],
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    df.to_csv(path, index=False)


def test_plot_main_writes_figures(tmp_path):
    from segtpu.reporting import plot

    for exp in ["shapes_unet_64_rgb_bce", "shapes_zf_unet_64_rgb_bce"]:
        _write_history_csv(
            str(tmp_path / "experiments" / "shapes" / "bce" / exp / f"{exp}.csv")
        )
    out = tmp_path / "report"
    plot.main([
        "--experiments-dir", str(tmp_path / "experiments"),
        "--dataset", "shapes", "--loss", "bce", "--out", str(out),
    ])
    files = sorted(os.listdir(out))
    assert "all_loss.png" in files and "all_metric.png" in files
    assert "shapes_unet_64_rgb_bce.png" in files


def test_plot_main_errors_when_empty(tmp_path):
    from segtpu.reporting import plot

    with pytest.raises(SystemExit):
        plot.main(["--experiments-dir", str(tmp_path), "--dataset", "x",
                   "--loss", "y"])


def test_plot_loss_writes_shapes(tmp_path):
    from segtpu.reporting import plot_loss

    out = tmp_path / "shapes"
    plot_loss.main(["--out", str(out)])
    files = sorted(os.listdir(out))
    assert "binary_crossentropy.png" in files
    assert "smooth_jaccard_loss.png" in files
    assert len(files) == 4


def test_show_landmarks_batch(tmp_path):
    from segtpu.utils import show_landmarks_batch

    rng = np.random.RandomState(0)
    x = rng.rand(4, 16, 16, 3).astype(np.float32)
    y = rng.rand(4, 16, 16, 1).astype(np.float32)
    out = str(tmp_path / "batch.png")
    show_landmarks_batch((x, y), out=out)
    assert os.path.exists(out)
