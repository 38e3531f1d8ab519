"""Tiled-inference / submission CLI (reference inria_submit.py:260-308).

Restores a checkpoint, runs full or tiled prediction with D4 TTA over every
image in ``<data-dir>/images``, thresholds at 0.5 and writes ``.tif`` masks
to ``submits/<experiment>/``.

    python submit.py -m linknet34 -c linknet34_checkpoint.ckpt -p 512 -b 16 -dd data/inria
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from segtpu.augment import host as aug
from segtpu.data.inria import INRIA_MEAN, INRIA_STD
from segtpu.inference import predict_full, predict_tiled_stream
from segtpu.models import get_model
from segtpu.train.checkpoint import restore_snapshot
from segtpu.train.optim import get_optimizer
from segtpu.train.state import create_train_state, make_predict_step
from segtpu.utils import auto_file, find_in_dir, read_rgb


def build_arg_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("-g", "--grayscale", action="store_true",
                        help="Whether to use grayscale image instead of RGB")
    parser.add_argument("-m", "--model", required=True, type=str,
                        help="Name of the model")
    parser.add_argument("-c", "--checkpoint", required=True, type=str,
                        help="Name of the model checkpoint (segtpu .ckpt dir, "
                             "or a torch reference .pth when it ends in .pth)")
    parser.add_argument("--encoder-weights", type=str, default=None,
                        help="Local torch .pth with torchvision-format "
                             "encoder weights (loaded before the checkpoint; "
                             "mainly useful with randomly-initialized "
                             "checkpoints)")
    parser.add_argument("-p", "--patch-size", type=int, default=224)
    parser.add_argument("-b", "--batch-size", type=int, default=1,
                        help="Batch Size during inference (default 1 matches "
                             "the reference CLI; 64 is the measured TPU "
                             "sweet spot for 512-tile sweeps, BASELINE.md)")
    parser.add_argument("-dd", "--data-dir", type=str, default="data",
                        help="Root directory where datasets are located.")
    parser.add_argument("-x", "--experiment", type=str,
                        help="Name of the experiment")
    parser.add_argument("-f", "--full", action="store_true")
    parser.add_argument("--no-tta", action="store_true")
    parser.add_argument("--submits-dir", type=str, default="submits")
    parser.add_argument("--tile-parallel", action="store_true",
                        help="Shard the tile batch over all devices "
                             "(data-parallel tiled inference)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 model compute for inference")
    parser.add_argument("--s2d", action="store_true",
                        help="Space-to-depth execution of the low-channel "
                             "high-res level (exact math; supported models "
                             "only — see segtpu.ops.s2d)")
    return parser


def main(argv=None):
    import cv2
    from tqdm import tqdm

    args = build_arg_parser().parse_args(argv)

    from segtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if args.experiment is None:
        args.experiment = "inria_%s_%d_%s" % (
            args.model, args.patch_size, "gray" if args.grayscale else "rgb"
        )

    experiment_dir = os.path.join(args.submits_dir, args.experiment)
    os.makedirs(experiment_dir, exist_ok=True)

    num_channels = 1 if args.grayscale else 3
    model = get_model(args.model, patch_size=args.patch_size,
                      num_channels=num_channels)
    if args.bf16 and hasattr(model, "dtype"):
        import dataclasses
        import jax.numpy as jnp
        model = dataclasses.replace(model, dtype=jnp.bfloat16)
    if args.s2d:
        if not hasattr(model, "s2d"):
            raise SystemExit(f"--s2d: model '{args.model}' has no s2d mode")
        import dataclasses
        model = dataclasses.replace(model, s2d=True)
    tx = get_optimizer("sgd", 1e-3)
    state = create_train_state(
        model, tx, (1, args.patch_size, args.patch_size, num_channels)
    )
    if args.encoder_weights:
        from segtpu.compat.encoder_weights import install_encoder_weights
        new_params, new_stats = install_encoder_weights(
            args.model, state.params, state.batch_stats, args.encoder_weights
        )
        state = state.replace(params=new_params, batch_stats=new_stats)
    ckpt_file = auto_file(args.checkpoint)
    if ckpt_file.endswith(".pth"):
        # a torch reference checkpoint (reference torch_train.py:308-316):
        # transplant the whole model, not just the encoder
        from segtpu.compat import import_torch_snapshot
        params, stats, meta = import_torch_snapshot(
            args.model, ckpt_file,
            {"params": state.params, "batch_stats": state.batch_stats},
        )
        state = state.replace(params=params, batch_stats=stats)
        print("Using torch checkpoint from epoch", meta.get("epoch"),
              meta.get("loss"))
    else:
        state, start_epoch, _, best_loss = restore_snapshot(
            state, ckpt_file, restore_opt=False
        )
        print("Using weights from epoch", start_epoch - 1, best_loss)

    test_transform = aug.Sequential([
        aug.ImageOnly(aug.NormalizeImage(mean=INRIA_MEAN, std=INRIA_STD)),
    ])

    predict_step = make_predict_step()
    predict_fn = lambda x: predict_step(state, x)

    mesh = None
    if args.tile_parallel:
        from segtpu.parallel import make_mesh, replicate
        mesh = make_mesh()
        state = replicate(state, mesh)

    images = sorted(find_in_dir(os.path.join(args.data_dir, "images")))
    if args.full:
        for test_fname in tqdm(images, total=len(images)):
            image = read_rgb(test_fname)
            basename = os.path.splitext(os.path.basename(test_fname))[0]
            mask = predict_full(image, predict_fn, test_transform,
                                tta=not args.no_tta)
            mask = ((mask > 0.5) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(experiment_dir, basename + ".tif"), mask)
        return

    # Pipelined tiled path: read/decode/pad/upload of image i+1 and the tif
    # write of image i-1 overlap the device sweep of image i (vs the
    # reference's strictly serial loop, inria_submit.py:296-306).
    from concurrent.futures import ThreadPoolExecutor

    def base(fname):
        return os.path.splitext(os.path.basename(fname))[0]

    items = [(base(f), (lambda f=f: read_rgb(f))) for f in images]
    writes = []
    with ThreadPoolExecutor(max_workers=2) as writer:
        stream = predict_tiled_stream(
            items, predict_fn, test_transform, args.patch_size,
            args.batch_size, tta=not args.no_tta, mesh=mesh, threshold=0.5)
        for basename, mask in tqdm(stream, total=len(images)):
            writes.append(writer.submit(
                cv2.imwrite,
                os.path.join(experiment_dir, basename + ".tif"), mask))
        for w in writes:
            w.result()  # surface IO errors


if __name__ == "__main__":
    main()
