#!/usr/bin/env python
"""LR range finder driver (the reference test.py:8-32 equivalent).

Sweeps LR exponentially from 1e-8, one step per LR, then plots smoothed
loss-vs-LR on a log axis to loss_plot.png.

    python test.py -m linknet34 -d shapes -l bce -o sgd -b 4 -p 128
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-g", "--grayscale", action="store_true")
    parser.add_argument("-m", "--model", required=True, type=str)
    parser.add_argument("-p", "--patch-size", type=int, default=224)
    parser.add_argument("-b", "--batch-size", type=int, default=1)
    parser.add_argument("-l", "--loss", type=str, default="bce")
    parser.add_argument("-o", "--optimizer", default="SGD")
    parser.add_argument("-d", "--dataset", type=str, required=True)
    parser.add_argument("-dd", "--data-dir", type=str, default="data")
    parser.add_argument("-w", "--workers", default=4, type=int)
    parser.add_argument("-mem", "--memory", action="store_true")
    parser.add_argument("--out", type=str, default="loss_plot.png")
    args = parser.parse_args()

    from segtpu.data import DataLoader, get_dataset
    from segtpu.lr_finder import find_optimal_lr, smooth_losses
    from segtpu.models import get_model
    from segtpu.ops import get_loss
    from segtpu.train.optim import get_optimizer
    from segtpu.train.state import create_train_state

    num_channels = 1 if args.grayscale else 3
    model = get_model(args.model, patch_size=args.patch_size,
                      num_channels=num_channels)
    tx = get_optimizer(args.optimizer, 1e-8)
    state = create_train_state(
        model, tx,
        (args.batch_size, args.patch_size, args.patch_size, num_channels),
    )

    trainset, _, _ = get_dataset(args.dataset, args.data_dir,
                                 grayscale=args.grayscale,
                                 patch_size=args.patch_size,
                                 keep_in_mem=args.memory)
    from segtpu.data.shapes import DeviceShapesSet
    if isinstance(trainset, DeviceShapesSet):
        loader = trainset.loader(args.batch_size)
    else:
        loader = DataLoader(trainset, batch_size=args.batch_size,
                            shuffle=True, workers=args.workers)

    lrs, losses = find_optimal_lr(state, get_loss(args.loss), loader)
    print("lrs   ", lrs)
    print("losses", losses)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    smoothed = smooth_losses(losses)
    plt.figure(figsize=(8, 5))
    plt.semilogx(lrs[: len(smoothed)], smoothed)
    plt.xlabel("learning rate")
    plt.ylabel("loss (smoothed)")
    plt.grid(True, which="both", alpha=0.3)
    plt.savefig(args.out, dpi=120)
    print("saved", args.out)


if __name__ == "__main__":
    main()
