"""Cross-experiment loss/metric plots from history CSVs
(reference plot.py:10-89).

Reads the same CSV schema the harness writes
(epoch, loss, val_loss, iou, accuracy, val_iou, val_accuracy) and renders
per-experiment train/val curves plus cross-experiment comparisons. Headless:
figures are saved to files instead of plt.show().

    python -m segtpu.reporting.plot --experiments-dir experiments \
        --dataset dsb2018 --loss bce --out report/
"""

from __future__ import annotations

import argparse
import glob
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

try:
    import seaborn as sns
    sns.set()
except ImportError:
    pass


def plot_train_history(names, loss, val_loss, title=None,
                       legend_loc="upper right", out=None):
    """(reference plot.py:10-35)."""
    fig = plt.figure(figsize=(15, 8))
    if title is not None:
        fig.suptitle(title)
    ax1, ax2 = fig.subplots(1, 2)
    for m in loss:
        ax1.plot(m)
    ax1.set_ylabel("Value")
    ax1.set_xlabel("Epoch")
    ax1.set_title("Train")
    ax1.legend(names, loc=legend_loc)
    for m in val_loss:
        ax2.plot(m)
    ax2.set_ylabel("Value")
    ax2.set_xlabel("Epoch")
    ax2.set_title("Test")
    ax2.legend(names, loc=legend_loc)
    if out:
        fig.savefig(out, dpi=120)
        plt.close(fig)
    return fig


def plot_experiment_train_history(name, loss, val_loss, metric, val_metric,
                                  out=None):
    """(reference plot.py:38-61)."""
    fig = plt.figure(figsize=(15, 8))
    fig.suptitle(name)
    ax1, ax2 = fig.subplots(1, 2)
    ax1.plot(loss)
    ax1.plot(val_loss)
    ax1.set_ylabel("Value")
    ax1.set_xlabel("Epoch")
    ax1.set_title("Loss")
    ax1.legend(["Train", "Test"], loc="upper right")
    ax2.plot(metric)
    ax2.plot(val_metric)
    ax2.set_ylabel("Value")
    ax2.set_xlabel("Epoch")
    ax2.set_title("Score")
    ax2.legend(["Train", "Test"], loc="upper left")
    if out:
        fig.savefig(out, dpi=120)
        plt.close(fig)
    return fig


def discover_experiments(experiments_dir: str, dataset: str, loss: str):
    """Find every experiment CSV under experiments/<dataset>/<loss>/."""
    pattern = os.path.join(experiments_dir, dataset, loss, "*", "*.csv")
    out = {}
    for path in sorted(glob.glob(pattern)):
        name = os.path.splitext(os.path.basename(path))[0]
        out[name] = pd.read_csv(path)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiments-dir", default="experiments")
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--loss", required=True)
    parser.add_argument("--metric", default="iou")
    parser.add_argument("--out", default="report")
    args = parser.parse_args(argv)

    experiments = discover_experiments(args.experiments_dir, args.dataset, args.loss)
    if not experiments:
        raise SystemExit(
            f"no experiment CSVs under {args.experiments_dir}/{args.dataset}/{args.loss}"
        )
    os.makedirs(args.out, exist_ok=True)

    names, loss_l, val_loss_l, metric_l, val_metric_l = [], [], [], [], []
    for key, item in experiments.items():
        names.append(key)
        loss_l.append(item[["loss"]])
        val_loss_l.append(item[["val_loss"]])
        metric_l.append(item[[args.metric]])
        val_metric_l.append(item[["val_" + args.metric]])
        plot_experiment_train_history(
            key, item[["loss"]], item[["val_loss"]], item[[args.metric]],
            item[["val_" + args.metric]],
            out=os.path.join(args.out, f"{key}.png"),
        )

    plot_train_history(names, loss_l, val_loss_l,
                       f"{args.dataset}, {args.loss} loss",
                       out=os.path.join(args.out, "all_loss.png"))
    plot_train_history(names, metric_l, val_metric_l,
                       f"{args.dataset}, {args.metric} score",
                       legend_loc="lower right",
                       out=os.path.join(args.out, "all_metric.png"))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
