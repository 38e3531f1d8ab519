"""Realistic-data accuracy A/B: the upstream torch reference vs segtpu.

Closes the BASELINE.json headline ("val IoU parity vs PyTorch ref") on a
realistic multi-instance vehicle: a deterministic nuclei-style fixture
(segtpu/data/nuclei_fixture.py) is driven end-to-end through BOTH
``/root/reference/torch_train.py`` (on CPU, via tools/ref_cpu_shim.py) and
``train.py`` (on the TPU), with

  * the same on-disk dataset and the reference's seed-1234 stratified
    patch split (reference lib/datasets/dsb2018.py:75),
  * identical initial weights (the torch model's freshly constructed
    state_dict transplanted into segtpu via ``--init-torch``),
  * the same registries' losses/optimizers/hypers and the same
    ``(batch_size * loss)`` gradient scaling,

then compares the per-epoch history CSVs (reference torch_train.py:419-431).
Residual divergence is the stochastic part only: augmentation/shuffle/dropout
RNG streams, which cannot be shared across frameworks.

Configs mirror BASELINE.json #1/#2: zf_unet+bce+sgd, linknet34+bce_jaccard+adam
(random-init encoder on BOTH sides — zero egress, see BASELINE.md caveat).

Usage:
  python tools/ab_nuclei.py --work /tmp/ab_nuclei --phase all
  # or phase by phase: init -> segtpu -> torch -> report
Results land in results/ab_nuclei/ (CSV per leg + comparison.md).
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
AB_SEED = 20260819

CONFIGS = [
    # (model, loss, optimizer, lr)  — BASELINE.json configs #1 and #2
    ("zf_unet", "bce", "sgd", "1e-3"),
    ("linknet34", "bce_jaccard", "adam", "1e-4"),
]


def _exp_name(model, loss, patch):
    return f"dsb2018_{model}_{patch}_rgb_{loss}"


def _csv_path(root, model, loss, patch):
    exp = _exp_name(model, loss, patch)
    return os.path.join(root, "experiments", "dsb2018", loss, exp, exp + ".csv")


def _common_flags(args, model, loss, opt, lr):
    return ["-m", model, "-d", "dsb2018", "-dd", args.data_dir,
            "-p", str(args.patch), "-b", str(args.batch), "-l", loss,
            "-o", opt, "-lr", lr, "-e", str(args.epochs)]


def phase_init(args):
    from segtpu.data.nuclei_fixture import write_fixture
    write_fixture(args.data_dir, n_images=args.images, seed=args.seed)
    print(f"fixture: {args.images} images at {args.data_dir}")
    # build each torch model once (epochs=0: no training) to dump its init
    for model, loss, opt, lr in CONFIGS:
        init = os.path.join(args.work, f"init_{model}.pth")
        env = dict(os.environ, AB_SEED=str(AB_SEED), AB_SAVE_INIT=init)
        cmd = [sys.executable, os.path.join(REPO, "tools", "ref_cpu_shim.py")]
        cmd += _common_flags(args, model, loss, opt, lr)[:-2] + ["-e", "0"]
        subprocess.run(cmd, cwd=os.path.join(args.work, "torch"), env=env,
                       check=True, capture_output=True)
        print("init saved:", init)


def phase_segtpu(args):
    for model, loss, opt, lr in CONFIGS:
        init = os.path.join(args.work, f"init_{model}.pth")
        cmd = [sys.executable, os.path.join(REPO, "train.py")]
        cmd += _common_flags(args, model, loss, opt, lr)
        cmd += ["--init-torch", init, "--no-tensorboard", "--light-logging"]
        print("segtpu:", " ".join(cmd), flush=True)
        subprocess.run(cmd, cwd=os.path.join(args.work, "segtpu"), check=True)


def phase_torch(args):
    for model, loss, opt, lr in CONFIGS:
        env = dict(os.environ, AB_SEED=str(AB_SEED))
        cmd = [sys.executable, os.path.join(REPO, "tools", "ref_cpu_shim.py")]
        cmd += _common_flags(args, model, loss, opt, lr)
        print("torch ref:", " ".join(cmd), flush=True)
        subprocess.run(cmd, cwd=os.path.join(args.work, "torch"), env=env,
                       check=True)


def phase_report(args):
    import pandas as pd

    os.makedirs(args.out, exist_ok=True)
    lines = [
        "# Nuclei-fixture A/B: torch reference (CPU) vs segtpu (TPU)",
        "",
        f"Fixture: {args.images} images (seed {args.seed}), patch "
        f"{args.patch}, batch {args.batch}, {args.epochs} epochs, identical "
        f"initial weights, seed-1234 stratified patch split shared via the "
        f"on-disk dataset. Regenerate: `python tools/ab_nuclei.py "
        f"--phase all`.",
        "",
    ]
    worst = {}
    for model, loss, opt, lr in CONFIGS:
        ref_csv = _csv_path(os.path.join(args.work, "torch"), model, loss, args.patch)
        seg_csv = _csv_path(os.path.join(args.work, "segtpu"), model, loss, args.patch)
        ref = pd.read_csv(ref_csv)
        seg = pd.read_csv(seg_csv)
        shutil.copy(ref_csv, os.path.join(args.out, f"torch_{model}.csv"))
        shutil.copy(seg_csv, os.path.join(args.out, f"segtpu_{model}.csv"))
        n = min(len(ref), len(seg))
        lines += [f"## {model} ({loss} + {opt}, lr {lr})", "",
                  "| epoch | val_iou torch | val_iou segtpu | diff | "
                  "val_loss torch | val_loss segtpu |",
                  "|---|---|---|---|---|---|"]
        diffs = []
        for i in range(n):
            d = seg.val_iou[i] - ref.val_iou[i]
            diffs.append(abs(d))
            lines.append(
                f"| {i} | {ref.val_iou[i]:.4f} | {seg.val_iou[i]:.4f} | "
                f"{d:+.4f} | {ref.val_loss[i]:.4f} | {seg.val_loss[i]:.4f} |")
        tail = max(diffs[n // 2:]) if n > 1 else diffs[0]
        final = seg.val_iou[n - 1] - ref.val_iou[n - 1]
        worst[model] = (tail, final)
        lines += ["",
                  f"max |Δval_iou| second half: **{tail:.4f}**; "
                  f"final-epoch Δ: **{final:+.4f}**", ""]
    report = os.path.join(args.out, "comparison.md")
    with open(report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print("report written to", report)
    return worst


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work", default="/tmp/ab_nuclei")
    p.add_argument("--out", default=os.path.join(REPO, "results", "ab_nuclei"))
    p.add_argument("--phase", default="all",
                   choices=["init", "segtpu", "torch", "report", "all"])
    p.add_argument("--images", type=int, default=48)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--patch", type=int, default=128)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=20260819)
    args = p.parse_args(argv)
    args.data_dir = os.path.join(args.work, "data", "dsb2018")

    for sub in ("torch", "segtpu"):
        os.makedirs(os.path.join(args.work, sub), exist_ok=True)

    phases = ([args.phase] if args.phase != "all"
              else ["init", "segtpu", "torch", "report"])
    for ph in phases:
        globals()["phase_" + ph](args)


if __name__ == "__main__":
    main()
