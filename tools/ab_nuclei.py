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


def _init_path(args, model, run_seed):
    return os.path.join(args.work, f"init_{model}_s{run_seed}.pth")


def _leg_complete(csv_path, epochs):
    """True iff a leg's history CSV exists AND holds all ``epochs`` rows.

    A leg killed mid-run leaves a truncated CSV; skipping on existence alone
    would silently reuse it and phase_report (n = min over legs) would then
    truncate EVERY seed's comparison — a partial run masquerading as a
    complete A/B. Incomplete CSVs are deleted so the leg reruns."""
    if not os.path.exists(csv_path):
        return False
    with open(csv_path) as f:
        rows = sum(1 for line in f if line.strip()) - 1  # minus header
    if rows >= epochs:
        return True
    print(f"incomplete leg ({rows}/{epochs} epochs), rerunning: {csv_path}")
    os.remove(csv_path)
    return False


def phase_init(args):
    """Fixture + one torch init dump per (config, run seed).

    Each A/B *pair* (torch seed S, segtpu seed S) shares the init that
    torch's own seeded construction produces under AB_SEED=S — so the
    torch seed-to-seed band spans init noise as well as the training RNG
    streams, i.e. honest run-to-run variance of the reference itself.
    """
    from segtpu.data.nuclei_fixture import write_fixture
    write_fixture(args.data_dir, n_images=args.images, seed=args.seed)
    print(f"fixture: {args.images} images at {args.data_dir}")
    for run_seed in args.run_seeds:
        for model, loss, opt, lr in CONFIGS:
            init = _init_path(args, model, run_seed)
            if os.path.exists(init):
                print("init exists:", init)
                continue
            env = dict(os.environ, AB_SEED=str(run_seed), AB_SAVE_INIT=init)
            cmd = [sys.executable,
                   os.path.join(REPO, "tools", "ref_cpu_shim.py")]
            cmd += _common_flags(args, model, loss, opt, lr)[:-2] + ["-e", "0"]
            subprocess.run(cmd, cwd=os.path.join(args.work, "torch"), env=env,
                           check=True, capture_output=True)
            print("init saved:", init)


def phase_segtpu(args):
    for run_seed in args.run_seeds:
        for model, loss, opt, lr in CONFIGS:
            cwd = os.path.join(args.work, f"segtpu_s{run_seed}")
            os.makedirs(cwd, exist_ok=True)
            if _leg_complete(_csv_path(cwd, model, loss, args.patch),
                             args.epochs):
                print(f"segtpu s{run_seed} {model}: complete csv, skipping")
                continue
            cmd = [sys.executable, os.path.join(REPO, "train.py")]
            cmd += _common_flags(args, model, loss, opt, lr)
            cmd += ["--init-torch", _init_path(args, model, run_seed),
                    "--seed", str(run_seed),
                    "--no-tensorboard", "--light-logging"]
            print("segtpu:", " ".join(cmd), flush=True)
            subprocess.run(cmd, cwd=cwd, check=True)


def phase_torch(args):
    for run_seed in args.run_seeds:
        for model, loss, opt, lr in CONFIGS:
            cwd = os.path.join(args.work, f"torch_s{run_seed}")
            os.makedirs(cwd, exist_ok=True)
            if _leg_complete(_csv_path(cwd, model, loss, args.patch),
                             args.epochs):
                print(f"torch s{run_seed} {model}: complete csv, skipping")
                continue
            env = dict(os.environ, AB_SEED=str(run_seed))
            cmd = [sys.executable,
                   os.path.join(REPO, "tools", "ref_cpu_shim.py")]
            cmd += _common_flags(args, model, loss, opt, lr)
            print(f"torch ref (seed {run_seed}):", " ".join(cmd), flush=True)
            subprocess.run(cmd, cwd=cwd, env=env, check=True)


def phase_report(args):
    import pandas as pd

    os.makedirs(args.out, exist_ok=True)
    seeds = args.run_seeds
    lines = [
        "# Nuclei-fixture A/B: torch reference (CPU) vs segtpu (TPU)",
        "",
        f"Fixture: {args.images} images (seed {args.seed}), patch "
        f"{args.patch}, batch {args.batch}, {args.epochs} epochs, run seeds "
        f"{seeds}. Each pair (torch seed S, segtpu seed S) starts from the "
        f"identical initial weights torch constructs under AB_SEED=S, on the "
        f"seed-1234 stratified patch split shared via the on-disk dataset. "
        f"The torch seed-to-seed band is the reference's own run-to-run "
        f"variance (init + augmentation/shuffle/dropout RNG); parity holds "
        f"if the two frameworks' 3-seed bands intersect (or segtpu sits "
        f"above) — the failure mode is segtpu's band falling disjointly "
        f"below torch's. Regenerate: `python "
        f"tools/ab_nuclei.py --phase all --seeds "
        + ",".join(str(s) for s in seeds) + "`.",
        "",
    ]
    worst = {}
    for model, loss, opt, lr in CONFIGS:
        ref, seg = {}, {}
        for s in seeds:
            ref_csv = _csv_path(os.path.join(args.work, f"torch_s{s}"),
                                model, loss, args.patch)
            seg_csv = _csv_path(os.path.join(args.work, f"segtpu_s{s}"),
                                model, loss, args.patch)
            ref[s] = pd.read_csv(ref_csv)
            seg[s] = pd.read_csv(seg_csv)
            shutil.copy(ref_csv, os.path.join(args.out,
                                              f"torch_{model}_s{s}.csv"))
            shutil.copy(seg_csv, os.path.join(args.out,
                                              f"segtpu_{model}_s{s}.csv"))
        n = min(min(len(d) for d in ref.values()),
                min(len(d) for d in seg.values()))
        if n < args.epochs:
            lines.append(f"**WARNING: {model} comparison truncated to "
                         f"{n}/{args.epochs} epochs — a leg is short.**")
        lines += [f"## {model} ({loss} + {opt}, lr {lr})", "",
                  "| epoch | torch band (min..max) | segtpu band (min..max) "
                  "| band relation |",
                  "|---|---|---|---|"]
        inside_tail = []
        for i in range(n):
            rlo = min(ref[s].val_iou[i] for s in seeds)
            rhi = max(ref[s].val_iou[i] for s in seeds)
            slo = min(seg[s].val_iou[i] for s in seeds)
            shi = max(seg[s].val_iou[i] for s in seeds)
            # Parity = the two 3-seed bands intersect (either framework's
            # run-to-run spread covers the other's); "above" = segtpu's
            # worst seed beats torch's best; disjoint-below is the failure.
            if slo > rhi:
                rel, ok = "above", True
            elif shi < rlo:
                rel, ok = "BELOW", False
            else:
                rel, ok = "overlap", True
            if i >= n // 2:
                inside_tail.append(ok)
            lines.append(f"| {i} | {rlo:.4f} .. {rhi:.4f} | "
                         f"{slo:.4f} .. {shi:.4f} | {rel} |")
        rfin = [ref[s].val_iou[n - 1] for s in seeds]
        sfin = [seg[s].val_iou[n - 1] for s in seeds]
        band = max(rfin) - min(rfin)
        delta = (sum(sfin) / len(sfin)) - (sum(rfin) / len(rfin))
        worst[model] = (band, delta, all(inside_tail))
        lines += [
            "",
            f"Final epoch: torch {min(rfin):.4f}..{max(rfin):.4f} "
            f"(seed band {band:.4f}), segtpu {min(sfin):.4f}..{max(sfin):.4f};"
            f" mean Δ(segtpu−torch) = **{delta:+.4f}**; bands intersect (or "
            f"segtpu above) at every epoch of the 2nd half: "
            f"**{'yes' if all(inside_tail) else 'NO'}**",
            "",
            "Per-seed final val_iou: "
            + "; ".join(f"s{s}: torch {ref[s].val_iou[n-1]:.4f} / segtpu "
                        f"{seg[s].val_iou[n-1]:.4f}" for s in seeds),
            "",
        ]
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
    p.add_argument("--seed", type=int, default=20260819,
                   help="fixture generation seed (the dataset itself)")
    p.add_argument("--seeds", default=str(AB_SEED),
                   help="comma-separated RUN seeds; one torch + one segtpu "
                        "leg per seed (the variance-band study)")
    args = p.parse_args(argv)
    args.data_dir = os.path.join(args.work, "data", "dsb2018")
    args.run_seeds = [int(s) for s in args.seeds.split(",") if s]

    os.makedirs(os.path.join(args.work, "torch"), exist_ok=True)

    phases = ([args.phase] if args.phase != "all"
              else ["init", "segtpu", "torch", "report"])
    for ph in phases:
        globals()["phase_" + ph](args)


if __name__ == "__main__":
    main()
