"""Root-cause ladder for the linknet34 A/B offset (VERDICT r4 item 1).

The 3-seed A/B (tools/ab_nuclei.py) found a *systematic* +0.019 final
val-IoU offset on config #2 (linknet34 + bce_jaccard + adam): all three
segtpu seeds finished above torch's whole seed band, while zf_unet showed
exact statistical parity (mean Δ −0.0001). Parity for config #2 is not
proven until the diverging component is NAMED. This harness builds the
controlled comparison the verdict prescribes:

**L0 (controlled-deterministic)**: augmentation off, shuffle off, dropout
off, identical init — BOTH frameworks are then fully deterministic, so the
two trajectories differ ONLY by floating-point numerics. If the per-epoch
curves track, framework math parity holds and the offset lives in the
stochastic pipeline; any systematic L0 gap is a semantic bug to bisect.

**L1 (dropout-only)**: augmentation off, shuffle off, dropout ON (each
framework's own stream), N seeds per side — isolates the one stochastic
component linknet34 has that zf_unet's winning config lacks in effect
(the reference's Dropout2d(p=0.5) before the head, linknet.py:57,83).

**Bisect legs** (run on demand when L0/L1 localize a gap): the segtpu leg
re-run one axis at a time — SEGTPU_DECONV_BWD=autodiff (reverse-free deconv
backward off), SEGTPU_BN_IMPL=autodiff (custom-VJP BN off),
--precision-highest (fp32 MXU passes instead of the TPU default bf16x3).

Mechanics mirror tools/ab_nuclei.py: the torch reference runs unmodified
through tools/ref_cpu_shim.py on CPU; segtpu runs train.py on the TPU; both
share the on-disk nuclei fixture, the seed-1234 stratified split, and the
identical torch-constructed init (--init-torch). The "off" switches are
applied OUTSIDE the training math: augmentations are removed from the
dataset pipeline on both sides (the four geometric transforms of
DSB2018Sliced — reference dsb2018.py:85-88), shuffle is forced False at the
loader, dropout modules are p=0 (torch) / SEGTPU_DISABLE_DROPOUT=1
(segtpu, layers.Dropout2d).

Usage:
  python tools/ab_ladder.py --phase l0          # the deterministic ladder
  python tools/ab_ladder.py --phase l1          # dropout-only bands
  python tools/ab_ladder.py --phase report
  python tools/ab_ladder.py --leg <name>        # (internal) run one leg
Results land in results/ab_ladder/ladder.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

MODEL, LOSS, OPT, LR = "linknet34", "bce_jaccard", "adam", "1e-4"
FIXTURE_SEED = 20260819
L0_SEED = 20260819
L1_SEEDS = [20260819, 20260820, 20260821]


def _exp_rel(patch):
    exp = f"dsb2018_{MODEL}_{patch}_rgb_{LOSS}"
    return os.path.join("experiments", "dsb2018", LOSS, exp, exp + ".csv")


def _train_flags(args):
    return ["-m", MODEL, "-d", "dsb2018", "-dd", args.data_dir,
            "-p", str(args.patch), "-b", str(args.batch), "-l", LOSS,
            "-o", OPT, "-lr", LR, "-e", str(args.epochs)]


# ---------------------------------------------------------------------------
# Leg runners (executed in a subprocess via --leg; knobs arrive as env vars:
# LADDER_NO_AUG / LADDER_NO_SHUFFLE / LADDER_NO_DROPOUT / AB_SEED, plus the
# segtpu process-start switches SEGTPU_* and LADDER_PRECISION_HIGHEST)
# ---------------------------------------------------------------------------

def _leg_torch(train_flags):
    from tools import ref_cpu_shim
    seed = int(os.environ.get("AB_SEED", "0"))
    TT = ref_cpu_shim.install(seed=seed)
    import torch
    if os.environ.get("LADDER_NO_AUG") == "1":
        import lib.augmentations as A

        class _Identity:
            def __init__(self, *a, **kw):
                self.prob = 0.0

            def __call__(self, img, mask=None):
                return img, mask

        for name in ("RandomRotate90", "VerticalFlip", "HorizontalFlip",
                     "ShiftScaleRotate"):
            setattr(A, name, _Identity)
    if os.environ.get("LADDER_NO_SHUFFLE") == "1":
        orig_dl = TT.DataLoader

        def _loader(*a, **kw):
            kw["shuffle"] = False
            return orig_dl(*a, **kw)

        TT.DataLoader = _loader
    if os.environ.get("LADDER_NO_DROPOUT") == "1":
        orig_gm = TT.get_model

        def _model(*a, **kw):
            m = orig_gm(*a, **kw)
            for mod in m.modules():
                if isinstance(mod, (torch.nn.Dropout, torch.nn.Dropout2d)):
                    mod.p = 0.0
            return m

        TT.get_model = _model
    sys.argv = ["torch_train.py"] + train_flags
    TT.main()


def _leg_segtpu(train_flags):
    # SEGTPU_DISABLE_DROPOUT / SEGTPU_DECONV_BWD / SEGTPU_BN_IMPL are
    # process-start env switches handled at segtpu import.
    if os.environ.get("LADDER_PRECISION_HIGHEST") == "1":
        import jax
        jax.config.update("jax_default_matmul_precision", "highest")
    if os.environ.get("LADDER_NO_AUG") == "1":
        import segtpu.data.dsb2018 as D
        D._heavy_geometric = lambda: []
    import segtpu.train_cli as cli
    if os.environ.get("LADDER_NO_SHUFFLE") == "1":
        orig_dl = cli.DataLoader

        def _loader(*a, **kw):
            kw["shuffle"] = False
            return orig_dl(*a, **kw)

        cli.DataLoader = _loader
    cli.main(train_flags)


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

def _leg_env(no_aug=True, no_shuffle=True, no_dropout=False, seed=L0_SEED,
             **extra):
    env = dict(os.environ, AB_SEED=str(seed))
    env.pop("LADDER_NO_AUG", None)
    env.pop("LADDER_NO_SHUFFLE", None)
    env.pop("LADDER_NO_DROPOUT", None)
    env.pop("SEGTPU_DISABLE_DROPOUT", None)
    env.pop("LADDER_PRECISION_HIGHEST", None)
    if no_aug:
        env["LADDER_NO_AUG"] = "1"
    if no_shuffle:
        env["LADDER_NO_SHUFFLE"] = "1"
    if no_dropout:
        env["LADDER_NO_DROPOUT"] = "1"
        env["SEGTPU_DISABLE_DROPOUT"] = "1"
    env.update(extra)
    return env


def _run_leg(args, name, kind, env, seed):
    """Run one leg in its own cwd under the work dir; skip if complete."""
    cwd = os.path.join(args.work, name)
    os.makedirs(cwd, exist_ok=True)
    csv = os.path.join(cwd, _exp_rel(args.patch))
    if os.path.exists(csv):
        with open(csv) as f:
            if sum(1 for line in f if line.strip()) - 1 >= args.epochs:
                print(f"[{name}] complete, skipping")
                return csv
        os.remove(csv)
    flags = _train_flags(args)
    if kind == "segtpu":
        flags += ["--init-torch", _init_path(args, seed),
                  "--seed", str(seed), "--no-tensorboard", "--light-logging"]
    cmd = [sys.executable, os.path.abspath(__file__), "--leg", kind,
           "--work", args.work, "--epochs", str(args.epochs),
           "--patch", str(args.patch), "--batch", str(args.batch),
           "--", *flags]
    print(f"[{name}]", " ".join(cmd), flush=True)
    subprocess.run(cmd, cwd=cwd, env=env, check=True)
    return csv


def _init_path(args, seed):
    return os.path.join(args.work, f"init_{MODEL}_s{seed}.pth")


def phase_init(args):
    from segtpu.data.nuclei_fixture import write_fixture
    write_fixture(args.data_dir, n_images=args.images, seed=FIXTURE_SEED)
    for seed in {L0_SEED, *L1_SEEDS}:
        init = _init_path(args, seed)
        if os.path.exists(init):
            continue
        # reuse the round-4 A/B inits when present (same construction)
        legacy = os.path.join("/tmp/ab_nuclei", f"init_{MODEL}_s{seed}.pth")
        if os.path.exists(legacy):
            import shutil
            shutil.copy(legacy, init)
            print("init copied from", legacy)
            continue
        env = dict(os.environ, AB_SEED=str(seed), AB_SAVE_INIT=init)
        cwd = os.path.join(args.work, "initdump")
        os.makedirs(cwd, exist_ok=True)
        cmd = [sys.executable, os.path.abspath(__file__), "--leg", "torch",
               "--", *_train_flags(args)[:-2], "-e", "0"]
        subprocess.run(cmd, cwd=cwd, env=env, check=True,
                       capture_output=True)
        print("init saved:", init)


def phase_l0(args):
    """The deterministic ladder: aug off, shuffle off, dropout off."""
    phase_init(args)
    legs = [
        ("torch_L0", "torch", _leg_env(no_dropout=True)),
        ("seg_L0", "segtpu", _leg_env(no_dropout=True)),
    ]
    if args.bisect:
        legs += [
            ("seg_L0_hp", "segtpu",
             _leg_env(no_dropout=True, LADDER_PRECISION_HIGHEST="1")),
            ("seg_L0_adjoint_off", "segtpu",
             _leg_env(no_dropout=True, SEGTPU_DECONV_BWD="autodiff")),
            ("seg_L0_bn_autodiff", "segtpu",
             _leg_env(no_dropout=True, SEGTPU_BN_IMPL="autodiff")),
        ]
    for name, kind, env in legs:
        _run_leg(args, name, kind, env, L0_SEED)


def phase_l1(args):
    """Dropout-only stochastic bands: aug off, shuffle off, dropout ON."""
    phase_init(args)
    for seed in L1_SEEDS:
        for kind in ("torch", "segtpu"):
            _run_leg(args, f"{kind}_L1_s{seed}", kind,
                     _leg_env(no_dropout=False, seed=seed), seed)


def _read(args, name):
    import pandas as pd
    return pd.read_csv(os.path.join(args.work, name, _exp_rel(args.patch)))


def phase_report(args):
    import pandas as pd  # noqa: F401

    os.makedirs(args.out, exist_ok=True)
    lines = ["# linknet34 offset root-cause ladder", "",
             f"Fixture: {args.images} images (seed {FIXTURE_SEED}), patch "
             f"{args.patch}, batch {args.batch}, {args.epochs} epochs, "
             f"identical torch-constructed init (AB_SEED={L0_SEED}). "
             f"Regenerate: `python tools/ab_ladder.py --phase l0` / "
             f"`--phase l1`.", ""]

    have = lambda n: os.path.exists(os.path.join(args.work, n,
                                                 _exp_rel(args.patch)))
    if have("torch_L0") and have("seg_L0"):
        t, s = _read(args, "torch_L0"), _read(args, "seg_L0")
        lines += ["## L0 — deterministic (aug off, shuffle off, dropout "
                  "off): pure framework numerics", "",
                  "| epoch | torch loss | segtpu loss | Δloss | torch "
                  "val_iou | segtpu val_iou | Δval_iou |", "|" + "---|" * 7]
        for i in range(min(len(t), len(s))):
            lines.append(
                f"| {i} | {t.loss[i]:.6f} | {s.loss[i]:.6f} | "
                f"{s.loss[i] - t.loss[i]:+.6f} | {t.val_iou[i]:.4f} | "
                f"{s.val_iou[i]:.4f} | {s.val_iou[i] - t.val_iou[i]:+.4f} |")
        lines.append("")
        for extra, label in [("seg_L0_hp", "matmul precision=highest"),
                             ("seg_L0_adjoint_off",
                              "deconv backward=autodiff"),
                             ("seg_L0_bn_autodiff", "BN impl=autodiff")]:
            if have(extra):
                e = _read(args, extra)
                n = min(len(t), len(e))
                lines += [f"### bisect leg: {label}", "",
                          "| epoch | Δloss vs torch | Δval_iou vs torch |",
                          "|---|---|---|"]
                for i in range(n):
                    lines.append(f"| {i} | {e.loss[i] - t.loss[i]:+.6f} | "
                                 f"{e.val_iou[i] - t.val_iou[i]:+.4f} |")
                lines.append("")

    l1 = all(have(f"{k}_L1_s{s}") for s in L1_SEEDS
             for k in ("torch", "segtpu"))
    if l1:
        ref = {s: _read(args, f"torch_L1_s{s}") for s in L1_SEEDS}
        seg = {s: _read(args, f"segtpu_L1_s{s}") for s in L1_SEEDS}
        n = min(min(len(d) for d in ref.values()),
                min(len(d) for d in seg.values()))
        lines += ["## L1 — dropout-only stochastic (aug off, shuffle off, "
                  "dropout ON; 3 seeds per side)", "",
                  "| epoch | torch val_iou band | segtpu val_iou band | "
                  "relation |", "|---|---|---|---|"]
        for i in range(n):
            rlo = min(ref[s].val_iou[i] for s in L1_SEEDS)
            rhi = max(ref[s].val_iou[i] for s in L1_SEEDS)
            slo = min(seg[s].val_iou[i] for s in L1_SEEDS)
            shi = max(seg[s].val_iou[i] for s in L1_SEEDS)
            rel = ("above" if slo > rhi
                   else "BELOW" if shi < rlo else "overlap")
            lines.append(f"| {i} | {rlo:.4f} .. {rhi:.4f} | "
                         f"{slo:.4f} .. {shi:.4f} | {rel} |")
        rfin = [ref[s].val_iou[n - 1] for s in L1_SEEDS]
        sfin = [seg[s].val_iou[n - 1] for s in L1_SEEDS]
        lines += ["", f"Final: torch {min(rfin):.4f}..{max(rfin):.4f}, "
                  f"segtpu {min(sfin):.4f}..{max(sfin):.4f}, mean Δ = "
                  f"{sum(sfin)/3 - sum(rfin)/3:+.4f}", ""]

    path = os.path.join(args.out, "ladder.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print("report written to", path)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work", default="/tmp/ab_ladder")
    p.add_argument("--out", default=os.path.join(REPO, "results",
                                                 "ab_ladder"))
    p.add_argument("--phase", default=None,
                   choices=["l0", "l1", "report", "all"])
    p.add_argument("--leg", default=None, choices=["torch", "segtpu"],
                   help="(internal) run one leg in this process")
    p.add_argument("--images", type=int, default=48)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--patch", type=int, default=128)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--bisect", action="store_true",
                   help="L0: also run the single-axis bisect legs")
    if argv is None:
        argv = sys.argv[1:]
    if "--" in argv:
        split = argv.index("--")
        argv, train_flags = argv[:split], argv[split + 1:]
    else:
        train_flags = None
    args = p.parse_args(argv)
    args.data_dir = os.path.join(args.work, "data", "dsb2018")

    if args.leg:
        assert train_flags is not None
        # every leg sees the same on-disk fixture dataset
        ([_leg_torch, _leg_segtpu][args.leg == "segtpu"])(train_flags)
        return

    phases = {"l0": [phase_l0], "l1": [phase_l1], "report": [phase_report],
              "all": [phase_l0, phase_l1, phase_report]}[args.phase or "all"]
    for ph in phases:
        ph(args)


if __name__ == "__main__":
    main()
