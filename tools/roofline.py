"""Roofline / MFU analysis for the training step (VERDICT r1 item 9).

For a given model/config: compile the jitted train step, pull XLA cost
analysis (FLOPs + HBM bytes accessed), measure wall time on the real chip,
and report achieved TFLOP/s, achieved HBM GB/s, MFU and bandwidth-utilization
against the chip's peaks. ``--sweep`` produces the per-model table recorded
in BASELINE.md.

Peaks default to TPU v5e: 197 TFLOP/s bf16, 819 GB/s HBM.

Usage:
    python tools/roofline.py --model zf_unet --patch 512 --batch 16
    python tools/roofline.py --sweep
    python tools/roofline.py --model zf_unet --profile-dir /tmp/trace
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBS = 819.0


def build_step(model_name: str, patch: int, batch: int, bf16: bool = True,
               loss_name: str = "bce", optimizer: str = "sgd",
               remat=None, s2d: bool = False, packed: bool = False,
               remat_policy=None):
    import jax
    import jax.numpy as jnp

    from segtpu.data.shapes import DeviceShapes
    from segtpu.models import get_model
    from segtpu.ops import default_metrics, get_loss
    from segtpu.train.optim import get_optimizer
    from segtpu.train.state import create_train_state, make_train_step

    model = get_model(model_name)
    if bf16 and hasattr(model, "dtype"):
        model = dataclasses.replace(model, dtype=jnp.bfloat16)
    if remat is not None and hasattr(model, "remat"):
        model = dataclasses.replace(model, remat=remat)
    # Track which requested modes actually applied so result rows are never
    # mislabeled for models lacking the attribute (train_cli raises instead).
    applied = {"s2d": False, "packed": False}
    if s2d:
        if not hasattr(model, "s2d"):
            raise SystemExit(f"model {model_name!r} has no s2d mode")
        model = dataclasses.replace(model, s2d=True)
        applied["s2d"] = True
    if packed:
        if not hasattr(model, "packed"):
            raise SystemExit(f"model {model_name!r} has no packed mode")
        model = dataclasses.replace(model, packed=True)
        applied["packed"] = True
    if remat_policy is not None:
        if not hasattr(model, "remat_policy"):
            raise SystemExit(f"model {model_name!r} has no remat_policy")
        model = dataclasses.replace(model, remat_policy=remat_policy)
    tx = get_optimizer(optimizer, 1e-3)
    state = create_train_state(model, tx, (batch, patch, patch, 3))
    x, y = DeviceShapes(patch).batch(jax.random.PRNGKey(0), batch)
    step = make_train_step(get_loss(loss_name), default_metrics(), donate=True)
    return step, state, (x, y), applied


def analyze(model_name: str, patch: int, batch: int, steps: int = 20,
            bf16: bool = True, loss_name: str = "bce", optimizer: str = "sgd",
            remat=None, s2d: bool = False, packed: bool = False,
            profile_dir: str | None = None, remat_policy=None) -> dict:
    import jax

    step, state, batch_xy, applied = build_step(
        model_name, patch, batch, bf16, loss_name, optimizer, remat, s2d,
        packed, remat_policy)
    rng = jax.random.PRNGKey(0)

    lowered = step.lower(state, batch_xy, 1e-3, rng)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    # warmup (donated state: rebuild each call chain)
    for _ in range(3):
        state, logs = step(state, batch_xy, 1e-3, rng)
    float(jax.device_get(logs["loss"]))

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, logs = step(state, batch_xy, 1e-3, rng)
    float(jax.device_get(logs["loss"]))
    dt = (time.perf_counter() - t0) / steps
    if profile_dir:
        jax.profiler.stop_trace()

    tflops = flops / dt / 1e12
    gbs = bytes_accessed / dt / 1e9
    return {
        "model": model_name + ("+s2d" if applied["s2d"] else "")
                 + ("+packed" if applied["packed"] else ""),
        "patch": patch,
        "batch": batch,
        "img_per_s": round(batch / dt, 1),
        "step_ms": round(dt * 1e3, 2),
        "gflop_per_step": round(flops / 1e9, 1),
        "gb_per_step": round(bytes_accessed / 1e9, 2),
        "intensity_flop_per_byte": round(flops / max(bytes_accessed, 1), 1),
        "achieved_tflops": round(tflops, 2),
        "achieved_hbm_gbs": round(gbs, 1),
        "mfu_pct": round(100 * tflops / V5E_PEAK_BF16_TFLOPS, 1),
        "hbm_util_pct": round(100 * gbs / V5E_PEAK_HBM_GBS, 1),
    }


SWEEP = [
    # (model, patch, batch, s2d) — BASELINE.md per-model table shapes
    ("unet", 224, 32, False),
    ("unet", 224, 32, True),
    ("zf_unet", 224, 32, False),
    ("zf_unet", 224, 32, True),
    ("linknet34", 224, 32, False),
    ("albunet", 224, 32, False),
    ("unet11", 224, 32, False),
    ("unet11", 224, 32, True),
    ("unet16", 224, 32, False),
    ("unet16", 224, 32, True),
    ("linknext", 224, 32, False),
    ("linknext", 224, 32, True),
    ("dilated_linknet34", 224, 32, False),
    ("squeezenet", 224, 32, False),
    ("squeezenet", 224, 32, True),
    ("gcn34", 224, 32, False),
    ("gcn", 224, 16, False),
    ("psp_net", 224, 16, False),
    ("duc", 224, 16, False),
    ("duc_dc", 224, 16, False),
    ("tiramisu57", 224, 16, False),
    ("tiramisu67", 224, 16, False),
    ("tiramisu103", 224, 8, False),
    ("unet_abn", 224, 32, False),
    ("unet_abn", 224, 32, True),
    ("zf_unet", 512, 16, False),
    ("zf_unet", 512, 16, True),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="zf_unet")
    p.add_argument("--patch", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--loss", default="bce")
    p.add_argument("--optimizer", default="sgd")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--no-remat", action="store_true",
                   help="force remat OFF for models that default it on")
    p.add_argument("--s2d", action="store_true")
    p.add_argument("--packed", action="store_true")
    p.add_argument("--remat-policy", default=None,
                   help="targeted per-dense-layer checkpoint policy "
                        "(tiramisu: 'conv_in')")
    p.add_argument("--profile-dir", default=None)
    p.add_argument("--sweep", action="store_true")
    args = p.parse_args()

    from segtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if args.sweep:
        for model, patch, batch, s2d in SWEEP:
            try:
                r = analyze(model, patch, batch, steps=args.steps, s2d=s2d)
            except Exception as e:  # record OOM/compile failures, keep going
                r = {"model": model + ("+s2d" if s2d else ""), "patch": patch,
                     "batch": batch, "error": str(e)[:200]}
            print(json.dumps(r), flush=True)
        return

    remat = True if args.remat else (False if args.no_remat else None)
    r = analyze(args.model, args.patch, args.batch, steps=args.steps,
                bf16=not args.fp32, loss_name=args.loss,
                optimizer=args.optimizer, remat=remat, s2d=args.s2d,
                packed=args.packed, profile_dir=args.profile_dir,
                remat_policy=args.remat_policy)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
