"""BN-statistic speed-of-light bound for a training step (VERDICT r3 item 3a).

The headline config's remaining step time carries ~25 ms of BN statistic /
backward reductions running at 125-170 GB/s effective (BASELINE.md "Remaining
step time") — far under the 819 GB/s HBM roofline, because XLA loop-fuses the
upstream elementwise chains into the reduce emitters (every attempt to split
them was measured slower; see the negative-results section). This tool states
the ceiling that leaves: what the step time would be if every BN-stat
reduction ran at pure HBM rate.

Method: hook every BN call site (``bn_train_stats`` for BatchNormTorch
models, ``fused_abn`` for ABN models) during an abstract trace of the real
train step, collect the activation shapes, and charge each site its
irreducible reduce-read bytes:

  * forward statistics: one read of x                      (sum, sum(x^2))
  * backward edz/eydz:  one read of x (or z) + one of g

i.e. 3x the activation bytes per site. The speed-of-light reduction time is
those bytes at the HBM peak; the bound is ``measured_step - measured_reduce
+ sol_reduce``, with the measured reduce time taken from a fresh device
trace (tools/trace_ops.py over roofline --profile-dir).

Usage:
    python tools/bn_sol.py --model zf_unet --patch 512 --batch 16 --s2d \
        --step-ms 94.2 --reduce-ms 25
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_HBM_GBS = 819.0


def collect_bn_sites(model_name, patch, batch, s2d=False, bf16=True,
                     loss_name="bce", optimizer="sgd"):
    """Abstract-trace one train step; return [(shape, dtype, nbytes), ...]
    for every training-BN activation."""
    import jax
    import jax.numpy as jnp

    from segtpu.ops import abn as abn_ops
    from tools.roofline import build_step

    sites = []

    orig_stats = abn_ops.bn_train_stats
    orig_fused = abn_ops.fused_abn

    def hook_stats(x, scale, bias, **kw):
        sites.append((tuple(x.shape), jnp.dtype(x.dtype).name, x.size * x.dtype.itemsize))
        return orig_stats(x, scale, bias, **kw)

    def hook_fused(x, gamma, beta, **kw):
        if kw.get("training", True):
            sites.append((tuple(x.shape), jnp.dtype(x.dtype).name,
                          x.size * x.dtype.itemsize))
        return orig_fused(x, gamma, beta, **kw)

    abn_ops.bn_train_stats = hook_stats
    abn_ops.fused_abn = hook_fused
    try:
        step, state, batch_xy, _applied = build_step(
            model_name, patch, batch, bf16=bf16, loss_name=loss_name,
            optimizer=optimizer, s2d=s2d)
        jax.eval_shape(step, state, batch_xy, 1e-3, jax.random.PRNGKey(0))
    finally:
        abn_ops.bn_train_stats = orig_stats
        abn_ops.fused_abn = orig_fused
    return sites


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="zf_unet")
    p.add_argument("--patch", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--s2d", action="store_true")
    p.add_argument("--loss", default="bce")
    p.add_argument("--optimizer", default="sgd")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--step-ms", type=float, default=None,
                   help="measured step time (roofline output)")
    p.add_argument("--reduce-ms", type=float, default=None,
                   help="measured BN-reduce device time (trace_ops over a "
                        "fresh trace)")
    args = p.parse_args()

    sites = collect_bn_sites(args.model, args.patch, args.batch,
                             s2d=args.s2d, bf16=not args.fp32,
                             loss_name=args.loss, optimizer=args.optimizer)
    total_act = sum(b for _, _, b in sites)
    reduce_bytes = 3 * total_act  # fwd x-read + bwd (x|z)-read + g-read
    sol_ms = reduce_bytes / (V5E_PEAK_HBM_GBS * 1e9) * 1e3

    print(f"{args.model} patch={args.patch} batch={args.batch} "
          f"s2d={args.s2d} bf16={not args.fp32}")
    print(f"BN training sites: {len(sites)}")
    by_shape = {}
    for shp, dt, b in sites:
        key = (shp, dt)
        by_shape[key] = (by_shape.get(key, (0, 0))[0] + 1, b)
    for (shp, dt), (n, b) in sorted(by_shape.items(),
                                    key=lambda kv: -kv[1][0] * kv[1][1]):
        print(f"  {n:2d} x {str(shp):28s} {dt:9s} {n * b / 1e6:9.1f} MB")
    print(f"activation bytes through BN (one read): {total_act / 1e9:.3f} GB")
    print(f"irreducible reduce-read bytes (3x):     {reduce_bytes / 1e9:.3f} GB")
    print(f"speed-of-light reduce time @ {V5E_PEAK_HBM_GBS:.0f} GB/s: "
          f"{sol_ms:.2f} ms")
    if args.step_ms and args.reduce_ms:
        bound = args.step_ms - args.reduce_ms + sol_ms
        print(f"step bound: {args.step_ms:.1f} - {args.reduce_ms:.1f} + "
              f"{sol_ms:.2f} = {bound:.1f} ms  "
              f"(throughput ceiling {args.batch / bound * 1e3:.1f} img/s vs "
              f"measured {args.batch / args.step_ms * 1e3:.1f})")


if __name__ == "__main__":
    main()
