"""Probe XLA TPU compiler options on the headline train step.

The local XLA_FLAGS parser rejects TPU-backend flags, but
``lowered.compile(compiler_options=...)`` forwards them to the (remote)
compiler — this is the only lever for backend scheduling knobs here
(STATUS.md round-2c).  Each probe is one process invocation so compile
caches can't bleed between configurations; expect a full uncached compile
(minutes through the axon tunnel), so run probes in the background with a
generous timeout.

Usage:
    python tools/flag_probe.py                           # baseline timing
    python tools/flag_probe.py -o xla_tpu_scoped_vmem_limit_kib=65536
    python tools/flag_probe.py -o k1=v1 -o k2=v2 --steps 30

Prints one JSON line: {"options": {...}, "step_ms": N, "img_per_s": N}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--option", action="append", default=[],
                   metavar="KEY=VALUE", help="compiler option (repeatable)")
    p.add_argument("--model", default="zf_unet")
    p.add_argument("--patch", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--no-s2d", action="store_true")
    args = p.parse_args()

    options = {}
    for kv in args.option:
        k, _, v = kv.partition("=")
        options[k] = v

    from tools.roofline import build_step

    import jax

    step, state, batch_xy, _applied = build_step(
        args.model, args.patch, args.batch, s2d=not args.no_s2d)
    rng = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    lowered = step.lower(state, batch_xy, 1e-3, rng)
    compiled = lowered.compile(compiler_options=options or None)
    compile_s = time.perf_counter() - t0

    for _ in range(5):
        state, logs = compiled(state, batch_xy, 1e-3, rng)
    float(jax.device_get(logs["loss"]))

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, logs = compiled(state, batch_xy, 1e-3, rng)
    float(jax.device_get(logs["loss"]))
    dt = (time.perf_counter() - t0) / args.steps

    print(json.dumps({
        "model": args.model + ("" if args.no_s2d else "+s2d"),
        "patch": args.patch, "batch": args.batch,
        "options": options,
        "compile_s": round(compile_s, 1),
        "step_ms": round(dt * 1e3, 2),
        "img_per_s": round(args.batch / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
