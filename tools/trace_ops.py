"""Device-op time breakdown from a jax.profiler trace (xplane proto).

Host-side timing through the remote-TPU tunnel is unreliable (RTT ~30 ms,
content-addressed execution caching), so perf work uses device timelines:
capture with ``tools/roofline.py --profile-dir DIR`` (or any
``jax.profiler.start_trace``), then:

    python tools/trace_ops.py DIR [--top 40] [--group]

``--group`` merges ops by fusion-family (strips trailing .N digits) to show
where step time concentrates (the BASELINE.md "Roofline analysis" numbers).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import os
import re
import sys


def load_xplanes(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    out = []
    for p in sorted(paths, key=os.path.getmtime):
        data = open(p, "rb").read()
        if p.endswith(".gz"):
            data = gzip.decompress(data)
        space = xplane_pb2.XSpace()
        space.ParseFromString(data)
        out.append((p, space))
    return out


def device_op_times(space, device_filter: str = "TPU"):
    """Sum event durations (us) per event name on device planes.

    Returns (op_times, total_span_us, nsteps_hint)."""
    op_times = collections.Counter()
    op_counts = collections.Counter()
    total = 0.0
    for plane in space.planes:
        if device_filter not in plane.name or "Host" in plane.name:
            continue
        # skip derived planes (steps, scopes) — keep XLA op lines
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            # "XLA Ops" is the synchronous TensorCore timeline; "Async XLA
            # Ops" holds DMA spans that overlap compute (summing those
            # durations double-counts wall time).
            if line.name.lower() != "xla ops":
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id)).lstrip("%")
                if name.startswith(("copy-start", "copy-done", "send", "recv")):
                    continue
                dur = ev.duration_ps / 1e6  # ps -> us
                op_times[name] += dur
                op_counts[name] += 1
                total += dur
    return op_times, op_counts, total


GROUP_RULES = [
    ("conv/dot fusion", re.compile(r"^(%?)(fusion|convolution|dot|custom-call.*conv)", re.I)),
]


def family(name: str) -> str:
    """Group by op kind: 'convert_reduce_fusion.1 = (f32...' -> 'convert_reduce_fusion'."""
    base = name.lstrip("%").split(" ")[0].split("=")[0]
    base = re.sub(r"\.\d+$", "", base)
    return base


def _load_times(trace_dir, group):
    spaces = load_xplanes(trace_dir)
    _, space = spaces[-1]
    ops, counts, total = device_op_times(space)
    if group:
        g, gc = collections.Counter(), collections.Counter()
        for name, t in ops.items():
            g[family(name)] += t
            gc[family(name)] += counts[name]
        ops, counts = g, gc
    return ops, counts, total


def compare(dir_a, dir_b, steps_a, steps_b, top):
    """Per-family diff of two traces (A = before, B = after)."""
    ops_a, _, tot_a = _load_times(dir_a, group=True)
    ops_b, _, tot_b = _load_times(dir_b, group=True)
    sa, sb = steps_a or 1, steps_b or 1
    fams = set(ops_a) | set(ops_b)
    rows = sorted(
        ((ops_b.get(f, 0.0) / sb - ops_a.get(f, 0.0) / sa, f) for f in fams),
        key=lambda r: abs(r[0]), reverse=True)
    print(f"total: A {tot_a/sa/1e3:.2f} ms/step -> B {tot_b/sb/1e3:.2f} ms/step "
          f"(delta {tot_b/sb/1e3 - tot_a/sa/1e3:+.2f})")
    print(f"{'delta us':>10}  {'A us':>10}  {'B us':>10}  family")
    for d, f in rows[:top]:
        print(f"{d:10.1f}  {ops_a.get(f, 0.0)/sa:10.1f}  "
              f"{ops_b.get(f, 0.0)/sb:10.1f}  {f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true")
    ap.add_argument("--steps", type=int, default=None,
                    help="divide totals by N steps for per-step us")
    ap.add_argument("--compare", default=None, metavar="TRACE_DIR_B",
                    help="diff against a second trace (per-family, "
                         "positional dir = before, this = after)")
    ap.add_argument("--steps-b", type=int, default=None,
                    help="step count for the --compare trace (defaults to "
                         "--steps)")
    args = ap.parse_args()

    if args.compare:
        compare(args.trace_dir, args.compare, args.steps,
                args.steps_b or args.steps, args.top)
        return

    spaces = load_xplanes(args.trace_dir)
    path, space = spaces[-1]
    print(f"# {path}")
    ops, counts, total = device_op_times(space)
    if not ops:
        # some builds label the plane differently; dump plane/line names
        for plane in space.planes:
            print("plane:", plane.name, [l.name for l in plane.lines][:6])
        sys.exit(1)

    if args.group:
        g = collections.Counter()
        gc = collections.Counter()
        for name, t in ops.items():
            g[family(name)] += t
            gc[family(name)] += counts[name]
        ops, counts = g, gc

    denom = args.steps or 1
    print(f"total device op time: {total/1e3:.2f} ms"
          + (f" ({total/denom/1e3:.3f} ms/step over {denom} steps)" if args.steps else ""))
    print(f"{'us/step' if args.steps else 'us':>12}  {'%':>5}  {'count':>6}  name")
    for name, t in ops.most_common(args.top):
        print(f"{t/denom:12.1f}  {100*t/total:5.1f}  {counts[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
