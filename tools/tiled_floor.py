"""Config-#5 speed-of-light bound: INRIA-scale tiled inference floor.

VERDICT r4 item 4: round 4 measured 3.18 s/image on the streamed submission
path — BELOW the round-3 "3.52 ≈ 2888-model-pass device floor" sentence,
which means that floor was mis-stated (it was a *measured* serial device
sweep under tunnel load, not a computed bound). This tool derives the bound
the way configs #2/#4 got theirs: from the compiled program's own XLA cost
analysis plus the measured host<->device link rate.

Decomposition of one 5000² image at patch 512 / step 256 / D4 TTA ×8 /
tile batch 64 (chunk 8):

  * device sweep: 361 tiles -> 46 chunks of (8 tiles × 8 TTA) model passes
    under one compiled ``lax.map``, cost analysis gives total FLOPs + HBM
    bytes -> device-time bound = max(flops/peak, bytes/hbm_bw);
  * merge: scatter-add of weighted tiles + threshold (counted in the same
    compiled cost where possible, else bounded by its HBM bytes);
  * transfers: 75 MB uint8 image up, 25 MB uint8 mask down, at the MEASURED
    link rate of this machine (the axon tunnel is far slower than real PCIe,
    so the measured rate is the honest term; on a production v5e host the
    PCIe term is ~10x smaller).

``predict_tiled_stream`` depth=2 overlaps host prep/upload (i+1) and fetch
(i-1) with the device sweep of image i, so the per-image floor of the
pipeline is max(device_bound, transfer_bound) — not their sum.

Usage (on the TPU):  python tools/tiled_floor.py [--patch 512] [--size 5000]
Prints the bound table + the measured position (run bench.py --config
inria-tiled-inference-5000 separately for the measured number).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

V5E_PEAK_BF16_TFLOPS = 394.0
V5E_HBM_GBPS = 819.0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--patch", type=int, default=512)
    p.add_argument("--size", type=int, default=5000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--model", default="linknet34")
    args = p.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from segtpu.inference import _device_affine, _prep_tiled, _run_tiles_gather, _apply_affine
    from segtpu.models import get_model
    from segtpu.tiles import ImageSlicer
    from segtpu.train.optim import get_optimizer
    from segtpu.train.state import create_train_state, make_predict_step

    model = get_model(args.model)
    if hasattr(model, "dtype"):
        model = dataclasses.replace(model, dtype=jnp.bfloat16)
    state = create_train_state(model, get_optimizer("sgd", 1e-3),
                               (1, args.patch, args.patch, 3))
    predict_step = make_predict_step()
    predict_fn = lambda v: predict_step(state, v)

    rng = np.random.RandomState(0)
    image = (rng.rand(args.size, args.size, 3) * 255).astype(np.uint8)

    # --- geometry ---------------------------------------------------------
    slicer = ImageSlicer(image.shape, args.patch, args.patch // 2)
    n_tiles = len(slicer.crops)
    group = 8  # D4 TTA
    chunk = max(1, args.batch // group)
    n_chunks = -(-n_tiles // chunk)
    passes = n_chunks * chunk * group

    # --- compiled sweep cost (the exact production program) ---------------
    prep = _prep_tiled(image, None, args.patch, args.batch, True, "pyramid",
                       None, True)
    _slicer, affine, data, _n_tiles, _n_chunks, _chunk = prep
    padded, ys, xs = data

    def sweep(padded, ys, xs):
        return _run_tiles_gather(predict_fn, True,
                                 _apply_affine(padded, affine), ys, xs,
                                 n_chunks, chunk, args.patch)

    lowered = jax.jit(sweep).lower(padded, ys, xs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    # XLA cost analysis counts a while/map loop BODY once — the sweep is
    # n_chunks serial trips of that body, so scale to the full image.
    sweep_flops = float(cost.get("flops", 0.0)) * n_chunks
    sweep_bytes = float(cost.get("bytes accessed", 0.0)) * n_chunks

    # merge + threshold cost (device scatter-add of weighted tiles)
    preds = compiled(padded, ys, xs)

    def merge(preds):
        m = slicer.merge_device(preds[:n_tiles])
        return ((m > 0.5) * 255).astype(jnp.uint8)

    mlow = jax.jit(merge).lower(preds)
    mcomp = mlow.compile()
    mcost = mcomp.cost_analysis()
    mcost = mcost[0] if isinstance(mcost, (list, tuple)) else mcost
    merge_flops = float(mcost.get("flops", 0.0))
    merge_bytes = float(mcost.get("bytes accessed", 0.0))

    flops = sweep_flops + merge_flops
    dev_bytes = sweep_bytes + merge_bytes
    t_flop = flops / (V5E_PEAK_BF16_TFLOPS * 1e12)
    t_hbm = dev_bytes / (V5E_HBM_GBPS * 1e9)
    t_device = max(t_flop, t_hbm)

    # --- measured device sweep time (min of 3, warm) ----------------------
    jax.block_until_ready(mcomp(preds))
    sweep_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(mcomp(compiled(padded, ys, xs)))
        sweep_times.append(time.perf_counter() - t0)
    t_device_measured = min(sweep_times)

    # --- measured link rate (this machine's tunnel, uint8 both ways) ------
    up_bytes = padded.size  # uint8 canvas (the one host->device transfer)
    down_bytes = args.size * args.size  # uint8 mask fetch
    host_canvas = np.asarray(padded)
    up_times, down_times = [], []
    mask_dev = mcomp(preds)
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(host_canvas))
        up_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(mask_dev)
        down_times.append(time.perf_counter() - t0)
    t_up, t_down = min(up_times), min(down_times)
    t_transfer = t_up + t_down

    floor = max(t_device, t_transfer)
    floor_measured_dev = max(t_device_measured, t_transfer)

    out = {
        "tiles": n_tiles,
        "model_passes": passes,
        "sweep_tflop": round(flops / 1e12, 2),
        "sweep_gb": round(dev_bytes / 1e9, 1),
        "t_flop_bound_s": round(t_flop, 3),
        "t_hbm_bound_s": round(t_hbm, 3),
        "t_device_bound_s": round(t_device, 3),
        "t_device_measured_s": round(t_device_measured, 3),
        "up_mb": round(up_bytes / 1e6, 1),
        "down_mb": round(down_bytes / 1e6, 1),
        "t_up_s": round(t_up, 3),
        "t_down_s": round(t_down, 3),
        "t_transfer_s": round(t_transfer, 3),
        "floor_s_per_image": round(floor, 3),
        "floor_with_measured_device_s": round(floor_measured_dev, 3),
    }
    print(json.dumps(out))
    print(
        f"\nConfig-#5 floor: {n_tiles} tiles -> {passes} model passes; "
        f"sweep+merge = {flops/1e12:.2f} TFLOP / {dev_bytes/1e9:.1f} GB -> "
        f"device bound max({t_flop:.2f}, {t_hbm:.2f}) = {t_device:.2f} s "
        f"(measured device sweep {t_device_measured:.2f} s); transfers "
        f"{up_bytes/1e6:.0f}+{down_bytes/1e6:.0f} MB at the measured tunnel "
        f"rate = {t_transfer:.2f} s. depth=2 overlap -> floor = "
        f"max(device, transfer) = {floor:.2f} s/image "
        f"({floor_measured_dev:.2f} with the measured sweep).\n"
        f"Caveat: the axon tunnel content-addresses transfers — REPEATED "
        f"uploads/fetches of identical bytes are cache hits (a repeat-"
        f"measured min can show ~0 s), which is how a multi-image bench "
        f"can land below the first-pass transfer term; on production PCIe "
        f"the transfer term is ~10 ms and the device sweep is the floor."
    )


if __name__ == "__main__":
    main()
