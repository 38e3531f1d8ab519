"""Quantified HBM-traffic floor for the FC-DenseNet concat-growth chain.

VERDICT r3 item 3b: "tiramisu concat-traffic floor: logical bytes of the
concat-growth chain vs HBM rate -> achievable img/s bound, committed next to
the 6.8% MFU row".

Walks the exact FCDenseNet57/67/103 architecture (segtpu/models/tiramisu.py,
reference lib/models/tiramisu.py:93-205) and computes, per training step:

  * the ALGORITHMIC dense-connectivity floor: bytes any implementation of
    DenseNet semantics must move — each dense layer reads its full (growing)
    concat input once forward and once backward (dx), writes its growth-rate
    output once forward and reads/accumulates its cotangent once backward;
    transition/bottleneck/head convs likewise. No BN re-reads, no concat
    materialization, no stat passes — a perfect-fusion lower bound.
  * the CONCAT-FORMULATION bytes: what the shipped running-concat
    formulation additionally materializes (each layer writes the new
    [prefix|out] buffer forward and its cotangent is re-materialized
    backward before the split).

Dividing by the v5e HBM rate (819 GB/s) turns both into step-time floors and
achievable img/s bounds to place next to the measured numbers
(BASELINE.md: tiramisu67 224^2 b16 = 105.2 img/s at 102.5 GB/step logical).

Usage: python tools/tiramisu_floor.py [--model tiramisu67] [--patch 224]
       [--batch 16] [--bytes-per-elem 2]
"""

from __future__ import annotations

import argparse

V5E_PEAK_HBM_GBS = 819.0

ARCH = {
    # (down_blocks, up_blocks, bottleneck_layers, growth, first_conv)
    "tiramisu57": ((4,) * 5, (4,) * 5, 4, 12, 48),
    "tiramisu67": ((5,) * 5, (5,) * 5, 5, 16, 48),
    "tiramisu103": ((4, 5, 7, 10, 12), (12, 10, 7, 5, 4), 15, 16, 48),
}


def analyze(model: str, patch: int, batch: int, bpe: float):
    down, up, bott, g, first = ARCH[model]
    hw0 = patch * patch

    floor_elems = 0.0      # algorithmic floor (elements * passes)
    concat_extra = 0.0     # extra materialization of the concat formulation
    concat_chain = 0.0     # total bytes touching the concat-growth chain
    formulation_elems = 0.0  # designed BN-relu-conv pass model (dense layers)

    def conv_io(cin, cout, hw_in, hw_out):
        # one read of input fwd, one write of output fwd; backward: read
        # cotangent, write dx (dW negligible: kernels are KB-sized)
        return (cin * hw_in + cout * hw_out) * 2

    def dense_block(c0, n, hw, upsample):
        nonlocal floor_elems, concat_extra, concat_chain, formulation_elems
        c = c0
        for _ in range(n):
            # floor: read concat input fwd + bwd, write growth fwd + read
            # its cotangent bwd
            layer = (c * hw) * 2 + (g * hw) * 2
            floor_elems += layer
            concat_chain += layer
            # concat formulation: materialize [prefix|out] fwd (write c+g)
            # and its cotangent bwd (write c+g before the slice-split)
            concat_extra += ((c + g) * hw) * 2
            concat_chain += ((c + g) * hw) * 2
            # BN-relu-conv designed pass model (perfect fusion, no remat):
            # fwd: BN-stat read (1·c) + normalize/act read+write (2·c, the
            # conv input must materialize — TPU convs don't fuse producers)
            # + conv read (1·c) + conv/dropout write (g) + concat write (c+g)
            # bwd: conv dgrad write (c) + act/BN dx chain read×2+write (3·c)
            # + BN-backward stat reads (2·c) + growth cotangent (2·g)
            formulation_elems += (9 * c + 3 * g + (c + g)) * hw
            c += g
        return c if not upsample else n * g

    # down path
    c = first
    floor_elems += conv_io(3, first, hw0, hw0)  # firstconv
    hw = hw0
    skips = []
    for n in down:
        c = dense_block(c, n, hw, upsample=False)
        skips.append((c, hw))
        # TransitionDown: conv1x1 same width + pool to quarter
        floor_elems += conv_io(c, c, hw, hw)
        floor_elems += (c * hw) * 1.5  # pool fwd write hw/4... read hw
        hw = hw // 4

    # bottleneck (upsample=True: emits only new features)
    new = dense_block(c, bott, hw, upsample=True)
    c_up = new
    for i, n in enumerate(up):
        skip_c, skip_hw = skips.pop()
        # TransitionUp deconv: in c_up at hw, out c_up at 4*hw; concat with skip
        floor_elems += conv_io(c_up, c_up, hw, skip_hw)
        hw = skip_hw
        cin = c_up + skip_c
        concat_extra += (cin * hw) * 2  # the transition concat materializes too
        concat_chain += (cin * hw) * 2
        last = i == len(up) - 1
        out_c = dense_block(cin, n, hw, upsample=not last)
        c_up = out_c if not last else cin + n * g
    floor_elems += conv_io(c_up, 1, hw, hw)  # head

    to_gb = batch * bpe / 1e9
    floor_gb = floor_elems * to_gb
    concat_gb = concat_extra * to_gb
    chain_gb = concat_chain * to_gb
    # non-dense-layer bytes (transitions/head/bottleneck are in floor_elems,
    # dense layers are replaced by the pass model); approximate the designed
    # total as: pass-model dense layers + the floor's non-dense remainder
    non_dense = floor_elems - (chain_gb / to_gb - concat_extra)
    designed_gb = (formulation_elems + non_dense) * to_gb
    sol = lambda gb: gb / V5E_PEAK_HBM_GBS * 1e3  # ms
    return {
        "model": model, "patch": patch, "batch": batch,
        "floor_gb_per_step": round(floor_gb, 1),
        "floor_step_ms_at_hbm_rate": round(sol(floor_gb), 1),
        "floor_img_per_s_bound": round(batch / sol(floor_gb) * 1e3, 1),
        "concat_materialization_gb": round(concat_gb, 1),
        "concat_chain_total_gb": round(chain_gb, 1),
        "floor_plus_concat_gb": round(floor_gb + concat_gb, 1),
        "floor_plus_concat_img_per_s": round(
            batch / sol(floor_gb + concat_gb) * 1e3, 1),
        "designed_pass_model_gb": round(designed_gb, 1),
        "designed_pass_model_img_per_s": round(
            batch / sol(designed_gb) * 1e3, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiramisu67", choices=sorted(ARCH))
    ap.add_argument("--patch", type=int, default=224)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bytes-per-elem", type=float, default=2.0)
    args = ap.parse_args()
    import json
    print(json.dumps(analyze(args.model, args.patch, args.batch,
                             args.bytes_per_elem), indent=1))


if __name__ == "__main__":
    main()
