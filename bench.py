"""Benchmark: training throughput (images/sec/chip) at 512^2, ZF_UNET.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline (the divisor for vs_baseline) is the torch CPU reference measured
once on this machine and stored in bench_baseline.json — the reference
publishes no numbers (BASELINE.md), so the target is >=5x the CPU baseline
per BASELINE.json. Re-measure with: python bench.py --measure-cpu-baseline
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _training_batch(batch_size: int, patch: int, data_dir: str = None):
    """A fixed training batch: real DSB2018 patches when a dataset directory
    is available (the metric's nominal workload), else the on-device
    synthetic shapes generator."""
    import jax
    import jax.numpy as jnp

    if data_dir and os.path.isdir(os.path.join(data_dir, "images")):
        import numpy as np
        from segtpu.data.dsb2018 import DSB2018Sliced
        train, _, _ = DSB2018Sliced(data_dir, grayscale=False, patch_size=patch)
        samples = [train[i] for i in range(batch_size)]
        x = jnp.asarray(np.stack([s[0] for s in samples]))
        y = jnp.asarray(np.stack([s[1] for s in samples]))
        return x, y
    from segtpu.data.shapes import DeviceShapes
    gen = DeviceShapes(patch)
    return gen.batch(jax.random.PRNGKey(0), batch_size)


def measure_tpu(batch_size: int = 16, patch: int = 512, steps: int = 20,
                warmup: int = 3, model_name: str = "zf_unet",
                bf16: bool = True, data_dir: str = None,
                loss_name: str = "bce", optimizer: str = "sgd",
                freeze_encoder: bool = False, s2d: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    from segtpu.models import get_model
    from segtpu.ops import default_metrics, get_loss
    from segtpu.train.optim import get_optimizer
    from segtpu.train.state import create_train_state, make_train_step

    import dataclasses

    model = get_model(model_name)
    if bf16 and hasattr(model, "dtype"):
        model = dataclasses.replace(model, dtype=jnp.bfloat16)
    if s2d and hasattr(model, "s2d"):
        # space-to-depth execution of the low-channel 512-res level — exact
        # math, dense 128-lane channels + folded nearest-upsample
        # (segtpu.ops.s2d; +54% on this config)
        model = dataclasses.replace(model, s2d=True)
    tx = get_optimizer(optimizer, 1e-3)
    state = create_train_state(model, tx, (batch_size, patch, patch, 3))

    trainable_mask = None
    if freeze_encoder:
        # the frozen-then-finetune workload (BASELINE.json config #3)
        from segtpu.compat.encoder_weights import encoder_paths
        trainable_mask = jax.tree_util.tree_map(lambda _: True, state.params)
        for path in encoder_paths(model_name, state.params):
            node, ref = trainable_mask, state.params
            for key in path[:-1]:
                node, ref = node[key], ref[key]
            node[path[-1]] = jax.tree_util.tree_map(lambda _: False, ref[path[-1]])

    x, y = _training_batch(batch_size, patch, data_dir)
    jax.block_until_ready(x)

    step = make_train_step(get_loss(loss_name), default_metrics(), donate=True,
                           trainable_mask=trainable_mask)
    rng = jax.random.PRNGKey(0)

    for _ in range(warmup):
        state, logs = step(state, (x, y), 1e-3, rng)
    # force a value fetch: on the remote transport block_until_ready alone
    # does not guarantee the executions retired
    float(jax.device_get(logs["loss"]))

    t0 = time.perf_counter()
    for _ in range(steps):
        state, logs = step(state, (x, y), 1e-3, rng)
    final_loss = float(jax.device_get(logs["loss"]))
    dt = time.perf_counter() - t0
    assert final_loss == final_loss, "NaN loss in bench"
    return batch_size * steps / dt


def measure_cpu_baseline(batch_size: int = 4, patch: int = 512,
                         steps: int = 3) -> float:
    """Torch CPU reference throughput for the same workload (ZF_UNET-shape
    model, BCE, SGD). Slow — run once, cached in bench_baseline.json."""
    import sys

    sys.path.insert(0, "/root/reference")
    import torch
    from lib.models.zf_unet import ZF_UNET  # pure-torch reference model

    torch.set_num_threads(os.cpu_count() or 8)
    model = ZF_UNET()
    model.train()
    opt = torch.optim.SGD(model.parameters(), lr=1e-3)
    lossf = torch.nn.BCEWithLogitsLoss()
    x = torch.randn(batch_size, 3, patch, patch)
    y = (torch.rand(batch_size, 1, patch, patch) > 0.5).float()

    # warmup
    opt.zero_grad()
    loss = lossf(model(x), y)
    (batch_size * loss).backward()
    opt.step()

    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = lossf(model(x), y)
        (batch_size * loss).backward()
        opt.step()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def measure_tiled_inference(patch: int = 512, image_size: int = 5000,
                            batch_size: int = 64,
                            model_name: str = "linknet34",
                            bf16: bool = True, n_images: int = 4,
                            depth: int = 2) -> float:
    """BASELINE.json config #5: INRIA-scale 5000^2 tiled inference
    (ImageSlicer sliding window, pyramid-weighted blending, D4 TTA x8),
    measured as the submission path runs it: ``predict_tiled_stream``
    pipelines host prep/upload of image i+1 and the mask fetch of i-1
    under the device sweep of image i (vs the reference's strictly serial
    loop, inria_submit.py:296-306). Returns seconds/image (warm, amortized
    over ``n_images``).

    Tile batch 64 (chunk 8 with TTA): the sweep runs as ONE compiled
    lax.map, so a larger chunk means fewer serial loop iterations and
    fatter model batches. Measured (round 2e, interleaved repeats):
    b32 8.1-9.0 s, b48 8.1, b64 4.9-6.3, b96 4.6-7.1, b80/b128 outliers
    13.0/12.5 — 64 is the stable knee, 96 within noise of it.

    Round 3 (idle host, same conditions): serial per-image loop 6.5-7.9
    s/image; stream depth=1 4.2; depth=2 3.5-4.8 — at the measured ~3.5 s
    device floor (2888 model passes), so depth=2 is the default."""
    import dataclasses

    import numpy as np

    import jax.numpy as jnp

    from segtpu.inference import predict_tiled, predict_tiled_stream
    from segtpu.models import get_model
    from segtpu.train.optim import get_optimizer
    from segtpu.train.state import create_train_state, make_predict_step

    model = get_model(model_name)
    if bf16 and hasattr(model, "dtype"):
        model = dataclasses.replace(model, dtype=jnp.bfloat16)
    state = create_train_state(model, get_optimizer("sgd", 1e-3),
                               (1, patch, patch, 3))
    predict_step = make_predict_step()
    predict_fn = lambda v: predict_step(state, v)

    rng = np.random.RandomState(0)
    images = [(rng.rand(image_size, image_size, 3) * 255).astype(np.uint8)
              for _ in range(n_images)]

    # warm (compile + cache). threshold=0.5 matches the submission path
    # (inria_submit writes binary masks): the mask is thresholded on device
    # and fetched as uint8 — 4x less host transfer than raw fp32 probs.
    predict_tiled(images[0], predict_fn, patch_size=patch,
                  batch_size=batch_size, tta=True, threshold=0.5)
    # min over repeats: per-pass wall time through the shared axon tunnel
    # varies up to 2x with external load, so the min is the honest
    # steady-state number (standard latency-benchmark practice)
    best = float("inf")
    for _ in range(2):
        items = [(i, (lambda im=im: im)) for i, im in enumerate(images)]
        t0 = time.perf_counter()
        n = 0
        for _key, mask in predict_tiled_stream(
                items, predict_fn, patch_size=patch, batch_size=batch_size,
                tta=True, threshold=0.5, depth=depth):
            assert mask.shape == (image_size, image_size)
            n += 1
        best = min(best, (time.perf_counter() - t0) / n)
    return best


# The five BASELINE.json configs, reproducible with one command each /
# `--all` for the full table (VERDICT r1 item 6).
BENCH_CONFIGS = {
    "zf_unet-512": dict(kind="train", model_name="zf_unet", patch=512,
                        batch_size=16, loss_name="bce", optimizer="sgd",
                        s2d=True),
    "linknet34-bce_jaccard-adam-512": dict(
        kind="train", model_name="linknet34", patch=512, batch_size=16,
        loss_name="bce_jaccard", optimizer="adam"),
    "unet11-finetune-512": dict(
        kind="train", model_name="unet11", patch=512, batch_size=16,
        loss_name="bce", optimizer="adam", freeze_encoder=True, s2d=True),
    # AlbuNet shares config #3's frozen-then-finetune workload shape
    # (resnet34 encoder variant of the TernausNet family)
    "albunet-finetune-512": dict(
        kind="train", model_name="albunet", patch=512, batch_size=16,
        loss_name="bce", optimizer="adam", freeze_encoder=True),
    "tiramisu67-512-b4": dict(kind="train", model_name="tiramisu67",
                              patch=512, batch_size=4, steps=10,
                              loss_name="bce", optimizer="sgd"),
    "inria-tiled-inference-5000": dict(kind="tiled"),
}


def run_config(name: str, data_dir=None) -> dict:
    cfg = dict(BENCH_CONFIGS[name])
    kind = cfg.pop("kind")
    if kind == "tiled":
        secs = measure_tiled_inference()
        return {
            "metric": f"{name} (linknet34@512, D4 TTA x8, pyramid merge)",
            "value": round(secs, 2),
            "unit": "sec/image",
            "vs_baseline": None,
        }
    value = measure_tpu(data_dir=data_dir, **cfg)
    vs_baseline = None
    if name == "zf_unet-512":
        baseline_path = os.path.join(os.path.dirname(__file__),
                                     "bench_baseline.json")
        if os.path.exists(baseline_path):
            with open(baseline_path) as f:
                vs_baseline = round(value / json.load(f)["cpu_images_per_sec"], 2)
    return {
        "metric": f"{name} bf16 train throughput",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": vs_baseline,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--measure-cpu-baseline", action="store_true")
    parser.add_argument("--all", action="store_true",
                        help="Run all five BASELINE.json configs, one JSON "
                             "line each")
    parser.add_argument("--config", type=str, default=None,
                        choices=sorted(BENCH_CONFIGS),
                        help="Run one named BASELINE.json config")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--patch", type=int, default=512)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--model", type=str, default="zf_unet")
    parser.add_argument("--no-s2d", action="store_true",
                        help="Disable space-to-depth execution of the "
                             "low-channel high-res level (s2d is exact math; "
                             "on by default for models that support it)")
    parser.add_argument("--data-dir", type=str, default="data/dsb2018",
                        help="DSB2018 root (images/ + masks/); falls back to "
                             "the synthetic shapes generator when absent")
    args = parser.parse_args()

    from segtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")

    if args.measure_cpu_baseline:
        ips = measure_cpu_baseline(patch=args.patch)
        with open(baseline_path, "w") as f:
            json.dump({"cpu_images_per_sec": ips, "patch": args.patch,
                       "model": "zf_unet", "note": "torch CPU reference"}, f)
        print(json.dumps({"cpu_images_per_sec": ips}))
        return

    if args.all or args.config:
        names = [args.config] if args.config else sorted(BENCH_CONFIGS)
        for name in names:
            print(json.dumps(run_config(name, data_dir=args.data_dir)),
                  flush=True)
        return

    value = measure_tpu(batch_size=args.batch_size, patch=args.patch,
                        steps=args.steps, model_name=args.model,
                        data_dir=args.data_dir, s2d=not args.no_s2d)

    vs_baseline = 0.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            cpu = json.load(f)["cpu_images_per_sec"]
        vs_baseline = value / cpu

    used_dsb = os.path.isdir(os.path.join(args.data_dir or "", "images"))
    print(json.dumps({
        "metric": f"{args.model} {args.patch}^2 bf16 train throughput "
                  f"({'dsb2018' if used_dsb else 'synthetic shapes'})",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
