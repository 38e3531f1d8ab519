"""Training harness CLI — the public API (reference torch_train.py:333-451).

Flag names/semantics match the reference exactly; TPU-specific additions are
opt-in extras (``--bf16``, ``--model-parallel``, ``--light-logging``).

One grid cell: argparse -> registries build model/loss/optimizer/dataset ->
epoch loop alternating compiled train/eval steps -> history appended ->
best/last checkpoints -> CSV written at the end.

Usage:
    python -m segtpu.train_cli -m unet -d shapes -l bce -o adam -b 8 -p 128 -e 5
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax

from segtpu.data import DataLoader, get_dataset
from segtpu.data.shapes import DeviceShapesSet
from segtpu.models import get_model
from segtpu.ops import default_metrics, get_loss
from segtpu.parallel import batch_sharding, make_mesh, replicate
from segtpu.train.checkpoint import restore_snapshot, save_snapshot
from segtpu.train.loop import run_train_epoch, run_validate_epoch
from segtpu.train.optim import cosine_annealing_lr, get_optimizer
from segtpu.train.state import create_train_state, make_eval_step, make_train_step
from segtpu.utils import count_parameters


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("-g", "--grayscale", action="store_true",
                        help="Whether to use grayscale image instead of RGB")
    parser.add_argument("-m", "--model", required=True, type=str, help="Name of the model")
    parser.add_argument("-p", "--patch-size", type=int, default=224)
    parser.add_argument("-b", "--batch-size", type=int, default=1,
                        help="Batch Size during training, e.g. -b 64")
    parser.add_argument("-lr", "--learning-rate", type=float, default=1e-3,
                        help="Initial learning rate")
    parser.add_argument("-l", "--loss", type=str, default="bce", help="Target loss")
    parser.add_argument("-o", "--optimizer", default="SGD", help="Name of the optimizer")
    parser.add_argument("-e", "--epochs", type=int, default=100, help="Epoch to run")
    parser.add_argument("-d", "--dataset", type=str,
                        help="Name of the dataset to use for training.")
    parser.add_argument("-dd", "--data-dir", type=str, default="data",
                        help="Root directory where datasets are located.")
    parser.add_argument("-s", "--steps", type=int, default=None,
                        help="Steps per epoch (caps the train set; unset = "
                             "full dataset, matching the reference where the "
                             "flag existed but was unused)")
    parser.add_argument("-x", "--experiment", type=str, help="Name of the experiment")
    parser.add_argument("-w", "--workers", default=0, type=int, help="Num workers")
    parser.add_argument("-r", "--resume", action="store_true")
    parser.add_argument("-mem", "--memory", action="store_true")
    parser.add_argument("-sgdr", action="store_true")
    # TPU-native extras
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (params stay fp32)")
    parser.add_argument("--model-parallel", type=int, default=1,
                        help="Model-parallel mesh axis size")
    parser.add_argument("--s2d", action="store_true",
                        help="Space-to-depth execution of the low-channel "
                             "high-res level (exact math, dense 128-lane "
                             "channels; +31%% train throughput on "
                             "zf_unet-512, see BASELINE.md)")
    parser.add_argument("--remat", action="store_true",
                        help="Per-block rematerialization for models that "
                             "support it (tiramisu*): recompute activations "
                             "in backward for shapes that exceed HBM. "
                             "Default off — XLA's own scheduling measured "
                             "faster at the benchmark shapes (BASELINE.md)")
    parser.add_argument("--packed", action="store_true",
                        help="Packed dense-block growth for models that "
                             "support it (tiramisu*): append layers into a "
                             "preallocated buffer via in-place "
                             "dynamic_update_slice instead of rebuilding "
                             "the running concat every layer (exact math). "
                             "With --s2d, the full-res s2d block keeps the "
                             "concat formulation (packed covers the "
                             "normal-space blocks only)")
    parser.add_argument("--light-logging", action="store_true",
                        help="Skip per-epoch image grids and weight histograms")
    parser.add_argument("--no-tensorboard", action="store_true")
    parser.add_argument("--experiments-dir", type=str, default="experiments")
    parser.add_argument("--snapshot-every", type=int, default=1,
                        help="Save best/last checkpoints every N epochs "
                             "(0 disables; device->host pulls can dominate "
                             "on slow transports)")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Capture a jax.profiler trace of the first "
                             "training epoch into this directory")
    parser.add_argument("--device-augs", action="store_true",
                        help="Run augmentation on the TPU inside the compiled "
                             "train step (loaders yield raw pixels); "
                             "supported for shapes, dsb2018, inria")
    parser.add_argument("--freeze-encoder", action="store_true",
                        help="Freeze the encoder subtree (zero gradients) - "
                             "the frozen-then-finetune workflow for "
                             "pretrained-encoder models")
    parser.add_argument("--seed", type=int, default=None,
                        help="Seed every stochastic training stream (host "
                             "augmentation RNG, loader shuffle, dropout/"
                             "device-aug PRNG). Default keeps the historic "
                             "fixed streams (shuffle seed 0, PRNGKey(42), "
                             "unseeded host augs). Host augs draw from a "
                             "stateless per-sample stream keyed on (seed, "
                             "epoch, index), so reruns are bit-identical at "
                             "any worker count. Used by the multi-seed A/B "
                             "harness (tools/ab_nuclei.py)")
    parser.add_argument("--init-torch", type=str, default=None,
                        help="Local torch .pth with a FULL reference-format "
                             "state_dict for this model (as saved by "
                             "torch.save(model.state_dict())); transplanted "
                             "into params+batch_stats before training. Used "
                             "by the A/B harness (tools/ab_nuclei.py) to "
                             "start both frameworks from identical weights")
    parser.add_argument("--encoder-weights", type=str, default=None,
                        help="Local torch .pth with torchvision-format "
                             "encoder weights (resnet34/101/152 or "
                             "vgg11/16 depending on the model) to load "
                             "into the encoder — the zero-egress stand-in "
                             "for the reference's pretrained=True")
    return parser


def main(argv=None, *, param_penalty=None, model_builder=None,
         trainable_mask_fn=None, state_initializer=None, experiment_prefix=""):
    """Run one training grid cell.

    Hooks for the aux trainers:
      * ``param_penalty(params) -> scalar`` — added to the scaled loss
        (regularized trainer, torch_train_reg.py:92-97);
      * ``model_builder(args, num_channels) -> module`` — replaces the
        registry model (afterburner stack, torch_train_ab.py:241-250);
      * ``trainable_mask_fn(state) -> mask tree`` — zero-grads frozen params;
      * ``state_initializer(state, args) -> state`` — e.g. load frozen-head
        weights into the fresh state.
    """
    parser = build_arg_parser()
    args = parser.parse_args(argv)
    if args.dataset is None:
        parser.error("the following arguments are required: -d/--dataset")

    if args.seed is not None:
        # Host augmentations in seeded runs draw from stateless per-sample
        # streams bound by the DataLoader (augment.host.bind_sample_rng);
        # seeding the global streams here covers any remaining np/random
        # consumers outside the loader. The jit-side streams (dropout,
        # device augs) and the loader shuffle are seeded below where they
        # are constructed.
        import random as _py_random
        _py_random.seed(args.seed)
        np.random.seed(args.seed)

    from segtpu.parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed()
    from segtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if args.experiment is None:
        args.experiment = "%s%s_%s_%d_%s_%s" % (
            experiment_prefix, args.dataset, args.model, args.patch_size,
            "gray" if args.grayscale else "rgb", args.loss,
        )

    experiment_dir = os.path.join(
        args.experiments_dir, args.dataset, args.loss, args.experiment
    )
    os.makedirs(experiment_dir, exist_ok=True)

    writer = None
    if not args.no_tensorboard:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(comment="_" + args.experiment)

    with open(os.path.join(experiment_dir, "arguments.txt"), "w") as f:
        f.write(" ".join(sys.argv[1:]))

    dtype = None
    if args.bf16:
        import jax.numpy as jnp
        dtype = jnp.bfloat16

    loss_fn = get_loss(args.loss)
    tx = get_optimizer(args.optimizer, args.learning_rate)
    metrics = default_metrics()

    augment_fn = eval_transform_fn = None
    if args.device_augs:
        if args.grayscale:
            raise SystemExit(
                "--device-augs pipelines are RGB (3-channel normalization); "
                "drop -g or use the host augmentation path"
            )
        from segtpu.augment.device import get_device_pipelines
        pipelines = get_device_pipelines(args.dataset)
        if pipelines is None:
            raise SystemExit(f"--device-augs not supported for {args.dataset}")
        augment_fn, eval_transform_fn = pipelines
        if args.dataset.lower() == "shapes":
            from segtpu.data.shapes import ShapesDataset
            trainset = ShapesDataset(1024, args.patch_size, normalize=False)
            validset = ShapesDataset(128, args.patch_size, seed=1_000_000,
                                     normalize=False)
            num_classes = 1
        elif args.dataset.lower() == "dsb2018":
            from segtpu.data.dsb2018 import DSB2018Sliced
            trainset, validset, num_classes = DSB2018Sliced(
                args.data_dir, args.grayscale, args.patch_size, raw=True
            )
        elif args.dataset.lower() in ("inria", "inria-small"):
            from segtpu.data.inria import INRIA
            trainset, validset, num_classes = INRIA(
                args.data_dir, args.grayscale, args.patch_size, args.memory,
                small=args.dataset.lower() == "inria-small", raw=True,
            )
        else:
            raise SystemExit(
                "--device-augs raw loaders wired for shapes/dsb2018/inria"
            )
    else:
        trainset, validset, num_classes = get_dataset(
            args.dataset, args.data_dir, grayscale=args.grayscale,
            patch_size=args.patch_size, keep_in_mem=args.memory,
        )
    if args.steps is not None and args.steps > 0:
        if isinstance(trainset, DeviceShapesSet):
            trainset = trainset.take(args.steps * args.batch_size)
            validset = validset.take(max(args.steps // 4, 1) * args.batch_size)
        else:
            from segtpu.data.pipeline import Subset
            trainset = Subset(trainset, args.steps * args.batch_size)
            validset = Subset(validset,
                              max(args.steps // 4, 1) * args.batch_size)

    # Input channels follow the data, not the -g flag alone: shapes yields
    # true 1-channel under -g, while dsb2018/inria keep 3 channels with
    # grayscaled content (reference semantics — RandomGrayscale(p=1) stays
    # 3-channel, torch_train.py:336 / Inria.py:27).
    num_channels = getattr(trainset, "num_channels", None)
    if num_channels is None:
        num_channels = int(np.asarray(trainset[0][0]).shape[-1])

    if model_builder is not None:
        model = model_builder(args, num_channels)
    else:
        model = get_model(args.model, patch_size=args.patch_size,
                          num_channels=num_channels)
    if dtype is not None and hasattr(model, "dtype"):
        import dataclasses
        model = dataclasses.replace(model, dtype=dtype)
    if args.s2d:
        if not hasattr(model, "s2d"):
            raise SystemExit(f"--s2d: model '{args.model}' has no s2d mode")
        import dataclasses
        model = dataclasses.replace(model, s2d=True)
    if args.remat:
        if not hasattr(model, "remat"):
            raise SystemExit(f"--remat: model '{args.model}' has no remat mode")
        import dataclasses
        model = dataclasses.replace(model, remat=True)
    if args.packed:
        if not hasattr(model, "packed"):
            raise SystemExit(
                f"--packed: model '{args.model}' has no packed mode")
        import dataclasses
        model = dataclasses.replace(model, packed=True)

    if writer is not None:
        # model structure summary (the add_graph equivalent,
        # reference torch_train.py:370-371)
        try:
            import jax.numpy as jnp
            from flax import linen as fnn
            table = fnn.tabulate(
                model, jax.random.PRNGKey(0),
                compute_flops=False, compute_vjp_flops=False,
            )(jnp.zeros((1, args.patch_size, args.patch_size, num_channels)),
              train=False)
            writer.add_text("model/graph", f"```\n{table}\n```")
        except Exception:
            pass

    from segtpu.parallel import fit_data_parallel
    n_data = fit_data_parallel(
        args.batch_size, jax.device_count() // args.model_parallel
    )
    mesh = make_mesh(n_devices=n_data * args.model_parallel,
                     model_parallel=args.model_parallel)
    sharding = batch_sharding(mesh)

    state = create_train_state(
        model, tx, (args.batch_size, args.patch_size, args.patch_size, num_channels)
    )
    if args.init_torch:
        import torch

        from segtpu.compat.torch_import import transplant_state_dict
        sd = torch.load(args.init_torch, map_location="cpu",
                        weights_only=False)
        if isinstance(sd, dict) and "model" in sd:  # full reference snapshot
            sd = sd["model"]
        new_params, new_stats = transplant_state_dict(
            args.model, sd, {"params": state.params,
                             "batch_stats": state.batch_stats})
        state = state.replace(params=new_params, batch_stats=new_stats,
                              opt_state=state.tx.init(new_params))
        print("Torch weights transplanted from", args.init_torch)
    if args.encoder_weights:
        from segtpu.compat.encoder_weights import install_encoder_weights
        new_params, new_stats = install_encoder_weights(
            args.model, state.params, state.batch_stats, args.encoder_weights
        )
        state = state.replace(params=new_params, batch_stats=new_stats,
                              opt_state=state.tx.init(new_params))
        print("Encoder weights loaded from", args.encoder_weights)
    if state_initializer is not None:
        state = state_initializer(state, args)
    if args.model_parallel > 1:
        # channel-shard params + optimizer moments over the model axis
        from segtpu.parallel.tensor import tp_shard_state
        state = tp_shard_state(state, mesh)
    else:
        state = replicate(state, mesh)
    trainable_mask = trainable_mask_fn(state) if trainable_mask_fn else None
    if args.freeze_encoder:
        from segtpu.compat.encoder_weights import encoder_paths
        paths = encoder_paths(args.model, state.params)
        if not paths:
            raise SystemExit(
                f"--freeze-encoder: model '{args.model}' has no encoder subtree"
            )
        if trainable_mask is None:
            trainable_mask = jax.tree_util.tree_map(lambda _: True, state.params)
        from flax.core import unfreeze
        trainable_mask = jax.tree_util.tree_map(
            lambda v: v, unfreeze(trainable_mask))
        for path in paths:
            node, ref = trainable_mask, state.params
            for key in path[:-1]:
                node, ref = node[key], ref[key]
            node[path[-1]] = jax.tree_util.tree_map(
                lambda _: False, ref[path[-1]]
            )

    print("Train set size", len(trainset))
    print("Valid set size", len(validset))
    print("Model         ", args.model)
    print("Parameters    ", count_parameters(state.params))
    print("Devices       ", jax.device_count(), jax.default_backend())

    workers = args.workers if args.workers > 0 else 4
    if isinstance(trainset, DeviceShapesSet):
        # shapes-device: batches are generated under jit on the
        # accelerator — the thread-pool host loader would only add hops
        trainloader = trainset.loader(args.batch_size)
        validloader = validset.loader(args.batch_size)
    else:
        # Reproducibility contract under --seed: the loader binds a
        # STATELESS per-sample RNG — Random(h(seed, epoch, dataset index)) —
        # around each __getitem__ (augment.host.bind_sample_rng), so the
        # augmentation stream is independent of prefetch-thread timing and
        # worker count; two same-seed runs are bit-identical at any -w
        # (tests/test_cli_e2e.py::test_train_cli_seed_determinism).
        trainloader = DataLoader(trainset, batch_size=args.batch_size,
                                 shuffle=True, workers=workers,
                                 drop_last=True,
                                 seed=args.seed if args.seed is not None else 0,
                                 sample_seed=args.seed)
        validloader = DataLoader(validset, batch_size=args.batch_size,
                                 shuffle=False, workers=workers,
                                 drop_last=True)

    start_epoch = 0
    best_loss = np.inf
    train_history: dict = {}

    checkpoint_filename = os.path.join(experiment_dir, f"{args.model}_checkpoint.ckpt")
    snapshot_filename = os.path.join(experiment_dir, f"{args.model}_snapshot.ckpt")

    if args.resume:
        state, start_epoch, train_history, best_loss = restore_snapshot(
            state, checkpoint_filename
        )
        if args.model_parallel > 1:
            # restored leaves are host arrays — re-place with TP shardings,
            # preserving the restored optimizer moments
            from segtpu.parallel.tensor import tp_shard_state
            state = tp_shard_state(state, mesh, fresh=False)
        print("Resuming training from epoch", start_epoch, " and loss", best_loss)

    train_step = make_train_step(loss_fn, metrics, trainable_mask=trainable_mask,
                                 param_penalty=param_penalty,
                                 augment_fn=augment_fn)
    eval_step = make_eval_step(loss_fn, metrics, with_pr_curve=writer is not None,
                               transform_fn=eval_transform_fn)
    rng = jax.random.PRNGKey(42 if args.seed is None else args.seed)

    metric_names = list(metrics)

    for epoch in range(start_epoch, args.epochs):
        lr = args.learning_rate
        if args.sgdr:
            lr = cosine_annealing_lr(epoch, args.learning_rate, t_max=10, eta_min=1e-8)
            if writer is not None:
                writer.add_scalar("train/lr", lr, global_step=epoch)

        profiling = args.profile_dir is not None and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(args.profile_dir)

        trainloader.set_epoch(epoch)
        state, train_loss, train_scores = run_train_epoch(
            train_step, state, trainloader, lr, rng, epoch, metric_names,
            writer=writer, sharding=sharding,
            log_images=not args.light_logging,
            log_histograms=not args.light_logging,
        )
        if profiling:
            jax.profiler.stop_trace()
            print("profiler trace written to", args.profile_dir)

        valid_loss, valid_scores = run_validate_epoch(
            eval_step, state, validloader, epoch, metric_names,
            writer=writer, sharding=sharding,
        )

        # failure tripwire (SURVEY.md §5: the reference only *logs* grad
        # absmax; abort loudly on divergence instead, keeping the last
        # snapshot for postmortem)
        if not np.isfinite(train_loss.avg):
            save_snapshot(state, float("inf"), epoch, train_history,
                          snapshot_filename)
            raise RuntimeError(
                f"non-finite training loss at epoch {epoch}; "
                f"snapshot saved to {snapshot_filename}"
            )

        summary = {"epoch": epoch, "loss": train_loss.avg, "val_loss": valid_loss.avg}
        for key, value in train_scores.items():
            summary[key] = value.avg
        for key, value in valid_scores.items():
            summary["val_" + key] = value.avg

        for key, value in summary.items():
            train_history.setdefault(key, []).append(value)

        print(epoch, summary)

        snapshot_due = args.snapshot_every > 0 and (
            (epoch + 1) % args.snapshot_every == 0 or epoch == args.epochs - 1
        )
        if valid_loss.avg < best_loss and args.snapshot_every > 0:
            # A new best is always checkpointed immediately (reference
            # torch_train.py:435-438); --snapshot-every gates only the
            # periodic last-epoch snapshot. Gating the best write too would
            # silently drop best weights: best_loss advances, the epoch
            # isn't due, and no later epoch can beat it to re-trigger.
            best_loss = valid_loss.avg
            save_snapshot(state, valid_loss.avg, epoch, train_history,
                          checkpoint_filename)
            print("Checkpoint saved", epoch, best_loss)
        if snapshot_due:
            save_snapshot(state, valid_loss.avg, epoch, train_history,
                          snapshot_filename)

    print("Training is finished...")

    import pandas as pd
    df = pd.DataFrame(train_history)
    csv_path = os.path.join(experiment_dir, args.experiment + ".csv")
    df.to_csv(csv_path, index=False, mode="a" if args.resume else "w",
              header=not args.resume)
    return train_history


if __name__ == "__main__":
    main()
