"""Epoch runners: compiled steps + host meters + TensorBoard observability.

Mirrors the reference's train()/validate() observability surface
(torch_train.py:159-305): per-batch loss/metric scalars, per-batch global
grad-absmax, per-epoch image grids of input/target/sigmoid-pred, per-epoch
parameter histograms, PR curve on the last validation batch — but without
the reference's per-batch device syncs: batch logs are device scalars
collected asynchronously and fetched once per epoch.
"""

from __future__ import annotations


import numpy as np

import jax

from segtpu.data.pipeline import prefetch_to_device
from segtpu.ops.meters import AverageMeter, PRCurveMeter
from segtpu.utils import make_grid


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _fetch_logs(batch_logs):
    """Fetch a list of per-batch log dicts in ONE host transfer (stack the
    scalars on device first; tiny per-batch device_gets dominate on slow
    transports)."""
    if not batch_logs:
        return batch_logs
    import jax.numpy as jnp

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batch_logs)
    host = jax.device_get(stacked)
    n = len(batch_logs)
    return [jax.tree_util.tree_map(lambda a: a[i], host) for i in range(n)]


def run_train_epoch(
    train_step,
    state,
    loader,
    lr: float,
    rng,
    epoch: int,
    metric_names,
    writer=None,
    sharding=None,
    log_images: bool = True,
    log_histograms: bool = True,
    progress: bool = True,
):
    """One training epoch. Returns (state, loss_meter, {name: meter})."""
    losses = AverageMeter()
    scores = {k: AverageMeter() for k in metric_names}
    batch_logs = []
    last_batch = None

    it = prefetch_to_device(loader, sharding)
    n_batches = len(loader)
    if progress:
        from tqdm import tqdm
        it = tqdm(it, total=n_batches, desc="Train", leave=False)

    for batch in it:
        state, logs = train_step(state, batch, lr, rng)
        batch_logs.append(logs)
        last_batch = batch

    # Single host fetch for the whole epoch's logs.
    batch_logs = _fetch_logs(batch_logs)
    for i, logs in enumerate(batch_logs):
        step_idx = epoch * n_batches + i
        losses.update(float(logs["loss"]))
        if writer is not None:
            writer.add_scalar("train/batch/loss", float(logs["loss"]), step_idx)
            writer.add_scalar(
                "train/grad/global_abs_max", float(logs["grad_absmax"]), step_idx
            )
        for k in metric_names:
            scores[k].update(float(logs[k]))
            if writer is not None:
                writer.add_scalar(f"train/batch/{k}", float(logs[k]), step_idx)

    if writer is not None:
        if log_images and last_batch is not None:
            x, y = jax.device_get(last_batch)
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            preds = jax.device_get(state.apply_fn(variables, x[:8], train=False))
            writer.add_image("train/image", make_grid(x[:8]), epoch, dataformats="HWC")
            writer.add_image("train/y_true", make_grid(y[:8]), epoch, dataformats="HWC")
            writer.add_image(
                "train/y_pred", make_grid(_sigmoid(preds)), epoch, dataformats="HWC"
            )
        writer.add_scalar("train/epoch/loss", losses.avg, epoch)
        for k, m in scores.items():
            writer.add_scalar(f"train/epoch/{k}", m.avg, epoch)
        if log_histograms:
            flat = jax.tree_util.tree_flatten_with_path(jax.device_get(state.params))[0]
            for path, value in flat:
                name = "/".join(
                    getattr(p, "key", getattr(p, "idx", "?")) for p in path
                )
                writer.add_histogram("model/" + name, np.asarray(value), epoch, bins="doane")

    return state, losses, scores


def run_validate_epoch(
    eval_step,
    state,
    loader,
    epoch: int,
    metric_names,
    writer=None,
    sharding=None,
    progress: bool = True,
):
    """One validation epoch. Returns (loss_meter, {name: meter})."""
    losses = AverageMeter()
    scores = {k: AverageMeter() for k in metric_names}
    pr_meter = PRCurveMeter()
    batch_logs = []
    last_batch = None

    it = prefetch_to_device(loader, sharding)
    n_batches = len(loader)
    if progress:
        from tqdm import tqdm
        it = tqdm(it, total=n_batches, desc="Validation", leave=False)

    for batch in it:
        logs = eval_step(state, batch)
        batch_logs.append(logs)
        last_batch = batch

    batch_logs = _fetch_logs(batch_logs)
    for i, logs in enumerate(batch_logs):
        step_idx = epoch * n_batches + i
        losses.update(float(logs["loss"]))
        if writer is not None:
            writer.add_scalar("val/batch/loss", float(logs["loss"]), step_idx)
        for k in metric_names:
            scores[k].update(float(logs[k]))
            if writer is not None:
                writer.add_scalar(f"val/batch/{k}", float(logs[k]), step_idx)

    if writer is not None and batch_logs:
        if last_batch is not None:
            x, y = jax.device_get(last_batch)
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            preds = jax.device_get(state.apply_fn(variables, x[:8], train=False))
            writer.add_image("val/image", make_grid(x[:8]), epoch, dataformats="HWC")
            writer.add_image("val/y_true", make_grid(y[:8]), epoch, dataformats="HWC")
            writer.add_image(
                "val/y_pred", make_grid(_sigmoid(preds)), epoch, dataformats="HWC"
            )
        writer.add_scalar("val/epoch/loss", losses.avg, epoch)
        for k, m in scores.items():
            writer.add_scalar(f"val/epoch/{k}", m.avg, epoch)
        # PR curve from the last batch only (reference torch_train.py:293-302)
        if "pr_counts" in batch_logs[-1]:
            pr_meter.update_counts(*batch_logs[-1]["pr_counts"])
            try:
                writer.add_pr_curve_raw(
                    "val/pr_curve",
                    true_positive_counts=pr_meter.tp,
                    true_negative_counts=pr_meter.tn,
                    false_negative_counts=pr_meter.fn,
                    false_positive_counts=pr_meter.fp,
                    precision=pr_meter.precision(),
                    recall=pr_meter.recall(),
                    global_step=epoch,
                    num_thresholds=pr_meter.n_thresholds,
                )
            except Exception:
                pass  # tensorboardX signature differences are non-fatal

    return losses, scores
