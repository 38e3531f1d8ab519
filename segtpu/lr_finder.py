"""LR range finder (reference lib/train_utils.py:36-69 + test.py:8-32).

Exponential sweep 1e-8 * 2^i over 30 steps: one optimizer step per LR,
recording the loss; the driver smooths with a 4-tap box filter and plots the
log-x loss curve. The sweep runs through the same compiled train step, so a
30-step scan costs 30 device dispatches and no recompiles (LR is a runtime
scalar via optax.inject_hyperparams).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax

from segtpu.train.optim import lr_finder_schedule
from segtpu.train.state import make_train_step


def find_optimal_lr(state, loss_fn, dataloader, n_steps: int = 30,
                    min_lr: float = 1e-8) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (lrs, losses) — reference find_optimal_lr semantics."""
    lrs = np.array(lr_finder_schedule(n_steps, min_lr), dtype=np.float32)
    losses = np.zeros_like(lrs)

    step = make_train_step(loss_fn, donate=False)
    rng = jax.random.PRNGKey(0)

    it = iter(dataloader)
    device_losses = []
    for i, lr in enumerate(lrs):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(dataloader)
            batch = next(it)
        state, logs = step(state, batch, float(lr), rng)
        device_losses.append(logs["loss"])

    for i, dl in enumerate(jax.device_get(device_losses)):
        losses[i] = float(dl)
    return lrs, losses


def smooth_losses(losses: np.ndarray, taps: int = 4) -> np.ndarray:
    """4-tap box smoothing (reference test.py:21-24)."""
    kernel = np.ones(taps) / taps
    return np.convolve(losses, kernel, mode="valid")
