"""Optimizer registry with torch-default hyperparameters
(reference torch_train.py:67-79) and LR schedules.

All optimizers are wrapped in ``optax.inject_hyperparams`` so the learning
rate is a runtime value — schedules (step decay, cosine SGDR, the LR finder's
exponential sweep) change the LR without recompiling the train step.
"""

from __future__ import annotations

import math

import optax


def get_optimizer(optimizer_name: str, learning_rate: float):
    """name -> optax GradientTransformation with torch-default hypers.

    sgd: torch.optim.SGD (no momentum); rms: torch.optim.RMSprop
    (alpha=0.99, eps=1e-8, eps OUTSIDE the sqrt); adam: torch.optim.Adam
    (betas 0.9/0.999, eps=1e-8).
    """
    name = optimizer_name.lower()
    if name == "sgd":
        return optax.inject_hyperparams(optax.sgd)(learning_rate=learning_rate)
    if name == "rms":
        return optax.inject_hyperparams(optax.rmsprop)(
            learning_rate=learning_rate, decay=0.99, eps=1e-8, eps_in_sqrt=False
        )
    if name == "adam":
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate, b1=0.9, b2=0.999, eps=1e-8
        )
    raise ValueError(optimizer_name)


def step_learning_rate(epoch: int, initial_lr: float) -> float:
    """Initial LR decayed by 10 every 10 epochs (reference torch_train.py:151-156)."""
    return initial_lr * (0.1 ** (epoch // 10))


def cosine_annealing_lr(
    epoch: int, base_lr: float, t_max: int = 10, eta_min: float = 1e-8
) -> float:
    """torch CosineAnnealingLR(T_max=10, eta_min=1e-8) closed form
    (reference torch_train.py:402-404)."""
    return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * epoch / t_max)) / 2


def lr_finder_schedule(n_steps: int = 30, min_lr: float = 1e-8):
    """Exponential sweep 1e-8 * 2^i (reference lib/train_utils.py:38-49)."""
    return [min_lr * (2.0 ** i) for i in range(n_steps)]
