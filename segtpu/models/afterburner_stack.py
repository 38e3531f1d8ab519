"""Frozen-head + afterburner stack (reference torch_train_ab.py:241-250):
``nn.Sequential(head, Sigmoid, Afterburner())`` — the head's logits pass
through sigmoid into a small 1-channel UNet refiner.

Matching the reference's freezing semantics: only the afterburner's params
receive gradients (requires_grad=False on the head, torch_train_ab.py:245),
but the head's BatchNorm *running stats keep updating* in train mode (the
reference never calls head.eval()).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from segtpu.models.unet import Afterburner


class AfterburnerStack(nn.Module):
    head: nn.Module
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        logits = self.head(x, train)
        p = jax.nn.sigmoid(logits)
        return Afterburner(dtype=self.dtype, name="afterburner")(p, train)


def make_afterburner_stack(head_model: nn.Module) -> AfterburnerStack:
    return AfterburnerStack(head=head_model)


def head_frozen_mask(state) -> dict:
    """Trainable-mask tree: False for the head subtree, True for the
    afterburner (torch_train_ab.py:245-250 semantics)."""
    mask = jax.tree_util.tree_map(lambda _: True, state.params)
    mask = dict(mask)
    mask["head"] = jax.tree_util.tree_map(lambda _: False, state.params["head"])
    return mask
