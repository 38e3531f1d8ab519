"""Conv weight regularization (reference torch_train_reg.py:40-62).

L1 on conv kernels (kernel sparsity) + L2 on conv biases (zero-mean), summed
over regular convolutions only — the reference's isinstance(nn.Conv2d) check
excludes transposed convs. Applied as a penalty added to the scaled loss
inside the compiled train step (torch_train_reg.py:97 semantics:
``batch_size * loss + l1_penalty + l2_penalty``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def conv2d_regularization(params: Any, l1_factor: float = 0.0005,
                          l2_factor: float = 0.0005) -> jnp.ndarray:
    """Walk the param tree: subtrees named ``Conv_0`` are flax nn.Conv
    (regular convs; ConvTranspose subtrees are named ``ConvTranspose_0`` and
    skipped, matching the reference's isinstance check)."""
    l1 = jnp.zeros(())
    l2 = jnp.zeros(())

    def walk(tree):
        nonlocal l1, l2
        if not isinstance(tree, dict):
            return
        for key, sub in tree.items():
            if key == "Conv_0" and isinstance(sub, dict):
                if "kernel" in sub:
                    l1 = l1 + jnp.sum(jnp.abs(sub["kernel"]))
                if "bias" in sub:
                    l2 = l2 + jnp.sum(jnp.square(sub["bias"]))
            else:
                walk(sub)

    walk(jax.tree_util.tree_map(lambda x: x, params))  # unfreeze view
    return l1_factor * l1 + l2_factor * l2


def make_conv2d_penalty(l1_factor: float = 0.0005, l2_factor: float = 0.0005):
    """Penalty fn for make_train_step(param_penalty=...)."""
    def penalty(params):
        return conv2d_regularization(params, l1_factor, l2_factor)
    return penalty
