"""Tensor parallelism: channel-sharded parameters over the ``model`` axis.

The reference has no TP (SURVEY.md §2.8 — single-GPU torch); this is the
TPU-native extension for scaling beyond data parallelism. Design: 1-D weight
sharding for convnets — conv kernels (H, W, I, O) are sharded on the output-
channel axis over ``model``; per-channel vectors (bias, BN scale/bias and
running stats) follow the same split. Activations stay batch-sharded (data
axis); GSPMD inserts the all-gathers/reduce-scatters on the model axis so
each device holds 1/tp of the parameters and optimizer state. Collectives
ride ICI because :func:`segtpu.parallel.make_mesh` maps the model axis to
contiguous device ranges.

Sharding a channel dim only when it is divisible by the tp size (and at
least ``min_features``) keeps small layers replicated — shape-safe for every
model in the zoo.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from segtpu.parallel import MODEL_AXIS


def _leaf_spec(path_leaf, tp: int, min_features: int) -> P:
    """PartitionSpec for one parameter/batch-stat leaf.

    Conv kernels are NHWC HWIO: rank-4, shard dim 3 (O). ConvTranspose
    (transpose_kernel=True) kernels are HWOI: we still shard the last dim —
    it is I there, which is equally valid 1-D weight sharding (the gather
    moves to the other side of the matmul). Rank-1 per-channel vectors shard
    dim 0. Everything else stays replicated.
    """
    shape = path_leaf.shape
    if len(shape) == 4 and shape[-1] % tp == 0 and shape[-1] >= min_features:
        return P(None, None, None, MODEL_AXIS)
    if len(shape) == 1 and shape[0] % tp == 0 and shape[0] >= min_features:
        return P(MODEL_AXIS)
    return P()


def tp_param_specs(params: Any, mesh: Mesh, min_features: int = 64) -> Any:
    """Pytree of PartitionSpec matching ``params`` for the mesh's model axis.

    With tp == 1 everything is replicated (pure DP layout)."""
    tp = mesh.shape[MODEL_AXIS]
    if tp <= 1:
        return jax.tree_util.tree_map(lambda _: P(), params)
    return jax.tree_util.tree_map(
        lambda leaf: _leaf_spec(leaf, tp, min_features), params
    )


def tp_shard_tree(tree: Any, mesh: Mesh, min_features: int = 64) -> Any:
    """Place a params-like host tree onto the mesh with TP channel sharding."""
    specs = tp_param_specs(tree, mesh, min_features)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        tree,
        specs,
    )


def tp_shard_state(state, mesh: Mesh, min_features: int = 64,
                   fresh: bool = True):
    """Re-place a TrainState with TP-sharded params/batch_stats and a
    matching optimizer state.

    ``fresh=True`` (initialization): the optimizer state is re-built from
    the sharded params — ``tx.init`` constructs its moment trees with
    ``zeros_like``-style constructors, so every params-shaped leaf inherits
    the sharding. ``fresh=False`` (resume): the EXISTING moments are
    preserved and re-placed leaf-by-leaf via ``optax.tree_map_params``
    (non-param leaves such as counts/hyperparams are left for jit to place).
    """
    import optax

    params = tp_shard_tree(state.params, mesh, min_features)
    batch_stats = tp_shard_tree(state.batch_stats, mesh, min_features)
    rep = NamedSharding(mesh, P())
    step = jax.device_put(state.step, rep)
    if fresh:
        opt_state = state.tx.init(params)
    else:
        specs = tp_param_specs(state.params, mesh, min_features)
        opt_state = optax.tree_map_params(
            state.tx,
            lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
            state.opt_state,
            specs,
        )
    return state.replace(
        step=step, params=params, batch_stats=batch_stats, opt_state=opt_state
    )
