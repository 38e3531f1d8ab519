"""TrainState + compiled train/eval steps.

The reference's inner loop (torch_train.py:176-214: forward -> loss ->
``(batch_size * loss).backward()`` -> optimizer.step() -> per-batch metric
evals -> grad-absmax scan) becomes ONE jitted ``train_step(state, batch, lr,
rng) -> (state, logs)``: forward+backward+update+metrics+grad-absmax in a
single compiled program, no per-batch host syncs (SURVEY.md §3.3).

Gradient semantics parity: the reference backprops ``batch_size * loss``
(torch_train.py:188) — we differentiate the scaled loss identically.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )


def create_train_state(model, tx, input_shape, rng=None, has_dropout=True):
    """Initialize params/batch_stats for an NHWC input shape."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    x = jnp.zeros(input_shape, jnp.float32)
    variables = model.init(rng, x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict({}))
    return TrainState.create(model.apply, params, batch_stats, tx)


def _grad_absmax(grads) -> jnp.ndarray:
    """Global gradient abs-max — the reference's explosion tripwire
    (torch_train.py:199-205), as one fused reduction on device.

    NOTE (measured, round 5): on very fast models the ~100 per-leaf reduce
    kernels are visible fixed overhead (gcn34 @224²: 23% of a 16.8 ms step,
    ~31 µs per tiny abs_reduce). Reformulating as ONE reduce over the
    raveled concat (also via ravel_pytree) lowers to the IDENTICAL program —
    XLA canonicalizes reduce-of-concatenate back into per-operand partial
    reduces — so the per-leaf launch cost is the floor for this semantic
    (documented-negative; trace pair /tmp/prof_gcn34{,b} round 5)."""
    leaves = jax.tree_util.tree_leaves(grads)
    if not leaves:
        return jnp.zeros(())
    return jnp.max(jnp.stack([jnp.max(jnp.abs(g)) for g in leaves]))


def make_train_step(
    loss_fn: Callable,
    metrics: Optional[Dict[str, Callable]] = None,
    trainable_mask: Any = None,
    param_penalty: Optional[Callable] = None,
    donate: bool = True,
    augment_fn: Optional[Callable] = None,
):
    """Build the jitted train step.

    ``trainable_mask``: optional pytree of bools matching params — False
    entries get zero gradients (frozen-head afterburner training,
    reference torch_train_ab.py:245-246).
    ``param_penalty``: optional fn(params) -> scalar added to the *scaled*
    loss (L1/L2 regularized trainer, reference torch_train_reg.py:92-97).
    ``augment_fn``: optional on-device augmentation ``(key, x, y) -> (x, y)``
    fused into the same compiled program (segtpu.augment.device pipelines).
    """
    metrics = metrics or {}

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch, lr, rng):
        x, y = batch
        if augment_fn is not None:
            aug_rng = jax.random.fold_in(jax.random.fold_in(rng, 7), state.step)
            x, y = augment_fn(aug_rng, x, y)
        dropout_rng = jax.random.fold_in(rng, state.step)

        def scaled_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, updates = state.apply_fn(
                variables, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            loss = loss_fn(logits, y)
            total = loss * x.shape[0]
            if param_penalty is not None:
                total = total + param_penalty(params)
            return total, (loss, logits, updates["batch_stats"])

        grads, (loss, logits, new_stats) = jax.grad(scaled_loss, has_aux=True)(
            state.params
        )
        if trainable_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g * m, grads,
                jax.tree_util.tree_map(lambda m: jnp.asarray(m, jnp.float32), trainable_mask),
            )

        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, new_opt_state = state.tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        logs = {"loss": loss, "grad_absmax": _grad_absmax(grads)}
        for name, fn in metrics.items():
            logs[name] = fn(logits, y)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, logs

    return train_step


def make_eval_step(
    loss_fn: Callable,
    metrics: Optional[Dict[str, Callable]] = None,
    with_pr_curve: bool = False,
    transform_fn: Optional[Callable] = None,
):
    """Jitted eval step: loss + metrics (+ optional PR-curve confusion counts)
    using running BN statistics (reference validate(), torch_train.py:240-305).
    ``transform_fn``: optional deterministic on-device input transform
    ``(x, y) -> (x, y)`` (e.g. normalization when the loader yields raw)."""
    metrics = metrics or {}

    @jax.jit
    def eval_step(state: TrainState, batch):
        x, y = batch
        if transform_fn is not None:
            x, y = transform_fn(x, y)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = state.apply_fn(variables, x, train=False)
        logs = {"loss": loss_fn(logits, y)}
        for name, fn in metrics.items():
            logs[name] = fn(logits, y)
        if with_pr_curve:
            from segtpu.ops.metrics import pr_curve_counts
            logs["pr_counts"] = pr_curve_counts(logits, y)
        return logs

    return eval_step


def make_predict_step():
    """Jitted inference: logits -> sigmoid probs (used by tiled inference)."""

    @jax.jit
    def predict_step(state: TrainState, x):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = state.apply_fn(variables, x, train=False)
        return jax.nn.sigmoid(logits)

    return predict_step
