"""Checkpoint / resume with the reference's best+last dual-file semantics
(reference torch_train.py:308-330, SURVEY.md §5).

Each snapshot is a directory ``<name>.ckpt/`` holding:
  * ``state.msgpack`` — flax-serialized {params, batch_stats, opt_state}
    (host numpy; backend-agnostic — orbax's async machinery stalls on the
    single-chip axon transport, so the torch.save-equivalent flat file is
    both simpler and dependable);
  * ``meta.json`` — {epoch, loss, train_history, args}.

``*_checkpoint`` = best-val-loss epoch, ``*_snapshot`` = last epoch, exactly
as in the reference.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization


def _meta_path(path: str) -> str:
    return os.path.join(path, "meta.json")


def _state_path(path: str) -> str:
    return os.path.join(path, "state.msgpack")


def save_snapshot(
    state,
    loss: float,
    epoch: int,
    train_history: Dict[str, list],
    snapshot_path: str,
    args: Optional[str] = None,
) -> None:
    """Write a full training snapshot (reference save_snapshot,
    torch_train.py:308-316)."""
    snapshot_path = os.path.abspath(snapshot_path)
    os.makedirs(snapshot_path, exist_ok=True)
    tree = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    tmp = _state_path(snapshot_path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(tree))
    os.replace(tmp, _state_path(snapshot_path))

    meta = {
        "epoch": int(epoch),
        "loss": float(loss),
        "train_history": train_history,
        "args": args if args is not None else " ".join(sys.argv[1:]),
    }
    with open(_meta_path(snapshot_path), "w") as f:
        json.dump(meta, f)


def load_snapshot_meta(snapshot_path: str) -> Dict[str, Any]:
    """Read just the {epoch, loss, train_history, args} metadata."""
    with open(_meta_path(os.path.abspath(snapshot_path))) as f:
        return json.load(f)


def restore_snapshot(
    state,
    snapshot_path: str,
    restore_opt: bool = True,
) -> Tuple[Any, int, Dict[str, list], float]:
    """Restore (state, start_epoch, train_history, best_loss)
    (reference restore_snapshot, torch_train.py:319-330).

    ``restore_opt=False`` skips the optimizer state entirely (reference's
    optimizer=None path) — the checkpoint may then come from a DIFFERENT
    optimizer than ``state``'s (e.g. submit/inference of an adam-trained
    checkpoint through an sgd-templated state)."""
    snapshot_path = os.path.abspath(snapshot_path)
    with open(_state_path(snapshot_path), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    tree = {
        "params": serialization.from_state_dict(
            jax.device_get(state.params), raw["params"]),
        "batch_stats": serialization.from_state_dict(
            jax.device_get(state.batch_stats), raw["batch_stats"]),
    }
    if restore_opt:
        tree["opt_state"] = serialization.from_state_dict(
            jax.device_get(state.opt_state), raw["opt_state"])
    with open(_meta_path(snapshot_path)) as f:
        meta = json.load(f)

    new_state = state.replace(
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"] if restore_opt else state.opt_state,
    )
    start_epoch = meta["epoch"] + 1
    return new_state, start_epoch, meta["train_history"], meta["loss"]
