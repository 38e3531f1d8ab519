"""Afterburner trainer CLI (reference torch_train_ab.py).

Two-stage transfer workload: restore a trained LinkNet34 head from
``<model>_checkpoint.ckpt`` (found by recursive search, torch_train_ab.py:242),
freeze it, and train a small UNet "afterburner" stacked after sigmoid. In the
functional paradigm freezing is a gradient mask over the ``head`` subtree —
the optimizer still sees one param tree, matching optax.masked semantics.

    python train_ab.py -m linknet34 -d shapes -l bce -o adam -b 8 -e 10
"""

from __future__ import annotations

from flax import serialization

from segtpu.models import get_model
from segtpu.models.afterburner_stack import AfterburnerStack, head_frozen_mask
from segtpu.train_cli import main as _main
from segtpu.utils import auto_file


def _model_builder(args, num_channels):
    head = get_model(args.model, patch_size=args.patch_size,
                     num_channels=num_channels)
    return AfterburnerStack(head=head)


def _state_initializer(state, args):
    """Load the trained head's params/batch_stats into the stack's ``head``
    subtree (reference restore_snapshot of the bare head,
    torch_train_ab.py:242)."""
    ckpt = auto_file(f"{args.model}_checkpoint.ckpt")
    import os
    with open(os.path.join(os.path.abspath(ckpt), "state.msgpack"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    params = dict(state.params)
    params["head"] = raw["params"]
    batch_stats = dict(state.batch_stats)
    batch_stats["head"] = raw["batch_stats"]
    return state.replace(params=params, batch_stats=batch_stats)


def main(argv=None):
    return _main(
        argv,
        model_builder=_model_builder,
        state_initializer=_state_initializer,
        trainable_mask_fn=head_frozen_mask,
        experiment_prefix="ab_",
    )


if __name__ == "__main__":
    main()
