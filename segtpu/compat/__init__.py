"""Compatibility bridge for users migrating from the torch reference."""

from segtpu.compat.torch_import import (  # noqa: F401
    import_torch_snapshot,
    transplant_state_dict,
)
