"""Compatibility bridge for users migrating from the torch reference."""

from segtpu.compat.torch_import import (  # noqa: F401
    export_state_dict,
    import_torch_snapshot,
    model_entries,
    transplant_state_dict,
)
from segtpu.compat.encoder_weights import (  # noqa: F401
    ENCODER_SPECS,
    encoder_paths,
    install_encoder_weights,
)
