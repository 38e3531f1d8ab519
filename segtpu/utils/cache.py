"""Persistent XLA compilation cache.

Every harness entry point calls :func:`enable_compilation_cache` so repeated
runs of the same (model, batch, patch) skip the multi-minute XLA compiles.
Opt out with SEGTPU_NO_COMPILE_CACHE=1 or a custom dir via
SEGTPU_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache() -> None:
    global _DONE
    if _DONE or os.environ.get("SEGTPU_NO_COMPILE_CACHE") == "1":
        return
    import jax

    cache_dir = os.environ.get(
        "SEGTPU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "segtpu-xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _DONE = True
    except Exception:
        pass
