"""Multi-host bootstrap (DCN axis, SURVEY.md §2.8).

On a multi-host TPU pod slice, call :func:`maybe_initialize_distributed`
before any jax usage: it runs ``jax.distributed.initialize`` when the
standard coordinator env vars are present and is a no-op otherwise, so the
same harness binary works single-host and multi-host. The mesh helpers in
segtpu.parallel then see the global device list and the data axis spans DCN
automatically (XLA routes per-axis collectives over ICI within a slice and
DCN across hosts).
"""

from __future__ import annotations

import os

_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed from env when configured. Returns True if
    running distributed.

    Recognized env: JAX_COORDINATOR_ADDRESS (+ optional JAX_NUM_PROCESSES,
    JAX_PROCESS_ID) or the standard TPU pod metadata that
    jax.distributed.initialize auto-detects (MEGASCALE/TPU env).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    auto_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        _INITIALIZED = True
    elif auto_pod:
        jax.distributed.initialize()
        _INITIALIZED = True
    return _INITIALIZED
