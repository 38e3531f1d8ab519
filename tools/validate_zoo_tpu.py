"""Hardware validation: one real train step for EVERY registry model on TPU.

Catches TPU-specific lowering/memory issues that CPU-mesh tests can't.
Usage: python tools/validate_zoo_tpu.py [patch] [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from segtpu.models import get_model, model_names
from segtpu.ops import default_metrics, get_loss
from segtpu.train.optim import get_optimizer
from segtpu.train.state import create_train_state, make_train_step
from segtpu.data.shapes import DeviceShapes
from segtpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    patch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    gen = DeviceShapes(patch)
    x, y = gen.batch(jax.random.PRNGKey(0), batch)
    results = {}
    for name in model_names():
        t0 = time.time()
        try:
            model = get_model(name, patch_size=patch)
            tx = get_optimizer("adam", 1e-3)
            state = create_train_state(model, tx, (batch, patch, patch, 3))
            step = make_train_step(get_loss("bce"), default_metrics(),
                                   donate=True)
            state, logs = step(state, (x, y), 1e-3, jax.random.PRNGKey(0))
            loss = float(jax.device_get(logs["loss"]))
            ok = loss == loss  # finite check
            results[name] = f"OK loss={loss:.4f} ({time.time()-t0:.0f}s)"
            assert ok, name
        except Exception as e:
            results[name] = f"FAIL {type(e).__name__}: {str(e)[:100]}"
        print(f"{name:20s} {results[name]}", flush=True)

    failed = [n for n, r in results.items() if r.startswith("FAIL")]
    print(f"\n{len(results) - len(failed)}/{len(results)} models trainable on "
          f"{jax.default_backend()} at {patch}^2 b{batch}")
    if failed:
        print("failed:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
