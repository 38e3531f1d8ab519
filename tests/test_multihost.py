"""Multi-host input path (SURVEY.md §2.8 DCN row, VERDICT r1 item 4).

Spawns a real 2-process jax.distributed run (gloo collectives, 4 virtual CPU
devices per process = 8 global) where each process loads only ITS slice of
every global batch and `put_global` assembles the logically-global arrays via
``jax.make_array_from_process_local_data``. The resulting training trajectory
must equal the single-process 8-device run exactly.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import json, os, sys
pid = int(sys.argv[1])
out = sys.argv[2]
port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:" + port,
                           num_processes=2, process_id=pid)
import jax.numpy as jnp
from segtpu.data import DataLoader
from segtpu.data.pipeline import prefetch_to_device
from segtpu.data.shapes import ShapesDataset
from segtpu.models import get_model
from segtpu.ops import default_metrics, get_loss
from segtpu.parallel import batch_sharding, make_mesh, replicate
from segtpu.train.optim import get_optimizer
from segtpu.train.state import create_train_state, make_train_step

assert jax.process_count() == 2
assert jax.device_count() == 8 and jax.local_device_count() == 4

mesh = make_mesh()
model = get_model("unet")
state = create_train_state(model, get_optimizer("sgd", 1e-2), (8, 32, 32, 3))
state = replicate(state, mesh)

loader = DataLoader(ShapesDataset(16, 32, seed=0), batch_size=8,
                    shuffle=True, workers=2, seed=0)
assert loader.local_batch_size == 4  # this process loads half of each batch

step = make_train_step(get_loss("bce"), default_metrics(), donate=False)
losses = []
for batch in prefetch_to_device(loader, batch_sharding(mesh)):
    assert batch[0].shape[0] == 8, "global batch not assembled"
    state, logs = step(state, batch, 1e-2, jax.random.PRNGKey(0))
    losses.append(float(logs["loss"]))

psum = float(sum(float(jnp.sum(jnp.abs(p)))
                 for p in jax.tree_util.tree_leaves(state.params)))
bnsum = float(sum(float(jnp.sum(jnp.abs(s)))
                  for s in jax.tree_util.tree_leaves(state.batch_stats)))
if pid == 0:
    with open(out, "w") as f:
        json.dump({"losses": losses, "psum": psum, "bnsum": bnsum}, f)
"""


def _single_process_reference():
    import jax
    import jax.numpy as jnp

    from segtpu.data import DataLoader
    from segtpu.data.pipeline import prefetch_to_device
    from segtpu.data.shapes import ShapesDataset
    from segtpu.models import get_model
    from segtpu.ops import default_metrics, get_loss
    from segtpu.parallel import batch_sharding, make_mesh, replicate
    from segtpu.train.optim import get_optimizer
    from segtpu.train.state import create_train_state, make_train_step

    mesh = make_mesh(n_devices=8)
    model = get_model("unet")
    state = create_train_state(model, get_optimizer("sgd", 1e-2), (8, 32, 32, 3))
    state = replicate(state, mesh)
    loader = DataLoader(ShapesDataset(16, 32, seed=0), batch_size=8,
                        shuffle=True, workers=2, seed=0,
                        process_index=0, process_count=1)
    step = make_train_step(get_loss("bce"), default_metrics(), donate=False)
    losses = []
    for batch in prefetch_to_device(loader, batch_sharding(mesh)):
        state, logs = step(state, batch, 1e-2, jax.random.PRNGKey(0))
        losses.append(float(logs["loss"]))
    psum = float(sum(float(jnp.sum(jnp.abs(p)))
                     for p in jax.tree_util.tree_leaves(state.params)))
    bnsum = float(sum(float(jnp.sum(jnp.abs(s)))
                      for s in jax.tree_util.tree_leaves(state.batch_stats)))
    return losses, psum, bnsum


def test_two_process_global_step_equals_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out = tmp_path / "result.json"
    port = "12653"

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen([sys.executable, str(worker), str(pid), str(out), port],
                         env=env, cwd=REPO,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        outputs.append(stdout.decode(errors="replace"))
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{text[-3000:]}"
    result = json.loads(out.read_text())

    ref_losses, ref_psum, ref_bnsum = _single_process_reference()
    np.testing.assert_allclose(result["losses"], ref_losses, rtol=1e-6)
    np.testing.assert_allclose(result["psum"], ref_psum, rtol=1e-6)
    # synchronized BN running stats also match the single-process run
    np.testing.assert_allclose(result["bnsum"], ref_bnsum, rtol=1e-6)
