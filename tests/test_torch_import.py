"""Torch-checkpoint import bridge: transplanted models reproduce the torch
forward exactly (eval mode)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference checkout")
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

from segtpu.compat import import_torch_snapshot, transplant_state_dict
from segtpu.models import get_model


def _forward_parity(model_name, ref_model, patch=32):
    ref_model.eval()
    ours = get_model(model_name)
    rng = np.random.RandomState(0)
    x = rng.rand(2, patch, patch, 3).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params, stats = transplant_state_dict(model_name, ref_model.state_dict(), variables)
    with torch.no_grad():
        expected = ref_model(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    got = ours.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)
    np.testing.assert_allclose(got, expected, atol=3e-4)


def test_unet_transplant_forward_parity():
    from lib.models.unet import UNet as RefUNet
    torch.manual_seed(0)
    _forward_parity("unet", RefUNet())


def test_zf_unet_transplant_forward_parity():
    from lib.models.zf_unet import ZF_UNET as RefZF
    torch.manual_seed(1)
    _forward_parity("zf_unet", RefZF())


def test_import_torch_snapshot_roundtrip(tmp_path):
    """A reference-format .pth snapshot loads into our state."""
    from lib.models.unet import UNet as RefUNet
    torch.manual_seed(2)
    ref = RefUNet()
    snap = tmp_path / "unet_checkpoint.pth"
    torch.save({
        "model": ref.state_dict(),
        "optimizer": {},
        "epoch": 7,
        "loss": 0.123,
        "train_history": {"loss": [1.0, 0.5]},
        "args": "-m unet",
    }, str(snap))

    ours = get_model("unet")
    x = jnp.zeros((1, 32, 32, 3))
    variables = ours.init(jax.random.PRNGKey(0), x, train=False)
    params, stats, meta = import_torch_snapshot("unet", str(snap), variables)
    assert meta["epoch"] == 7 and meta["loss"] == 0.123
    y = ours.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert y.shape == (1, 32, 32, 1)


def test_unknown_model_mapping_raises():
    ours = get_model("unet")
    v = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    with pytest.raises(KeyError):
        transplant_state_dict("gcn", {}, v)
