"""Pretrained encoder loading (--encoder-weights): torch-format state_dicts
convert into encoder subtrees with numeric forward parity.

Oracle: the reference's own torch DilatedResNet (lib/models/dilated_resnet.py)
constructed with dilated=False is a standard torchvision-format ResNet — it
uses the exact state_dict naming of the model-zoo files the reference
downloads (dilated_resnet.py:8-14), so converter parity against it validates
the real pretrained-weights path without network access.
"""

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

from segtpu.compat.encoder_weights import (
    ENCODER_SPECS,
    convert_encoder_state_dict,
    encoder_paths,
    install_encoder_weights,
)
from segtpu.models import get_model
from segtpu.models.encoders.resnet import ResNetEncoder, convert_torch_resnet


def _torch_resnet(layers, bottleneck):
    from lib.models.dilated_resnet import BasicBlock, Bottleneck, DilatedResNet

    torch.manual_seed(0)
    block = Bottleneck if bottleneck else BasicBlock
    return DilatedResNet(block, list(layers), dilated=False)


def _torch_encoder_forward(model, x_nchw):
    """conv1..layer4 feature forward of the torch oracle (eval mode)."""
    model.eval()
    with torch.no_grad():
        y = model.relu(model.bn1(model.conv1(x_nchw)))
        y = model.maxpool(y)
        e1 = model.layer1(y)
        e2 = model.layer2(e1)
        e3 = model.layer3(e2)
        e4 = model.layer4(e3)
    return [t.numpy() for t in (e1, e2, e3, e4)]


@pytest.mark.parametrize("layers,bottleneck", [((3, 4, 6, 3), False),
                                               ((1, 1, 1, 1), True)])
def test_convert_torch_resnet_forward_parity(layers, bottleneck):
    ref = _torch_resnet(layers, bottleneck)
    enc = ResNetEncoder(layers=layers, bottleneck=bottleneck)
    params, stats = convert_torch_resnet(ref.state_dict(), layers, bottleneck)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    outs = enc.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x), train=False)
    expected = _torch_encoder_forward(ref, torch.from_numpy(
        np.moveaxis(x, -1, 1).copy()))
    for got, want in zip(outs[1:], expected):
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want,
                                   atol=2e-4)


@pytest.mark.parametrize("model_name,patch", [
    ("linknet34", 64), ("gcn34", 64), ("dilated_linknet34", 64),
    ("albunet", 64),
])
def test_install_encoder_weights_resnet_models(model_name, patch, tmp_path):
    spec = ENCODER_SPECS[model_name]
    ref = _torch_resnet(spec.layers, spec.bottleneck)
    pth = tmp_path / "resnet.pth"
    torch.save(ref.state_dict(), str(pth))

    model = get_model(model_name)
    x = jnp.zeros((1, patch, patch, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    params, stats = install_encoder_weights(
        model_name, variables["params"], variables["batch_stats"], str(pth))

    # the stem kernel landed (OIHW -> HWIO)
    node = params
    for key in spec.paths[0]:
        node = node[key]
    want = np.transpose(ref.state_dict()["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_array_equal(np.asarray(node["conv1"]["Conv_0"]["kernel"]), want)

    # non-encoder params untouched, model still runs
    y = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_install_encoder_weights_psp_resnet101(tmp_path):
    spec = ENCODER_SPECS["psp_net"]
    ref = _torch_resnet(spec.layers, spec.bottleneck)
    pth = tmp_path / "resnet101.pth"
    torch.save(ref.state_dict(), str(pth))

    model = get_model("psp_net")
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params, stats = install_encoder_weights(
        "psp_net", variables["params"], variables["batch_stats"], str(pth))
    y = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert np.isfinite(np.asarray(y)).all()


def _fake_vgg_state_dict(arch):
    layout = {
        "vgg11": [(0, 64, 3), (3, 128, 64), (6, 256, 128), (8, 256, 256),
                  (11, 512, 256), (13, 512, 512), (16, 512, 512), (18, 512, 512)],
        "vgg16": [(0, 64, 3), (2, 64, 64), (5, 128, 64), (7, 128, 128),
                  (10, 256, 128), (12, 256, 256), (14, 256, 256),
                  (17, 512, 256), (19, 512, 512), (21, 512, 512),
                  (24, 512, 512), (26, 512, 512), (28, 512, 512)],
    }[arch]
    torch.manual_seed(3)
    sd = {}
    for li, out_c, in_c in layout:
        sd[f"features.{li}.weight"] = torch.randn(out_c, in_c, 3, 3) * 0.05
        sd[f"features.{li}.bias"] = torch.randn(out_c) * 0.05
    return sd


@pytest.mark.parametrize("model_name,arch", [("unet11", "vgg11"),
                                             ("unet16", "vgg16")])
def test_install_encoder_weights_vgg_models(model_name, arch, tmp_path):
    sd = _fake_vgg_state_dict(arch)
    pth = tmp_path / f"{arch}.pth"
    torch.save(sd, str(pth))

    model = get_model(model_name)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params, stats = install_encoder_weights(
        model_name, variables["params"], dict(variables.get("batch_stats", {})),
        str(pth))

    want = np.transpose(sd["features.0.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(params["conv1"]["conv0"]["Conv_0"]["kernel"]), want)
    y = model.apply({"params": params}, x, train=False)
    assert np.isfinite(np.asarray(y)).all()


def test_wrong_architecture_file_raises(tmp_path):
    """A resnet34 file into a bottleneck-encoder model fails loudly."""
    ref = _torch_resnet((3, 4, 6, 3), False)
    pth = tmp_path / "resnet34.pth"
    torch.save(ref.state_dict(), str(pth))

    model = get_model("linknet34")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    with pytest.raises((KeyError, ValueError)):
        install_encoder_weights("psp_net", variables["params"],
                                variables["batch_stats"], str(pth))


def test_unsupported_model_raises():
    with pytest.raises(KeyError):
        convert_encoder_state_dict("unet", {})


def test_encoder_paths_fallback():
    model = get_model("linknext")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    assert encoder_paths("linknext", variables["params"]) == (("encoder",),)
    assert encoder_paths("unet11", variables["params"]) == (
        ("conv1",), ("conv2",), ("conv3",), ("conv4",), ("conv5",))


@pytest.mark.slow
def test_cli_encoder_weights_freeze_roundtrip(tmp_path):
    """e2e: --encoder-weights + --freeze-encoder trains with the pretrained
    encoder and leaves it bit-identical after optimization steps."""
    from segtpu.train.checkpoint import restore_snapshot
    from segtpu.train.state import create_train_state
    from segtpu.train.optim import get_optimizer
    from segtpu.train_cli import main

    spec = ENCODER_SPECS["linknet34"]
    ref = _torch_resnet(spec.layers, spec.bottleneck)
    pth = tmp_path / "resnet34.pth"
    torch.save(ref.state_dict(), str(pth))

    history = main([
        "-m", "linknet34", "-d", "shapes", "-l", "bce", "-o", "adam",
        "-b", "4", "-p", "64", "-e", "1", "-s", "2", "-lr", "1e-2",
        "--no-tensorboard", "--light-logging",
        "--encoder-weights", str(pth), "--freeze-encoder",
        "--experiments-dir", str(tmp_path / "experiments"),
    ])
    assert np.isfinite(history["loss"][0])

    exp = (tmp_path / "experiments" / "shapes" / "bce" /
           "shapes_linknet34_64_rgb_bce" / "linknet34_snapshot.ckpt")
    model = get_model("linknet34")
    state = create_train_state(model, get_optimizer("adam", 1e-2),
                               (1, 64, 64, 3))
    state, _, _, _ = restore_snapshot(state, str(exp))
    want = np.transpose(ref.state_dict()["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(state.params["encoder"]["conv1"]["Conv_0"]["kernel"]), want)
