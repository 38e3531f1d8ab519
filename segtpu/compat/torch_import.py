"""Import torch reference checkpoints / state_dicts into segtpu models.

The reference saves ``{model: state_dict, optimizer, epoch, loss,
train_history, args}`` via torch.save (reference torch_train.py:308-316).
``import_torch_snapshot`` loads such a file and transplants the model weights
into the matching flax param tree so a user of the reference can continue
training or run tiled inference here without retraining.

Conversion rules: conv OIHW -> HWIO; ConvTranspose IOHW -> HWOI (flax
``transpose_kernel=True`` layout); BatchNorm weight/bias -> scale/bias params
and running mean/var -> batch_stats. Name mapping is structural: the flax
trees were designed to mirror the torch module paths, so a small per-model
path table suffices.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _conv(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"])
    out = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    if prefix + ".bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[prefix + ".bias"]))
    return out


def _deconv(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"])  # torch (in, out, kh, kw)
    out = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}  # (kh,kw,out,in)
    if prefix + ".bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[prefix + ".bias"]))
    return out


def _bn(sd, prefix):
    p = {"scale": jnp.asarray(np.asarray(sd[prefix + ".weight"])),
         "bias": jnp.asarray(np.asarray(sd[prefix + ".bias"]))}
    s = {"mean": jnp.asarray(np.asarray(sd[prefix + ".running_mean"])),
         "var": jnp.asarray(np.asarray(sd[prefix + ".running_var"]))}
    return p, s


def _transplant_unet(sd, params, stats):
    def fill_double(tp, node, snode):
        node["conv0"]["Conv_0"] = _conv(sd, tp + ".conv.0")
        p, s = _bn(sd, tp + ".conv.1")
        node["bn0"], snode["bn0"] = p, s
        node["conv1"]["Conv_0"] = _conv(sd, tp + ".conv.3")
        p, s = _bn(sd, tp + ".conv.4")
        node["bn1"], snode["bn1"] = p, s

    fill_double("inc.conv", params["inc"], stats["inc"])
    for i in range(1, 5):
        fill_double(f"down{i}.mpconv.1", params[f"down{i}"], stats[f"down{i}"])
    for i in range(1, 5):
        fill_double(f"up{i}.conv", params[f"up{i}"]["conv"],
                    stats[f"up{i}"]["conv"])
    params["outc"]["Conv_0"] = _conv(sd, "outc.conv")


def _transplant_zf_unet(sd, params, stats):
    names = ["conv_224", "conv_112", "conv_56", "conv_28", "conv_14", "conv_7",
             "up_conv_14", "up_conv_28", "up_conv_56", "up_conv_112",
             "up_conv_224"]
    for name in names:
        node, snode = params[name], stats[name]
        for i, (conv_attr, bn_attr) in enumerate([("l1", "l1"), ("l2", "l2")]):
            node[f"conv{i}"]["Conv_0"] = _conv(sd, f"{name}.{conv_attr}.conv")
            p, s = _bn(sd, f"{name}.{bn_attr}.bn")
            node[f"bn{i}"], snode[f"bn{i}"] = p, s
    params["conv_final"]["Conv_0"] = _conv(sd, "conv_final")


def _transplant_resnet_encoder(sd, prefix_map, params, stats, layers,
                               bottleneck=False):
    """Map torchvision-style resnet keys (with arbitrary name prefixes, e.g.
    LinkNet34's firstconv/encoderN attributes) into a ResNetEncoder tree."""
    params["conv1"]["Conv_0"] = _conv(sd, prefix_map["conv1"])
    p, s = _bn(sd, prefix_map["bn1"])
    params["bn1"], stats["bn1"] = p, s

    n_convs = 3 if bottleneck else 2
    for li, n_blocks in enumerate(layers):
        layer = li + 1
        lp = prefix_map[f"layer{layer}"]
        for b in range(n_blocks):
            tp = f"{lp}.{b}"
            name = f"layer{layer}_{b}"
            for ci in range(1, n_convs + 1):
                params[name][f"conv{ci}"]["Conv_0"] = _conv(sd, f"{tp}.conv{ci}")
                p, s = _bn(sd, f"{tp}.bn{ci}")
                params[name][f"bn{ci}"], stats[name][f"bn{ci}"] = p, s
            if f"{tp}.downsample.0.weight" in sd:
                params[name]["downsample_conv"]["Conv_0"] = _conv(
                    sd, f"{tp}.downsample.0")
                p, s = _bn(sd, f"{tp}.downsample.1")
                params[name]["downsample_bn"], stats[name]["downsample_bn"] = p, s


def _transplant_linknet34(sd, params, stats):
    """LinkNet34 (reference lib/models/linknet.py): resnet34 encoder under
    firstconv/firstbn/encoder1-4, InPlaceABN decoders, deconv head."""
    enc_map = {"conv1": "firstconv", "bn1": "firstbn"}
    for i in range(1, 5):
        enc_map[f"layer{i}"] = f"encoder{i}"
    _transplant_resnet_encoder(sd, enc_map, params["encoder"],
                               stats["encoder"], (3, 4, 6, 3))

    def abn(node, snode, key, tp):
        # reference InPlaceABN module stores weight/bias + running buffers
        node[key] = {"scale": jnp.asarray(np.asarray(sd[tp + ".weight"])),
                     "bias": jnp.asarray(np.asarray(sd[tp + ".bias"]))}
        snode[key] = {"mean": jnp.asarray(np.asarray(sd[tp + ".running_mean"])),
                      "var": jnp.asarray(np.asarray(sd[tp + ".running_var"]))}

    for i in range(1, 5):
        dp, ds = params[f"decoder{i}"], stats[f"decoder{i}"]
        tp = f"decoder{i}"
        dp["conv1"]["Conv_0"] = _conv(sd, f"{tp}.conv1")
        abn(dp, ds, "n1_abn", f"{tp}.abn1")
        dp["deconv2"]["ConvTranspose_0"] = _deconv(sd, f"{tp}.deconv2")
        abn(dp, ds, "n2_abn", f"{tp}.abn2")
        dp["conv3"]["Conv_0"] = _conv(sd, f"{tp}.conv3")
        abn(dp, ds, "n3_abn", f"{tp}.abn3")

    params["finaldeconv1"]["ConvTranspose_0"] = _deconv(sd, "finaldeconv1")
    params["finalconv2"]["Conv_0"] = _conv(sd, "finalconv2")
    params["finalconv3"]["Conv_0"] = _conv(sd, "finalconv3")


def _transplant_ternaus(sd, params, stats, vgg16: bool):
    """UNet11/UNet16 (reference unet11.py:51-122, unet16.py:52-131): VGG
    encoder stages are Sequentials of (conv, relu) pairs; decoder blocks are
    block = Sequential(ConvRelu, ConvTranspose2d, ReLU)."""
    # index of each conv inside the stage Sequential (relu layers interleave)
    stage_convs = (
        {"conv1": [0, 2], "conv2": [0, 2], "conv3": [0, 2, 4],
         "conv4": [0, 2, 4], "conv5": [0, 2, 4]}
        if vgg16 else
        {"conv1": [0], "conv2": [0], "conv3": [0, 2],
         "conv4": [0, 2], "conv5": [0, 2]}
    )
    for stage, idxs in stage_convs.items():
        for i, li in enumerate(idxs):
            params[stage][f"conv{i}"]["Conv_0"] = _conv(sd, f"{stage}.{li}")

    for name in ("center", "dec5", "dec4", "dec3", "dec2"):
        params[name]["convrelu"]["conv"]["Conv_0"] = _conv(sd, f"{name}.block.0.conv")
        params[name]["deconv"]["ConvTranspose_0"] = _deconv(sd, f"{name}.block.1")
    params["dec1"]["conv"]["Conv_0"] = _conv(sd, "dec1.conv")
    params["final"]["Conv_0"] = _conv(sd, "final")


def _transplant_unet11(sd, params, stats):
    _transplant_ternaus(sd, params, stats, vgg16=False)


def _transplant_unet16(sd, params, stats):
    _transplant_ternaus(sd, params, stats, vgg16=True)


_TRANSPLANTS = {
    "unet": _transplant_unet,
    "zf_unet": _transplant_zf_unet,
    "linknet34": _transplant_linknet34,
    "unet11": _transplant_unet11,
    "unet16": _transplant_unet16,
}


def transplant_state_dict(model_name: str, state_dict, variables) -> Tuple[Dict, Dict]:
    """(params, batch_stats) with the torch weights transplanted in.

    ``variables``: the flax variables of the target model (for tree shape).
    Raises KeyError for models without a mapping yet.
    """
    name = model_name.lower()
    if name not in _TRANSPLANTS:
        raise KeyError(
            f"no torch transplant mapping for '{model_name}' yet; "
            f"available: {sorted(_TRANSPLANTS)}"
        )
    params = jax.tree_util.tree_map(lambda v: v, variables["params"])
    stats = jax.tree_util.tree_map(lambda v: v, variables.get("batch_stats", {}))
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in state_dict.items()}
    _TRANSPLANTS[name](sd, params, stats)
    return params, stats


def import_torch_snapshot(model_name: str, snapshot_file: str, variables):
    """Load a reference ``*_checkpoint.pth``/``*_snapshot.pth`` and return
    (params, batch_stats, meta) — meta = {epoch, loss, train_history, args}."""
    import torch

    ckpt = torch.load(snapshot_file, map_location="cpu", weights_only=False)
    params, stats = transplant_state_dict(model_name, ckpt["model"], variables)
    meta = {k: ckpt.get(k) for k in ("epoch", "loss", "train_history", "args")}
    return params, stats, meta
