"""Import torch reference checkpoints / state_dicts into segtpu models.

The reference saves ``{model: state_dict, optimizer, epoch, loss,
train_history, args}`` via torch.save (reference torch_train.py:308-316).
``import_torch_snapshot`` loads such a file and transplants the model weights
into the matching flax param tree so a user of the reference can continue
training or run tiled inference here without retraining. The bridge is
bidirectional: ``export_state_dict`` emits a torch-format state_dict from a
segtpu tree.

Conversion rules: conv OIHW -> HWIO; ConvTranspose IOHW -> HWOI (flax
``transpose_kernel=True`` layout); BatchNorm/InPlaceABN weight/bias ->
scale/bias params and running mean/var -> batch_stats. Every registry model
has a declarative mapping table of (kind, torch_prefix, flax_path) entries;
one generic applier handles all models with leaf-shape validation.

Known deliberate divergences (documented in the model files): the upstream
DilatedLinkNet34 and LinkNext are unrunnable as written (decoder/skip shape
errors); our fixed variants replace some stride-2 deconvs with 3x3 convs, so
those specific kernels do not round-trip to upstream's (no upstream
checkpoints can exist for them anyway).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Entry = Tuple[str, str, Tuple[str, ...]]  # (kind, torch_prefix, flax_path)
# kinds: conv | deconv | bn ; optional entries end with '?'


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


# ---------------------------------------------------------------------------
# mapping tables
# ---------------------------------------------------------------------------

def _entries_double_conv(tp: str, fp: Tuple[str, ...], abn: bool) -> List[Entry]:
    """reference unet.py double_conv Sequential: BN flavor indexes
    (conv 0, bn 1, conv 3, bn 4); ABN flavor (conv 0, abn 1, conv 2, abn 3)."""
    if abn:
        idx = [("conv", 0, "conv0"), ("bn", 1, "abn0"),
               ("conv", 2, "conv1"), ("bn", 3, "abn1")]
    else:
        idx = [("conv", 0, "conv0"), ("bn", 1, "bn0"),
               ("conv", 3, "conv1"), ("bn", 4, "bn1")]
    out: List[Entry] = []
    for kind, i, name in idx:
        path = fp + ((name, "Conv_0") if kind == "conv" else (name,))
        out.append((kind, f"{tp}.{i}", path))
    return out


def _entries_unet(root: Tuple[str, ...] = (), abn: bool = False) -> List[Entry]:
    """reference lib/models/unet.py:80-107 / unet_abn.py."""
    E = _entries_double_conv("inc.conv.conv", root + ("inc",), abn)
    for i in range(1, 5):
        E += _entries_double_conv(f"down{i}.mpconv.1.conv",
                                  root + (f"down{i}",), abn)
    for i in range(1, 5):
        E += _entries_double_conv(f"up{i}.conv.conv",
                                  root + (f"up{i}", "conv"), abn)
    E.append(("conv", "outc.conv", root + ("outc", "Conv_0")))
    return E


def _entries_zf_unet() -> List[Entry]:
    """reference lib/models/zf_unet.py:35-95."""
    names = ["conv_224", "conv_112", "conv_56", "conv_28", "conv_14", "conv_7",
             "up_conv_14", "up_conv_28", "up_conv_56", "up_conv_112",
             "up_conv_224"]
    E: List[Entry] = []
    for name in names:
        for i, attr in enumerate(("l1", "l2")):
            E.append(("conv", f"{name}.{attr}.conv",
                      (name, f"conv{i}", "Conv_0")))
            E.append(("bn", f"{name}.{attr}.bn", (name, f"bn{i}")))
    E.append(("conv", "conv_final", ("conv_final", "Conv_0")))
    return E


def _entries_resnet_encoder(prefix_map: Dict[str, str], layers, bottleneck,
                            root: Tuple[str, ...] = ("encoder",)) -> List[Entry]:
    """torchvision-style resnet keys under arbitrary attribute prefixes
    (LinkNet34's firstconv/encoderN, GCN/PSP/DUC's layer0/layerN)."""
    E: List[Entry] = [
        ("conv", prefix_map["conv1"], root + ("conv1", "Conv_0")),
        ("bn", prefix_map["bn1"], root + ("bn1",)),
    ]
    n_convs = 3 if bottleneck else 2
    for li, n_blocks in enumerate(layers):
        lp = prefix_map[f"layer{li + 1}"]
        for b in range(n_blocks):
            tp = f"{lp}.{b}"
            name = root + (f"layer{li + 1}_{b}",)
            for ci in range(1, n_convs + 1):
                E.append(("conv", f"{tp}.conv{ci}", name + (f"conv{ci}", "Conv_0")))
                E.append(("bn", f"{tp}.bn{ci}", name + (f"bn{ci}",)))
            E.append(("conv?", f"{tp}.downsample.0",
                      name + ("downsample_conv", "Conv_0")))
            E.append(("bn?", f"{tp}.downsample.1", name + ("downsample_bn",)))
    return E


def _linknet_enc_map() -> Dict[str, str]:
    m = {"conv1": "firstconv", "bn1": "firstbn"}
    for i in range(1, 5):
        m[f"layer{i}"] = f"encoder{i}"
    return m


def _entries_linknet34() -> List[Entry]:
    """reference lib/models/linknet.py:33-90 (InPlaceABN decoders)."""
    E = _entries_resnet_encoder(_linknet_enc_map(), (3, 4, 6, 3), False)
    for i in range(1, 5):
        tp, fp = f"decoder{i}", (f"decoder{i}",)
        E += [
            ("conv", f"{tp}.conv1", fp + ("conv1", "Conv_0")),
            ("bn", f"{tp}.abn1", fp + ("n1_abn",)),
            ("deconv", f"{tp}.deconv2", fp + ("deconv2", "ConvTranspose_0")),
            ("bn", f"{tp}.abn2", fp + ("n2_abn",)),
            ("conv", f"{tp}.conv3", fp + ("conv3", "Conv_0")),
            ("bn", f"{tp}.abn3", fp + ("n3_abn",)),
        ]
    E += [
        ("deconv", "finaldeconv1", ("finaldeconv1", "ConvTranspose_0")),
        ("conv", "finalconv2", ("finalconv2", "Conv_0")),
        ("conv", "finalconv3", ("finalconv3", "Conv_0")),
    ]
    return E


def _entries_dilated_linknet34() -> List[Entry]:
    """reference lib/models/dilated_linknet.py:42-99 (plain-BN decoders over
    dilated_resnet34). Upstream decoder4/3 deconvs are the shape bug that
    makes the module unrunnable; our fixed variant uses 3x3 convs there, so
    those two kernels map on our side only (export/import round-trips within
    segtpu; no upstream checkpoint exists to conflict)."""
    root = ("linknet",)
    E = _entries_resnet_encoder(_linknet_enc_map(), (3, 4, 6, 3), False,
                                root=root + ("encoder",))
    for i in range(1, 5):
        tp, fp = f"decoder{i}", root + (f"decoder{i}",)
        stride1 = i in (3, 4)  # deep decoders keep stride 1 (conscious fix)
        E += [
            ("conv", f"{tp}.conv1", fp + ("conv1", "Conv_0")),
            ("bn", f"{tp}.norm1", fp + ("n1_bn",)),
            ("conv" if stride1 else "deconv", f"{tp}.deconv2",
             fp + ("deconv2", "Conv_0" if stride1 else "ConvTranspose_0")),
            ("bn", f"{tp}.norm2", fp + ("n2_bn",)),
            ("conv", f"{tp}.conv3", fp + ("conv3", "Conv_0")),
            ("bn", f"{tp}.norm3", fp + ("n3_bn",)),
        ]
    E += [
        ("deconv", "finaldeconv1", root + ("finaldeconv1", "ConvTranspose_0")),
        ("conv", "finalconv2", root + ("finalconv2", "Conv_0")),
        ("conv", "finalconv3", root + ("finalconv3", "Conv_0")),
    ]
    return E


def _entries_ternaus(vgg16: bool) -> List[Entry]:
    """reference unet11.py:51-122 / unet16.py:52-131."""
    stage_convs = (
        {"conv1": [0, 2], "conv2": [0, 2], "conv3": [0, 2, 4],
         "conv4": [0, 2, 4], "conv5": [0, 2, 4]}
        if vgg16 else
        {"conv1": [0], "conv2": [0], "conv3": [0, 2],
         "conv4": [0, 2], "conv5": [0, 2]}
    )
    E: List[Entry] = []
    for stage, idxs in stage_convs.items():
        for i, li in enumerate(idxs):
            E.append(("conv", f"{stage}.{li}", (stage, f"conv{i}", "Conv_0")))
    for name in ("center", "dec5", "dec4", "dec3", "dec2"):
        E.append(("conv", f"{name}.block.0.conv",
                  (name, "convrelu", "conv", "Conv_0")))
        E.append(("deconv", f"{name}.block.1",
                  (name, "deconv", "ConvTranspose_0")))
    E.append(("conv", "dec1.conv", ("dec1", "conv", "Conv_0")))
    E.append(("conv", "final", ("final", "Conv_0")))
    return E


def _entries_tiramisu(down_blocks, up_blocks, bottleneck_layers) -> List[Entry]:
    """reference lib/models/tiramisu.py:93-205."""
    E: List[Entry] = [("conv", "firstconv", ("firstconv", "Conv_0"))]

    def dense(tp, fp, n):
        for j in range(n):
            E.append(("bn", f"{tp}.layers.{j}.norm", fp + (f"layer{j}", "norm")))
            E.append(("conv", f"{tp}.layers.{j}.conv",
                      fp + (f"layer{j}", "conv", "Conv_0")))

    for i, n in enumerate(down_blocks):
        dense(f"denseBlocksDown.{i}", (f"denseDown{i}",), n)
        E.append(("bn", f"transDownBlocks.{i}.norm", (f"transDown{i}", "norm")))
        E.append(("conv", f"transDownBlocks.{i}.conv",
                  (f"transDown{i}", "conv", "Conv_0")))
    dense("bottleneck.bottleneck", ("bottleneck",), bottleneck_layers)
    for i, n in enumerate(up_blocks):
        E.append(("deconv", f"transUpBlocks.{i}.convTrans",
                  (f"transUp{i}", "convTrans", "ConvTranspose_0")))
        dense(f"denseBlocksUp.{i}", (f"denseUp{i}",), n)
    E.append(("conv", "finalConv", ("finalConv", "Conv_0")))
    return E


def _entries_gcn(layers, bottleneck, layer1_prefix="layer1.1") -> List[Entry]:
    """reference gcn152.py:64-167: resnet wrapped as layer0..layer4
    (layer1 = Sequential(maxpool, resnet.layer1) -> prefix layer1.1)."""
    pm = {"conv1": "layer0.0", "bn1": "layer0.1", "layer1": layer1_prefix,
          "layer2": "layer2", "layer3": "layer3", "layer4": "layer4"}
    E = _entries_resnet_encoder(pm, layers, bottleneck)
    for i in range(1, 5):
        for leg in ("conv_l1", "conv_l2", "conv_r1", "conv_r2"):
            E.append(("conv", f"gcm{i}.{leg}", (f"gcm{i}", leg, "Conv_0")))
    for i in range(1, 10):
        E.append(("conv", f"brm{i}.conv1", (f"brm{i}", "conv1", "Conv_0")))
        E.append(("conv", f"brm{i}.conv2", (f"brm{i}", "conv2", "Conv_0")))
    return E


def _entries_psp() -> List[Entry]:
    """reference psp_net.py:42-96 (resnet101; layer0 holds conv1/bn1/maxpool)."""
    pm = {"conv1": "layer0.0", "bn1": "layer0.1", "layer1": "layer1",
          "layer2": "layer2", "layer3": "layer3", "layer4": "layer4"}
    E = _entries_resnet_encoder(pm, (3, 4, 23, 3), True)
    for idx, s in enumerate((1, 2, 3, 6)):
        E.append(("conv", f"ppm.features.{idx}.1", ("ppm", f"conv_{s}", "Conv_0")))
        E.append(("bn", f"ppm.features.{idx}.2", ("ppm", f"bn_{s}")))
    E += [
        ("conv", "final.0", ("final_conv", "Conv_0")),
        ("bn", "final.1", ("final_bn",)),
        ("conv", "final.4", ("final_cls", "Conv_0")),
        ("conv?", "aux_logits", ("aux_logits", "Conv_0")),
    ]
    return E


def _entries_duc() -> List[Entry]:
    """reference duc_hdc.py:24-101 (resnet152 under layer0..layer4)."""
    pm = {"conv1": "layer0.0", "bn1": "layer0.1", "layer1": "layer1",
          "layer2": "layer2", "layer3": "layer3", "layer4": "layer4"}
    E = _entries_resnet_encoder(pm, (3, 8, 36, 3), True)
    E.append(("conv", "duc.conv", ("duc", "conv", "Conv_0")))
    E.append(("bn", "duc.bn", ("duc", "bn")))
    return E


def _entries_linknext() -> List[Entry]:
    """reference linknext.py:227-278 over ResNeXt-26 2x64d (:121-158).
    Upstream decoder1's stride-2 deconv is part of the 4x-output-size bug;
    our fixed decoder1 is a 3x3 conv (see models/linknext.py docstring)."""
    root = ("encoder",)
    E: List[Entry] = [
        ("conv", "encoder0.0", root + ("conv0", "Conv_0")),
        ("bn", "encoder0.1", root + ("bn0",)),
    ]
    for li, nb in enumerate((2, 2, 2, 2)):
        for b in range(nb):
            tp = f"encoder{li + 1}.{b}"
            fp = root + (f"layer{li + 1}_{b}",)
            E += [
                ("conv", f"{tp}.basic.conv1_0", fp + ("conv1_0", "Conv_0")),
                ("bn", f"{tp}.basic.bn1", fp + ("bn1",)),
                ("conv", f"{tp}.basic.conv3_0", fp + ("conv3_0", "Conv_0")),
                ("bn", f"{tp}.basic.bn2", fp + ("bn2",)),
                ("conv", f"{tp}.basic.conv1_1", fp + ("conv1_1", "Conv_0")),
                ("bn", f"{tp}.basic.bn3", fp + ("bn3",)),
                ("conv?", f"{tp}.shortcut.0", fp + ("shortcut", "Conv_0")),
                ("bn", f"{tp}.bn0", fp + ("bn0",)),
            ]
    for i in range(1, 5):
        tp, fp = f"decoder{i}", (f"decoder{i}",)
        stride1 = i == 1
        E += [
            ("conv", f"{tp}.conv1", fp + ("conv1", "Conv_0")),
            ("bn", f"{tp}.norm1", fp + ("norm1",)),
            ("conv" if stride1 else "deconv", f"{tp}.deconv2",
             fp + ("deconv2", "Conv_0" if stride1 else "ConvTranspose_0")),
            ("bn", f"{tp}.norm2", fp + ("norm2",)),
            ("conv", f"{tp}.conv3", fp + ("conv3", "Conv_0")),
            ("bn", f"{tp}.norm3", fp + ("norm3",)),
        ]
    E += [
        ("deconv", "finaldeconv1", ("finaldeconv1", "ConvTranspose_0")),
        ("conv", "finalconv2", ("finalconv2", "Conv_0")),
        ("conv", "finalconv3", ("finalconv3", "Conv_0")),
    ]
    return E


def _entries_squeezenet() -> List[Entry]:
    """reference squeezenet.py:68-151."""
    E: List[Entry] = [("conv", "conv1", ("conv1", "Conv_0"))]
    for i in range(2, 10):
        for leg in ("squeeze", "expand1x1", "expand3x3"):
            E.append(("conv", f"fire{i}.{leg}", (f"fire{i}", leg, "Conv_0")))
    E.append(("conv", "conv10.0", ("conv10", "Conv_0")))
    E.append(("conv", "dconv10.0", ("dconv10", "Conv_0")))
    for i in range(2, 10):
        for leg in ("expand1x1", "expand3x3", "squeeze"):
            E.append(("conv", f"dfire{i}.{leg}", (f"dfire{i}", leg, "Conv_0")))
    E.append(("conv", "dconv1", ("dconv1", "Conv_0")))
    return E


_ENTRY_BUILDERS = {
    "unet": lambda: _entries_unet(),
    "unet_abn": lambda: _entries_unet(root=("unet",), abn=True),
    "zf_unet": _entries_zf_unet,
    "linknet34": _entries_linknet34,
    "dilated_linknet34": _entries_dilated_linknet34,
    "unet11": lambda: _entries_ternaus(False),
    "unet16": lambda: _entries_ternaus(True),
    "tiramisu57": lambda: _entries_tiramisu((4,) * 5, (4,) * 5, 4),
    "tiramisu67": lambda: _entries_tiramisu((5,) * 5, (5,) * 5, 5),
    "tiramisu103": lambda: _entries_tiramisu((4, 5, 7, 10, 12),
                                             (12, 10, 7, 5, 4), 15),
    "gcn": lambda: _entries_gcn((3, 8, 36, 3), True),
    "gcn34": lambda: _entries_gcn((3, 4, 6, 3), False),
    "psp_net": _entries_psp,
    "duc": _entries_duc,
    "duc_dc": _entries_duc,
    "linknext": _entries_linknext,
    "squeezenet": _entries_squeezenet,
}


def model_entries(model_name: str) -> List[Entry]:
    name = model_name.lower()
    if name not in _ENTRY_BUILDERS:
        raise KeyError(
            f"no torch transplant mapping for '{model_name}' yet; "
            f"available: {sorted(_ENTRY_BUILDERS)}"
        )
    return _ENTRY_BUILDERS[name]()


# ---------------------------------------------------------------------------
# generic applier / exporter
# ---------------------------------------------------------------------------

def _get(tree, path):
    node = tree
    for key in path:
        if node is None or key not in node:
            return None
        node = node[key]
    return node


def _set(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node[key]
    node[path[-1]] = value


def _check_shapes(old, new, path):
    if old is None:
        return
    missing = set(old) - set(new)
    if missing:
        raise ValueError(
            f"checkpoint lacks {sorted(missing)} at {'/'.join(path)} "
            f"(bias/affine mismatch with the model definition)")
    for key, value in new.items():
        if key in old:
            have, want = np.shape(old[key]), np.shape(value)
            if tuple(have) != tuple(want):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}/{key}: "
                    f"checkpoint {want} vs model {have}")


def _apply_entries(sd, entries: List[Entry], params, stats):
    for kind, tp, path in entries:
        optional = kind.endswith("?")
        kind = kind.rstrip("?")
        if optional and (_get(params, path[:-1] if kind != "bn" else path) is None
                         or tp + (".weight") not in sd):
            continue
        if kind == "conv":
            new = _conv(sd, tp)
            _check_shapes(_get(params, path), new, path)
            _set(params, path, new)
        elif kind == "deconv":
            new = _deconv(sd, tp)
            _check_shapes(_get(params, path), new, path)
            _set(params, path, new)
        elif kind == "bn":
            p, s = _bn(sd, tp)
            _check_shapes(_get(params, path), p, path)
            _set(params, path, p)
            _set(stats, path, s)
        else:  # pragma: no cover
            raise ValueError(kind)


def transplant_state_dict(model_name: str, state_dict, variables) -> Tuple[Dict, Dict]:
    """(params, batch_stats) with the torch weights transplanted in.

    ``variables``: the flax variables of the target model (for tree shape).
    Raises KeyError for unknown model names.
    """
    from flax.core import unfreeze

    entries = model_entries(model_name)
    params = jax.tree_util.tree_map(lambda v: v, unfreeze(variables["params"]))
    stats = jax.tree_util.tree_map(
        lambda v: v, unfreeze(variables.get("batch_stats", {})))
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in state_dict.items()}
    _apply_entries(sd, entries, params, stats)
    return params, stats


def export_state_dict(model_name: str, params, batch_stats) -> Dict[str, np.ndarray]:
    """Inverse bridge: emit a torch-format state_dict (OIHW numpy arrays)
    from a segtpu param tree, so reference users can take weights back."""
    entries = model_entries(model_name)
    sd: Dict[str, np.ndarray] = {}
    for kind, tp, path in entries:
        optional = kind.endswith("?")
        kind = kind.rstrip("?")
        if kind == "bn":
            p = _get(params, path)
            s = _get(batch_stats, path)
            if p is None:
                if optional:
                    continue
                raise KeyError(path)
            sd[tp + ".weight"] = np.asarray(p["scale"])
            sd[tp + ".bias"] = np.asarray(p["bias"])
            sd[tp + ".running_mean"] = np.asarray(s["mean"])
            sd[tp + ".running_var"] = np.asarray(s["var"])
            continue
        node = _get(params, path)
        if node is None:
            if optional:
                continue
            raise KeyError(path)
        k = np.asarray(node["kernel"])
        # conv HWIO -> OIHW; deconv HWOI -> (in, out, kh, kw): same transpose
        sd[tp + ".weight"] = np.transpose(k, (3, 2, 0, 1))
        if "bias" in node:
            sd[tp + ".bias"] = np.asarray(node["bias"])
    return sd


def import_torch_snapshot(model_name: str, snapshot_file: str, variables):
    """Load a reference ``*_checkpoint.pth``/``*_snapshot.pth`` and return
    (params, batch_stats, meta) — meta = {epoch, loss, train_history, args}."""
    import torch

    ckpt = torch.load(snapshot_file, map_location="cpu", weights_only=False)
    params, stats = transplant_state_dict(model_name, ckpt["model"], variables)
    meta = {k: ckpt.get(k) for k in ("epoch", "loss", "train_history", "args")}
    return params, stats, meta
