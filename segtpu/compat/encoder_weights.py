"""Pretrained-encoder loading from local torch weight files.

The reference's pretrained-encoder models genuinely load ImageNet weights at
construction (linknet.py:39 ``resnet34(pretrained=True)``,
dilated_resnet.py:8-14 model-zoo URLs, psp_net.py:50, duc_hdc.py:27/67,
gcn152.py:69/125; unet11.py:65 / unet16.py gate on ``pretrained == 'vgg'``).
TPU pods are zero-egress, so here the harness takes a *local* torch
``state_dict`` file via ``--encoder-weights <file.pth>`` and transplants it
into the model's encoder subtree (OIHW -> HWIO conv transpose, BN params +
running stats).

Accepted file contents: a raw torchvision-format ``state_dict`` (classifier
heads like ``fc.*`` are ignored) or a dict wrapping one under ``state_dict``
or ``model``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class EncoderSpec:
    """How a registry model consumes pretrained encoder weights.

    ``kind``: 'resnet' (torchvision conv1/bn1/layerN naming) or 'vgg'
    (torchvision ``features.N`` naming).
    ``paths``: subtree paths (into params/batch_stats) the converted encoder
    weights land in; also the freeze set for ``--freeze-encoder``.
    """

    kind: str
    paths: Tuple[Tuple[str, ...], ...]
    layers: Optional[Sequence[int]] = None
    bottleneck: bool = False
    arch: Optional[str] = None  # vgg11 | vgg16


_VGG_STAGES = (("conv1",), ("conv2",), ("conv3",), ("conv4",), ("conv5",))

ENCODER_SPECS: Dict[str, EncoderSpec] = {
    # reference lib/models/linknet.py:39 resnet34(pretrained=True)
    "linknet34": EncoderSpec("resnet", (("encoder",),), layers=(3, 4, 6, 3)),
    # reference dilated_linknet.py:48 dilated_resnet34 (same torchvision keys)
    "dilated_linknet34": EncoderSpec(
        "resnet", (("linknet", "encoder"),), layers=(3, 4, 6, 3)),
    # AlbuNet (BASELINE.json config #3): resnet34 encoder, same torchvision keys
    "albunet": EncoderSpec("resnet", (("encoder",),), layers=(3, 4, 6, 3)),
    # reference gcn152.py:69 resnet34 / :125 resnet152
    "gcn34": EncoderSpec("resnet", (("encoder",),), layers=(3, 4, 6, 3)),
    "gcn": EncoderSpec("resnet", (("encoder",),), layers=(3, 8, 36, 3),
                       bottleneck=True),
    # reference psp_net.py:50 resnet101
    "psp_net": EncoderSpec("resnet", (("encoder",),), layers=(3, 4, 23, 3),
                           bottleneck=True),
    # reference duc_hdc.py:27/67 resnet152
    "duc": EncoderSpec("resnet", (("encoder",),), layers=(3, 8, 36, 3),
                       bottleneck=True),
    "duc_dc": EncoderSpec("resnet", (("encoder",),), layers=(3, 8, 36, 3),
                          bottleneck=True),
    # reference unet11.py:65 / unet16.py: VGG .features encoders
    "unet11": EncoderSpec("vgg", _VGG_STAGES, arch="vgg11"),
    "unet16": EncoderSpec("vgg", _VGG_STAGES, arch="vgg16"),
}


def encoder_paths(model_name: str, params) -> Tuple[Tuple[str, ...], ...]:
    """The param-tree paths that form the model's encoder (for freezing /
    weight loading). Falls back to a top-level ``encoder`` subtree when the
    model has no spec but does have one (e.g. linknext's scratch encoder)."""
    spec = ENCODER_SPECS.get(model_name.lower())
    if spec is not None:
        return spec.paths
    if "encoder" in params:
        return (("encoder",),)
    return ()


def _subtree(tree, path):
    node = tree
    for key in path:
        if node is None or key not in node:
            return None
        node = node[key]
    return node


def _merge_into(dst, src, where=""):
    """Recursively overwrite dst's leaves with src's (src must be a
    sub-structure of dst; leaf shapes must match).

    Grayscale adaptation: a first-layer conv kernel whose input-channel dim
    (HWIO axis 2) is 3 in the file but 1 in the model is collapsed by
    summing over RGB — for replicated-gray inputs the response is identical
    to the RGB stem's, so ImageNet stems stay useful under ``-g``."""
    for key, value in src.items():
        if key not in dst:
            raise KeyError(f"encoder weights key '{where}/{key}' not in model tree "
                           f"(have: {sorted(dst)})")
        if isinstance(value, dict):
            _merge_into(dst[key], value, f"{where}/{key}")
        else:
            have = np.shape(dst[key])
            want = np.shape(value)
            if (key == "kernel" and len(have) == 4 and len(want) == 4
                    and have[3] == want[3] and have[2] == 1 and want[2] == 3):
                value = value.sum(axis=2, keepdims=True)
                want = np.shape(value)
            if tuple(have) != tuple(want):
                raise ValueError(
                    f"encoder weight '{where}/{key}' shape {want} does not match "
                    f"model {have} — wrong architecture file?")
            dst[key] = value


def _unwrap_state_dict(obj):
    if hasattr(obj, "keys") and any(
        hasattr(v, "shape") or hasattr(v, "numpy") for v in obj.values()
    ):
        # looks like a raw state_dict already
        if not any(k in obj for k in ("state_dict", "model")):
            return obj
    for key in ("state_dict", "model"):
        if key in obj:
            return obj[key]
    return obj


def load_torch_state_dict(path: str):
    """torch.load a .pth and return a numpy-valued flat state_dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = _unwrap_state_dict(obj)
    return {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in sd.items()}


def convert_encoder_state_dict(model_name: str, state_dict):
    """torch state_dict -> (params_subtrees, stats_subtrees) keyed by path."""
    name = model_name.lower()
    spec = ENCODER_SPECS.get(name)
    if spec is None:
        raise KeyError(
            f"model '{model_name}' takes no pretrained encoder weights; "
            f"supported: {sorted(ENCODER_SPECS)}")
    if spec.kind == "resnet":
        from segtpu.models.encoders.resnet import convert_torch_resnet
        p, s = convert_torch_resnet(state_dict, spec.layers, spec.bottleneck)
        return {spec.paths[0]: p}, {spec.paths[0]: s}
    # vgg: one subtree per encoder stage, no batch stats
    from segtpu.models.ternaus import convert_torch_vgg_features
    stages = convert_torch_vgg_features(state_dict, spec.arch)
    return {(stage,): stages[stage] for stage in stages}, {}


def install_encoder_weights(model_name: str, params, batch_stats,
                            weights_file: str):
    """Load ``weights_file`` and return (params, batch_stats) with the
    encoder subtree(s) replaced. Trees are shallow-copied along updated
    paths; untouched subtrees are shared."""
    import jax
    from flax.core import unfreeze

    sd = load_torch_state_dict(weights_file)
    p_sub, s_sub = convert_encoder_state_dict(model_name, sd)

    # unfreeze (FrozenDict -> dict), then tree_map to build fresh mutable
    # containers so in-place merging can't alias the caller's tree
    params = jax.tree_util.tree_map(lambda v: v, unfreeze(params))
    batch_stats = jax.tree_util.tree_map(lambda v: v, unfreeze(batch_stats))
    for path, subtree in p_sub.items():
        dst = _subtree(params, path)
        if dst is None:
            raise KeyError(f"model '{model_name}' has no params subtree {path}")
        _merge_into(dst, subtree, "/".join(path))
    for path, subtree in s_sub.items():
        dst = _subtree(batch_stats, path)
        if dst is None:
            raise KeyError(f"model '{model_name}' has no batch_stats subtree {path}")
        _merge_into(dst, subtree, "/".join(path))
    return params, batch_stats
