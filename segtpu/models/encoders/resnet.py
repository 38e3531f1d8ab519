"""ResNet encoder family (NHWC Flax): resnet34/101/152, dilated variants.

Covers the reference's torchvision encoders (linknet.py:39, gcn152.py:69/125,
psp_net.py:50, duc_hdc.py:27/67) and the dilated ResNet
(dilated_resnet.py:111-232) with per-block dilation overrides used by
DUC-HDC's hybrid dilation cycles (duc_hdc.py:83-90).

Pretrained ImageNet weights: torch ``state_dict`` files can be converted to
these NHWC params via :func:`convert_torch_resnet` (OIHW -> HWIO transpose);
there is no network fetch (zero-egress TPU pods) — pass a local ``.pth`` via
the harness ``--encoder-weights`` flag, else encoders init randomly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from segtpu.models.layers import BatchNormTorch, Conv


class BasicBlock(nn.Module):
    """3x3-3x3 residual block (expansion 1)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    previous_dilation: int = 1
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = Conv(self.planes, 3, stride=self.stride, padding=self.dilation,
                 dilation=self.dilation, use_bias=False, dtype=self.dtype,
                 name="conv1")(x)
        y = BatchNormTorch(self.planes, name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.planes, 3, padding=self.previous_dilation,
                 dilation=self.previous_dilation, use_bias=False,
                 dtype=self.dtype, name="conv2")(y)
        y = BatchNormTorch(self.planes, name="bn2")(y, use_running_average=not train)
        if self.downsample:
            residual = Conv(self.planes, 1, stride=self.stride, padding=0,
                            use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = BatchNormTorch(self.planes, name="downsample_bn")(
                residual, use_running_average=not train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1-3x3-1x1 residual block (expansion 4). The stride sits on the 3x3
    (torchvision v1.5+/'resnet B' style used by the reference's model-zoo
    weights)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    downsample_stride: Optional[int] = None
    dtype: Optional[jnp.dtype] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out_planes = self.planes * self.expansion
        y = Conv(self.planes, 1, padding=0, use_bias=False, dtype=self.dtype,
                 name="conv1")(x)
        y = BatchNormTorch(self.planes, name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.planes, 3, stride=self.stride, padding=self.dilation,
                 dilation=self.dilation, use_bias=False, dtype=self.dtype,
                 name="conv2")(y)
        y = BatchNormTorch(self.planes, name="bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(out_planes, 1, padding=0, use_bias=False, dtype=self.dtype,
                 name="conv3")(y)
        y = BatchNormTorch(out_planes, name="bn3")(y, use_running_average=not train)
        if self.downsample:
            ds = self.downsample_stride if self.downsample_stride is not None else self.stride
            residual = Conv(out_planes, 1, stride=ds, padding=0, use_bias=False,
                            dtype=self.dtype, name="downsample_conv")(x)
            residual = BatchNormTorch(out_planes, name="downsample_bn")(
                residual, use_running_average=not train)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """Feature-pyramid ResNet.

    ``__call__`` returns (stem, e1, e2, e3, e4):
      stem = relu(bn(conv7x7 s2)) at 1/2 resolution (pre-maxpool);
      e1..e4 = layer1..layer4 outputs.

    ``layer3_dilations`` / ``layer4_dilations``: optional per-block dilation
    schedules; when set, those layers use stride 1 (dilated network, output
    stride 8 — psp_net.py:53-62, duc_hdc.py:36-49, 76-90,
    dilated_resnet.py:146-150).
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    bottleneck: bool = False
    layer3_dilations: Optional[Sequence[int]] = None
    layer4_dilations: Optional[Sequence[int]] = None
    deep_dilation_mode: bool = False  # dilated_resnet.py: previous_dilation handling
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = Bottleneck if self.bottleneck else BasicBlock
        expansion = 4 if self.bottleneck else 1

        y = Conv(64, 7, stride=2, padding=3, use_bias=False, dtype=self.dtype,
                 name="conv1")(x)
        y = BatchNormTorch(64, name="bn1")(y, use_running_average=not train)
        stem = nn.relu(y)
        y = nn.max_pool(stem, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = []
        in_planes = 64
        for li, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            layer_idx = li + 1
            dilations = None
            if layer_idx == 3 and self.layer3_dilations is not None:
                dilations = self.layer3_dilations
            if layer_idx == 4 and self.layer4_dilations is not None:
                dilations = self.layer4_dilations

            default_stride = 1 if layer_idx == 1 else 2
            stride = 1 if dilations is not None else default_stride

            for b in range(n_blocks):
                d = 1
                if dilations is not None:
                    d = dilations[b % len(dilations)]
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or in_planes != planes * expansion)
                if self.bottleneck:
                    y = Bottleneck(
                        planes, stride=s, dilation=d, downsample=need_ds,
                        downsample_stride=s, dtype=self.dtype,
                        name=f"layer{layer_idx}_{b}",
                    )(y, train)
                else:
                    # DilatedResNet first-block rule (dilated_resnet.py:178-185):
                    # conv1 dilation 1 for d<=2, d//2 for d==4; conv2 keeps d.
                    conv1_d = d
                    if dilations is not None and b == 0 and len(dilations) == 1:
                        conv1_d = 1 if d <= 2 else d // 2
                    y = BasicBlock(
                        planes, stride=s, dilation=conv1_d, previous_dilation=d,
                        downsample=need_ds, dtype=self.dtype,
                        name=f"layer{layer_idx}_{b}",
                    )(y, train)
            in_planes = planes * expansion
            feats.append(y)

        e1, e2, e3, e4 = feats
        return stem, e1, e2, e3, e4


def resnet34(dilated: bool = False, dtype=None) -> ResNetEncoder:
    """ResNet-34; ``dilated`` gives the stride-8 dilation-2/4 variant
    (reference dilated_resnet34, dilated_resnet.py:222-232)."""
    return ResNetEncoder(
        layers=(3, 4, 6, 3), bottleneck=False,
        layer3_dilations=(2,) if dilated else None,
        layer4_dilations=(4,) if dilated else None,
        dtype=dtype,
    )


def resnet101(dilated: bool = False, dtype=None) -> ResNetEncoder:
    return ResNetEncoder(
        layers=(3, 4, 23, 3), bottleneck=True,
        layer3_dilations=(2,) if dilated else None,
        layer4_dilations=(4,) if dilated else None,
        dtype=dtype,
    )


def resnet152(dilated: bool = False, hdc: bool = False, dtype=None) -> ResNetEncoder:
    """ResNet-152; ``dilated``: DUC dilation 2/4 (duc_hdc.py:36-49);
    ``hdc``: hybrid dilation cycles [1,2,5,9] / [5,9,17] (duc_hdc.py:83-90)."""
    l3 = l4 = None
    if hdc:
        l3, l4 = (1, 2, 5, 9), (5, 9, 17)
    elif dilated:
        l3, l4 = (2,), (4,)
    return ResNetEncoder(
        layers=(3, 8, 36, 3), bottleneck=True,
        layer3_dilations=l3, layer4_dilations=l4, dtype=dtype,
    )


# ---------------------------------------------------------------------------
# torch state_dict conversion (pretrained ImageNet weights from a local file)
# ---------------------------------------------------------------------------

def convert_torch_resnet(state_dict, layers: Sequence[int], bottleneck: bool):
    """torchvision ResNet ``state_dict`` -> (params, batch_stats) for
    :class:`ResNetEncoder`. Conv kernels transpose OIHW -> HWIO."""
    import numpy as np

    def k(name):
        w = np.asarray(state_dict[name])
        return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))

    def bn(prefix):
        return (
            {"scale": jnp.asarray(np.asarray(state_dict[prefix + ".weight"])),
             "bias": jnp.asarray(np.asarray(state_dict[prefix + ".bias"]))},
            {"mean": jnp.asarray(np.asarray(state_dict[prefix + ".running_mean"])),
             "var": jnp.asarray(np.asarray(state_dict[prefix + ".running_var"]))},
        )

    params = {"conv1": {"Conv_0": {"kernel": k("conv1.weight")}}}
    stats = {}
    p, s = bn("bn1")
    params["bn1"] = p
    stats["bn1"] = s

    n_convs = 3 if bottleneck else 2
    for li, n_blocks in enumerate(layers):
        layer = li + 1
        for b in range(n_blocks):
            tp = f"layer{layer}.{b}"
            name = f"layer{layer}_{b}"
            blk_p, blk_s = {}, {}
            for ci in range(1, n_convs + 1):
                blk_p[f"conv{ci}"] = {"Conv_0": {"kernel": k(f"{tp}.conv{ci}.weight")}}
                bp, bs = bn(f"{tp}.bn{ci}")
                blk_p[f"bn{ci}"] = bp
                blk_s[f"bn{ci}"] = bs
            if f"{tp}.downsample.0.weight" in state_dict:
                blk_p["downsample_conv"] = {
                    "Conv_0": {"kernel": k(f"{tp}.downsample.0.weight")}
                }
                bp, bs = bn(f"{tp}.downsample.1")
                blk_p["downsample_bn"] = bp
                blk_s["downsample_bn"] = bs
            params[name] = blk_p
            stats[name] = blk_s
    return params, stats
