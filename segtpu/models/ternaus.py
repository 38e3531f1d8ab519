"""TernausNet: UNet11 (VGG11 encoder) and UNet16 (VGG16 encoder)
(reference lib/models/unet11.py:51-122, unet16.py:52-131).

Registry quirk preserved consciously (SURVEY.md §2.2): the reference harness
passes ``pretrained=True`` but the constructor only loads VGG weights when
``pretrained == 'vgg'`` (unet11.py:65), so the registered models actually run
with random encoder weights. Here ``pretrained='vgg'`` converts a local torch
VGG ``state_dict`` when one is provided (zero-egress pods can't fetch).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from segtpu.models import register
from segtpu.models.layers import Conv, ConvTranspose2dTorch, max_pool


class ConvRelu(nn.Module):
    """conv3x3 + ReLU (reference unet11.py:12-21).

    ``s2d=True`` evaluates in space-to-depth representation (same math,
    dense 128-lane channels — segtpu.ops.s2d); params identical."""

    features: int
    dtype: Optional[jnp.dtype] = None
    s2d: bool = False
    in_perm: Optional[tuple] = None

    @nn.compact
    def __call__(self, x):
        if self.s2d:
            from segtpu.models.layers import S2DConv

            return nn.relu(S2DConv(self.features, 3, dtype=self.dtype,
                                   in_perm=self.in_perm, name="conv")(x))
        return nn.relu(Conv(self.features, 3, padding=1, dtype=self.dtype,
                            name="conv")(x))


class DecoderBlock(nn.Module):
    """ConvRelu -> ConvTranspose2d(k4,s2,p1) -> ReLU (reference unet11.py:23-48).

    ``s2d_out=True``: the deconv emits its output directly in s2d layout at
    input resolution (layers.DeconvS2D) — no materialized full-res
    lane-padded tensor; params identical."""

    middle_channels: int
    out_channels: int
    dtype: Optional[jnp.dtype] = None
    s2d_out: bool = False

    @nn.compact
    def __call__(self, x):
        y = ConvRelu(self.middle_channels, dtype=self.dtype, name="convrelu")(x)
        if self.s2d_out:
            from segtpu.models.layers import DeconvS2D

            return nn.relu(DeconvS2D(self.out_channels, dtype=self.dtype,
                                     name="deconv")(y))
        y = ConvTranspose2dTorch(self.out_channels, 4, 2, padding=1,
                                 dtype=self.dtype, name="deconv")(y)
        return nn.relu(y)


class _VGGConvs(nn.Module):
    """A run of conv3x3+ReLU layers (one VGG stage, pooling excluded)."""

    features: Sequence[int]
    dtype: Optional[jnp.dtype] = None
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        from segtpu.models.layers import S2DConv

        for i, f in enumerate(self.features):
            if self.s2d:
                x = nn.relu(S2DConv(f, 3, dtype=self.dtype, name=f"conv{i}")(x))
            else:
                x = nn.relu(Conv(f, 3, padding=1, dtype=self.dtype,
                                 name=f"conv{i}")(x))
        return x


class UNet11(nn.Module):
    """reference lib/models/unet11.py:51-122."""

    num_classes: int = 1
    num_filters: int = 32
    s2d: bool = False  # s2d execution of the full-res level (exact math)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.num_filters
        use_s2d = self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if use_s2d:
            from segtpu.ops.s2d import blocked_perm, d2s, s2d, s2d_max_pool_exit

            conv1s = _VGGConvs((64,), self.dtype, s2d=True, name="conv1")(s2d(x))
            pool1 = s2d_max_pool_exit(conv1s)
        else:
            conv1 = _VGGConvs((64,), self.dtype, name="conv1")(x)
            pool1 = max_pool(conv1)
        conv2 = _VGGConvs((128,), self.dtype, name="conv2")(pool1)
        conv3 = _VGGConvs((256, 256), self.dtype, name="conv3")(max_pool(conv2))
        conv4 = _VGGConvs((512, 512), self.dtype, name="conv4")(max_pool(conv3))
        conv5 = _VGGConvs((512, 512), self.dtype, name="conv5")(max_pool(conv4))

        center = DecoderBlock(nf * 8 * 2, nf * 8, self.dtype, name="center")(
            max_pool(conv5))
        dec5 = DecoderBlock(nf * 8 * 2, nf * 8, self.dtype, name="dec5")(
            jnp.concatenate([center, conv5], -1))
        dec4 = DecoderBlock(nf * 8 * 2, nf * 4, self.dtype, name="dec4")(
            jnp.concatenate([dec5, conv4], -1))
        dec3 = DecoderBlock(nf * 4 * 2, nf * 2, self.dtype, name="dec3")(
            jnp.concatenate([dec4, conv3], -1))
        if use_s2d:
            # dec2's deconv emits s2d directly; dec1 consumes the blocked
            # lane concat [dec2 | conv1] via an input-permuted expanded
            # kernel; the 1x1 head stays s2d and converts once at the end.
            dec2s = DecoderBlock(nf * 2 * 2, nf, self.dtype, s2d_out=True,
                                 name="dec2")(jnp.concatenate([dec3, conv2], -1))
            from segtpu.models.layers import S2DConv

            dec1s = ConvRelu(
                nf, self.dtype, s2d=True,
                in_perm=blocked_perm((nf, 64)), name="dec1",
            )(jnp.concatenate([dec2s, conv1s], -1))
            outs = S2DConv(self.num_classes, 1, dtype=self.dtype,
                           name="final")(dec1s)
            return d2s(outs).astype(jnp.float32)
        dec2 = DecoderBlock(nf * 2 * 2, nf, self.dtype, name="dec2")(
            jnp.concatenate([dec3, conv2], -1))
        dec1 = ConvRelu(nf, self.dtype, name="dec1")(
            jnp.concatenate([dec2, conv1], -1))
        out = Conv(self.num_classes, 1, padding=0, dtype=self.dtype, name="final")(dec1)
        return out.astype(jnp.float32)


class UNet16(nn.Module):
    """reference lib/models/unet16.py:52-131."""

    num_classes: int = 1
    num_filters: int = 32
    s2d: bool = False  # s2d execution of the full-res level (exact math)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.num_filters
        use_s2d = self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if use_s2d:
            from segtpu.ops.s2d import blocked_perm, d2s, s2d, s2d_max_pool_exit

            conv1s = _VGGConvs((64, 64), self.dtype, s2d=True,
                               name="conv1")(s2d(x))
            pool1 = s2d_max_pool_exit(conv1s)
        else:
            conv1 = _VGGConvs((64, 64), self.dtype, name="conv1")(x)
            pool1 = max_pool(conv1)
        conv2 = _VGGConvs((128, 128), self.dtype, name="conv2")(pool1)
        conv3 = _VGGConvs((256, 256, 256), self.dtype, name="conv3")(max_pool(conv2))
        conv4 = _VGGConvs((512, 512, 512), self.dtype, name="conv4")(max_pool(conv3))
        conv5 = _VGGConvs((512, 512, 512), self.dtype, name="conv5")(max_pool(conv4))

        center = DecoderBlock(nf * 8 * 2, nf * 8, self.dtype, name="center")(
            max_pool(conv5))
        dec5 = DecoderBlock(nf * 8 * 2, nf * 8, self.dtype, name="dec5")(
            jnp.concatenate([center, conv5], -1))
        dec4 = DecoderBlock(nf * 8 * 2, nf * 8, self.dtype, name="dec4")(
            jnp.concatenate([dec5, conv4], -1))
        dec3 = DecoderBlock(nf * 4 * 2, nf * 2, self.dtype, name="dec3")(
            jnp.concatenate([dec4, conv3], -1))
        if use_s2d:
            dec2s = DecoderBlock(nf * 2 * 2, nf, self.dtype, s2d_out=True,
                                 name="dec2")(jnp.concatenate([dec3, conv2], -1))
            from segtpu.models.layers import S2DConv

            dec1s = ConvRelu(
                nf, self.dtype, s2d=True,
                in_perm=blocked_perm((nf, 64)), name="dec1",
            )(jnp.concatenate([dec2s, conv1s], -1))
            outs = S2DConv(self.num_classes, 1, dtype=self.dtype,
                           name="final")(dec1s)
            return d2s(outs).astype(jnp.float32)
        dec2 = DecoderBlock(nf * 2 * 2, nf, self.dtype, name="dec2")(
            jnp.concatenate([dec3, conv2], -1))
        dec1 = ConvRelu(nf, self.dtype, name="dec1")(
            jnp.concatenate([dec2, conv1], -1))
        out = Conv(self.num_classes, 1, padding=0, dtype=self.dtype, name="final")(dec1)
        return out.astype(jnp.float32)


def convert_torch_vgg_features(state_dict, arch: str = "vgg11"):
    """torchvision VGG ``features`` state_dict -> params for the encoder
    stages of UNet11/UNet16 (OIHW -> HWIO)."""
    import numpy as np

    # conv layer indices within torchvision vgg .features
    layout = {
        "vgg11": {"conv1": [0], "conv2": [3], "conv3": [6, 8],
                  "conv4": [11, 13], "conv5": [16, 18]},
        "vgg16": {"conv1": [0, 2], "conv2": [5, 7], "conv3": [10, 12, 14],
                  "conv4": [17, 19, 21], "conv5": [24, 26, 28]},
    }[arch]

    params = {}
    for stage, idxs in layout.items():
        stage_p = {}
        for i, li in enumerate(idxs):
            w = np.asarray(state_dict[f"features.{li}.weight"])
            b = np.asarray(state_dict[f"features.{li}.bias"])
            stage_p[f"conv{i}"] = {
                "Conv_0": {
                    "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                    "bias": jnp.asarray(b),
                }
            }
        params[stage] = stage_p
    return params


@register("unet11")
def _unet11(patch_size, num_channels):
    return UNet11()


@register("unet16")
def _unet16(patch_size, num_channels):
    return UNet16()
