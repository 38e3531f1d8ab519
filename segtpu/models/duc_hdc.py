"""ResNetDUC / ResNetDUCHDC (reference lib/models/duc_hdc.py:24-101).

ResNet152 with dilation 2/4 (DUC) or hybrid dilation cycles [1,2,5,9] /
[5,9,17] (HDC), then Dense Upsampling Convolution: conv3x3 -> BN -> ReLU ->
PixelShuffle(8). Input sizes should be multiples of 8.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from segtpu.models import register
from segtpu.models.encoders.resnet import resnet152
from segtpu.models.layers import BatchNormTorch, Conv, pixel_shuffle


class DenseUpsamplingConvModule(nn.Module):
    """(reference duc_hdc.py:7-21)."""

    down_factor: int
    num_classes: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        dim = (self.down_factor ** 2) * self.num_classes
        y = Conv(dim, 3, padding=1, dtype=self.dtype, name="conv")(x)
        y = BatchNormTorch(dim, name="bn")(y, use_running_average=not train)
        y = nn.relu(y)
        return pixel_shuffle(y, self.down_factor)


class ResNetDUC(nn.Module):
    """reference duc_hdc.py:24-61 (dilation 2/4, stride 8)."""

    num_classes: int = 1
    hdc: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc = resnet152(dilated=not self.hdc, hdc=self.hdc, dtype=self.dtype)
        stem, e1, e2, e3, e4 = enc.copy(name="encoder")(x, train)
        out = DenseUpsamplingConvModule(8, self.num_classes, self.dtype,
                                        name="duc")(e4, train)
        return out.astype(jnp.float32)


def ResNetDUCHDC(num_classes: int = 1, dtype=None) -> ResNetDUC:
    """reference duc_hdc.py:64-101 (hybrid dilation cycles)."""
    return ResNetDUC(num_classes=num_classes, hdc=True, dtype=dtype)


@register("duc")
def _duc(patch_size, num_channels):
    return ResNetDUC(num_classes=1)


@register("duc_dc")
def _duc_dc(patch_size, num_channels):
    return ResNetDUCHDC(num_classes=1)
