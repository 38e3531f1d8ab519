"""Misc building blocks from the reference ABN module
(reference lib/modules/abn/misc.py, residual.py, dense.py) — WiderResNet-
style components kept for API completeness.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from segtpu.models.layers import ABN, Conv


def global_avg_pool_2d(x: jnp.ndarray) -> jnp.ndarray:
    """Global average pooling over spatial dims: (N,H,W,C) -> (N,C)
    (reference abn/misc.py:4-11)."""
    return jnp.mean(x, axis=(1, 2))


class GlobalAvgPool2d(nn.Module):
    @nn.compact
    def __call__(self, x):
        return global_avg_pool_2d(x)


class IdentityResidualBlock(nn.Module):
    """Configurable identity-mapping residual block
    (reference abn/residual.py:8-88).

    ``channels`` of length 2 -> two 3x3 convs; length 3 -> 1x1/3x3/1x1
    bottleneck (groups allowed). Pre-activation: bn1 feeds both the conv path
    and (when projecting) the shortcut.
    """

    channels: Sequence[int]
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if len(self.channels) not in (2, 3):
            raise ValueError("channels must contain either two or three values")
        if len(self.channels) == 2 and self.groups != 1:
            raise ValueError("groups > 1 are only valid if len(channels) == 3")

        is_bottleneck = len(self.channels) == 3
        in_channels = x.shape[-1]
        need_proj = self.stride != 1 or in_channels != self.channels[-1]

        bn1 = ABN(in_channels, name="bn1")(x, use_running_average=not train)
        shortcut = x
        if need_proj:
            shortcut = Conv(self.channels[-1], 1, stride=self.stride, padding=0,
                            use_bias=False, dtype=self.dtype, name="proj_conv")(bn1)

        if not is_bottleneck:
            y = Conv(self.channels[0], 3, stride=self.stride,
                     padding=self.dilation, dilation=self.dilation,
                     use_bias=False, dtype=self.dtype, name="conv1")(bn1)
            y = ABN(self.channels[0], name="bn2")(y, use_running_average=not train)
            if self.dropout is not None:
                y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = Conv(self.channels[1], 3, padding=self.dilation,
                     dilation=self.dilation, use_bias=False, dtype=self.dtype,
                     name="conv2")(y)
        else:
            y = Conv(self.channels[0], 1, stride=self.stride, padding=0,
                     use_bias=False, dtype=self.dtype, name="conv1")(bn1)
            y = ABN(self.channels[0], name="bn2")(y, use_running_average=not train)
            y = Conv(self.channels[1], 3, padding=self.dilation,
                     dilation=self.dilation, groups=self.groups,
                     use_bias=False, dtype=self.dtype, name="conv2")(y)
            y = ABN(self.channels[1], name="bn3")(y, use_running_average=not train)
            if self.dropout is not None:
                y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = Conv(self.channels[2], 1, padding=0, use_bias=False,
                     dtype=self.dtype, name="conv3")(y)

        return y + shortcut


class DenseModule(nn.Module):
    """Bottlenecked dense block (reference abn/dense.py:9-42): each layer is
    BN->1x1 (growth*bottleneck) then BN->3x3 (growth), concatenated."""

    growth: int
    layers: int
    bottleneck_factor: int = 4
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = [x]
        for i in range(self.layers):
            y = jnp.concatenate(inputs, axis=-1)
            y = ABN(y.shape[-1], name=f"bn1_{i}")(y, use_running_average=not train)
            y = Conv(self.growth * self.bottleneck_factor, 1, padding=0,
                     use_bias=False, dtype=self.dtype, name=f"conv1_{i}")(y)
            y = ABN(y.shape[-1], name=f"bn3_{i}")(y, use_running_average=not train)
            y = Conv(self.growth, 3, padding=self.dilation,
                     dilation=self.dilation, use_bias=False, dtype=self.dtype,
                     name=f"conv3_{i}")(y)
            inputs.append(y)
        return jnp.concatenate(inputs, axis=-1)
