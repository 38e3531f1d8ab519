"""Global Convolutional Network: GCN34 / GCN152
(reference lib/models/gcn152.py:64-167).

Separable large-kernel conv pairs (k=7), boundary-refine residual modules,
bilinear(align_corners=True) upsample fusion cascade over ResNet34/152.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from segtpu.models import register
from segtpu.models.encoders.resnet import ResNetEncoder, resnet34, resnet152
from segtpu.models.layers import Conv, Dropout2d, upsample_bilinear


class GlobalConvModule(nn.Module):
    """(kx1 -> 1xk) + (1xk -> kx1) separable large-kernel branches
    (reference gcn152.py:9-34), with the pre-dropout the reference adds."""

    out_dim: int
    kernel_size: int = 7
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        k = self.kernel_size
        pad = (k - 1) // 2
        x = Dropout2d(0.1, name="pre_drop")(x, deterministic=not train)
        xl = Conv(self.out_dim, (k, 1), padding=[(pad, pad), (0, 0)],
                  dtype=self.dtype, name="conv_l1")(x)
        xl = Conv(self.out_dim, (1, k), padding=[(0, 0), (pad, pad)],
                  dtype=self.dtype, name="conv_l2")(xl)
        xr = Conv(self.out_dim, (1, k), padding=[(0, 0), (pad, pad)],
                  dtype=self.dtype, name="conv_r1")(x)
        xr = Conv(self.out_dim, (k, 1), padding=[(pad, pad), (0, 0)],
                  dtype=self.dtype, name="conv_r2")(xr)
        return xl + xr


class BoundaryRefineModule(nn.Module):
    """x + conv3x3(relu(conv3x3(x))) (reference gcn152.py:37-49)."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        r = Conv(self.dim, 3, padding=1, dtype=self.dtype, name="conv1")(x)
        r = nn.relu(r)
        r = Conv(self.dim, 3, padding=1, dtype=self.dtype, name="conv2")(r)
        return x + r


class GCN(nn.Module):
    """Shared GCN34/GCN152 body (reference gcn152.py:64-167)."""

    encoder: ResNetEncoder
    num_classes: int = 1
    input_size: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nc = self.num_classes
        stem, e1, e2, e3, e4 = self.encoder(x, train)
        # reference layout: fm0 = pre-maxpool stem; fm1..fm4 = layer1..4
        fm0, fm1, fm2, fm3, fm4 = stem, e1, e2, e3, e4

        gcfm1 = BoundaryRefineModule(nc, self.dtype, name="brm1")(
            GlobalConvModule(nc, 7, self.dtype, name="gcm1")(fm4, train))
        gcfm2 = BoundaryRefineModule(nc, self.dtype, name="brm2")(
            GlobalConvModule(nc, 7, self.dtype, name="gcm2")(fm3, train))
        gcfm3 = BoundaryRefineModule(nc, self.dtype, name="brm3")(
            GlobalConvModule(nc, 7, self.dtype, name="gcm3")(fm2, train))
        gcfm4 = BoundaryRefineModule(nc, self.dtype, name="brm4")(
            GlobalConvModule(nc, 7, self.dtype, name="gcm4")(fm1, train))

        up = lambda v, ref: upsample_bilinear(v, (ref.shape[1], ref.shape[2]))
        fs1 = BoundaryRefineModule(nc, self.dtype, name="brm5")(up(gcfm1, fm3) + gcfm2)
        fs2 = BoundaryRefineModule(nc, self.dtype, name="brm6")(up(fs1, fm2) + gcfm3)
        fs3 = BoundaryRefineModule(nc, self.dtype, name="brm7")(up(fs2, fm1) + gcfm4)
        fs4 = BoundaryRefineModule(nc, self.dtype, name="brm8")(up(fs3, fm0))
        out = BoundaryRefineModule(nc, self.dtype, name="brm9")(
            upsample_bilinear(fs4, (x.shape[1], x.shape[2])))
        return out.astype(jnp.float32)


def GCN34(num_classes: int = 1, input_size: int = 512, dtype=None) -> GCN:
    return GCN(encoder=resnet34(dtype=dtype), num_classes=num_classes,
               input_size=input_size, dtype=dtype)


def GCN152(num_classes: int = 1, input_size: int = 512, dtype=None) -> GCN:
    return GCN(encoder=resnet152(dtype=dtype), num_classes=num_classes,
               input_size=input_size, dtype=dtype)


@register("gcn")
def _gcn(patch_size, num_channels):
    return GCN152(num_classes=1, input_size=patch_size)


@register("gcn34")
def _gcn34(patch_size, num_channels):
    return GCN34(num_classes=1, input_size=patch_size)
