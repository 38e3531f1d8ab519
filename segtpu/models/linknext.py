"""LinkNext: LinkNet decoder over a from-scratch ResNeXt-26 2x64d encoder
(reference lib/models/linknext.py:227-278, 121-158).

Grouped-conv ``BasicBlock_C`` blocks (linknext.py:84-118); per-level decoder
dropout 0.1-0.4 (linknext.py:244-247).

Conscious fixes vs the reference (which is unrunnable in the harness as
written): (1) the reference comments out the encoder's stride-2 maxpool
(linknext.py:240,261) while keeping 2x-upsampling decoders and a stride-2
head deconv, which makes the output 4x the input size — the maxpool is
enabled here and decoder1 made stride-1, so the output matches the input
exactly; (2) ``BasicBlock_A`` (whose forward discards its path sums,
linknext.py:68) is unused upstream and not reproduced.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from segtpu.models import register
from segtpu.models.layers import BatchNormTorch, Conv, ConvTranspose2dTorch, Dropout2d


class BasicBlockC(nn.Module):
    """1x1 -> grouped 3x3 -> 1x1(x expansion) with BN, plus 1x1 shortcut;
    final BN *after* the residual add (reference linknext.py:84-118)."""

    bottleneck_width: int
    cardinality: int
    stride: int = 1
    expansion: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        inner = self.cardinality * self.bottleneck_width
        out_ch = inner * self.expansion
        y = Conv(inner, 1, padding=0, use_bias=False, dtype=self.dtype,
                 name="conv1_0")(x)
        y = BatchNormTorch(inner, name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(inner, 3, stride=self.stride, padding=1, groups=self.cardinality,
                 use_bias=False, dtype=self.dtype, name="conv3_0")(y)
        y = BatchNormTorch(inner, name="bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(out_ch, 1, padding=0, use_bias=False, dtype=self.dtype,
                 name="conv1_1")(y)
        y = BatchNormTorch(out_ch, name="bn3")(y, use_running_average=not train)

        if self.stride != 1 or x.shape[-1] != out_ch:
            sc = Conv(out_ch, 1, stride=self.stride, padding=0, use_bias=False,
                      dtype=self.dtype, name="shortcut")(x)
        else:
            sc = x
        y = y + sc
        y = BatchNormTorch(out_ch, name="bn0")(y, use_running_average=not train)
        return nn.relu(y)


class ResNeXtEncoder(nn.Module):
    """ResNeXt-26-style encoder (reference linknext.py:121-158): conv3x3 stem,
    4 layers of 2 blocks, bottleneck width doubling per layer."""

    num_blocks: Sequence[int] = (2, 2, 2, 2)
    cardinality: int = 2
    bottleneck_width: int = 64
    expansion: int = 2
    s2d: bool = False  # s2d execution of the full-res stem (exact math)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # the 64ch full-res stem (2x lane-padded) runs dense in s2d;
            # the k3 s2 stem pool exits back to normal space (segtpu.ops.s2d)
            from segtpu.models.layers import S2DConv
            from segtpu.ops.s2d import s2d, s2d_max_pool3_exit

            y = S2DConv(64, 3, dtype=self.dtype, name="conv0")(s2d(x))
            y = BatchNormTorch(64, stat_groups=4, name="bn0")(
                y, use_running_average=not train)
            y = nn.relu(y)
            y = s2d_max_pool3_exit(y)
        else:
            y = Conv(64, 3, padding=1, dtype=self.dtype, name="conv0")(x)
            y = BatchNormTorch(64, name="bn0")(y, use_running_average=not train)
            y = nn.relu(y)
            y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = []
        bw = self.bottleneck_width
        for li, (nb, first_stride) in enumerate(zip(self.num_blocks, (1, 2, 2, 2))):
            for b in range(nb):
                y = BasicBlockC(
                    bw, self.cardinality,
                    stride=first_stride if b == 0 else 1,
                    expansion=self.expansion, dtype=self.dtype,
                    name=f"layer{li + 1}_{b}",
                )(y, train)
            bw *= 2
            feats.append(y)
        return tuple(feats)


# ResNeXt-26/50 configuration factories (reference linknext.py:160-192)
def resnext26_2x64d(**kw):
    return ResNeXtEncoder(num_blocks=(2, 2, 2, 2), cardinality=2, bottleneck_width=64, **kw)


def resnext26_4x32d(**kw):
    return ResNeXtEncoder(num_blocks=(2, 2, 2, 2), cardinality=4, bottleneck_width=32, **kw)


def resnext26_8x16d(**kw):
    return ResNeXtEncoder(num_blocks=(2, 2, 2, 2), cardinality=8, bottleneck_width=16, **kw)


def resnext26_16x8d(**kw):
    return ResNeXtEncoder(num_blocks=(2, 2, 2, 2), cardinality=16, bottleneck_width=8, **kw)


def resnext26_32x4d(**kw):
    return ResNeXtEncoder(num_blocks=(2, 2, 2, 2), cardinality=32, bottleneck_width=4, **kw)


def resnext50_2x64d(**kw):
    return ResNeXtEncoder(num_blocks=(3, 4, 6, 3), cardinality=2, bottleneck_width=64, **kw)


def resnext50_32x4d(**kw):
    return ResNeXtEncoder(num_blocks=(3, 4, 6, 3), cardinality=32, bottleneck_width=4, **kw)


class LinkNextDecoderBlock(nn.Module):
    """conv1x1/4 -> deconv k4 s2 p1 (or 3x3 when stride1) -> conv1x1, BN+ReLU
    each, trailing Dropout2d (reference linknext.py:195-225)."""

    n_filters: int
    drop_rate: float = 0.0
    stride1: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        mid = x.shape[-1] // 4
        y = Conv(mid, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        y = BatchNormTorch(mid, name="norm1")(y, use_running_average=not train)
        y = nn.relu(y)
        if self.stride1:
            y = Conv(mid, 3, padding=1, dtype=self.dtype, name="deconv2")(y)
        else:
            y = ConvTranspose2dTorch(mid, 4, 2, padding=1, dtype=self.dtype,
                                     name="deconv2")(y)
        y = BatchNormTorch(mid, name="norm2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.n_filters, 1, padding=0, dtype=self.dtype, name="conv3")(y)
        y = BatchNormTorch(self.n_filters, name="norm3")(y, use_running_average=not train)
        y = nn.relu(y)
        return Dropout2d(self.drop_rate, name="drop")(y, deterministic=not train)


class LinkNext(nn.Module):
    """reference lib/models/linknext.py:227-278."""

    num_classes: int = 1
    num_channels: int = 3
    s2d: bool = False  # s2d execution of the encoder's full-res stem
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # upstream asserts num_channels==3 (linknext.py:231); the lazy stem
        # conv here accepts any channel count so the -g flag works
        dt = self.dtype
        e1, e2, e3, e4 = ResNeXtEncoder(s2d=self.s2d, dtype=dt,
                                        name="encoder")(x, train)
        filters = [e1.shape[-1], e2.shape[-1], e3.shape[-1], e4.shape[-1]]

        d4 = LinkNextDecoderBlock(filters[2], 0.1, dtype=dt, name="decoder4")(e4, train) + e3
        d3 = LinkNextDecoderBlock(filters[1], 0.2, dtype=dt, name="decoder3")(d4, train) + e2
        d2 = LinkNextDecoderBlock(filters[0], 0.3, dtype=dt, name="decoder2")(d3, train) + e1
        d1 = LinkNextDecoderBlock(filters[0], 0.4, stride1=True, dtype=dt,
                                  name="decoder1")(d2, train)

        f = ConvTranspose2dTorch(32, 3, 2, dtype=dt, name="finaldeconv1")(d1)
        f = nn.relu(f)
        f = Conv(32, 3, padding=0, dtype=dt, name="finalconv2")(f)
        f = nn.relu(f)
        f = Conv(self.num_classes, 2, padding=1, dtype=dt, name="finalconv3")(f)
        return f.astype(jnp.float32)


@register("linknext")
def _linknext(patch_size, num_channels):
    return LinkNext(num_channels=num_channels, num_classes=1)
