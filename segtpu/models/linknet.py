"""LinkNet34 / DilatedLinkNet34 (reference lib/models/linknet.py,
dilated_linknet.py): ResNet34 encoder, 1x1 -> deconv(k4,s2) -> 1x1 decoder
blocks, *additive* skip connections, deconv+LeakyReLU head.

LinkNet34's decoder uses the fused InPlaceABN (linknet.py:5-30) — here the
Pallas-backed memory-saving ABN; DilatedLinkNet34's uses plain BN
(dilated_linknet.py:10-39) over the stride-8 dilated encoder.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from segtpu.models import register
from segtpu.models.encoders.resnet import resnet34
from segtpu.models.layers import (
    BatchNormTorch,
    Conv,
    ConvTranspose2dTorch,
    Dropout2d,
    InPlaceABN,
)


class DecoderBlockLinkNet(nn.Module):
    """conv1x1/4ch -> deconv k4 s2 p1 -> conv1x1, each + InPlaceABN
    (reference linknet.py:5-30); ``plain_bn`` swaps ABN for BN+ReLU
    (dilated_linknet.py:10-39) and ``stride1`` disables the upsampling for
    the stride-8 dilated variant."""

    n_filters: int
    plain_bn: bool = False
    stride1: bool = False
    dtype: Optional[jnp.dtype] = None

    def _norm_act(self, x, features, name, train):
        if self.plain_bn:
            x = BatchNormTorch(features, name=name + "_bn")(x, use_running_average=not train)
            return nn.relu(x)
        return InPlaceABN(features, name=name + "_abn")(x, use_running_average=not train)

    @nn.compact
    def __call__(self, x, train: bool):
        mid = x.shape[-1] // 4
        y = Conv(mid, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        y = self._norm_act(y, mid, "n1", train)
        if self.stride1:
            y = Conv(mid, 3, padding=1, dtype=self.dtype, name="deconv2")(y)
        else:
            y = ConvTranspose2dTorch(mid, 4, 2, padding=1, dtype=self.dtype,
                                     name="deconv2")(y)
        y = self._norm_act(y, mid, "n2", train)
        y = Conv(self.n_filters, 1, padding=0, dtype=self.dtype, name="conv3")(y)
        y = self._norm_act(y, self.n_filters, "n3", train)
        return y


class LinkNet34(nn.Module):
    """reference lib/models/linknet.py:33-90."""

    num_classes: int = 1
    num_channels: int = 3
    plain_bn: bool = False
    dilated: bool = False
    s2d: bool = False  # s2d execution of the full-res head conv — exact
    # math but MEASURED NET-NEGATIVE on v5e (66 -> 86 ms/step at 512^2:
    # the expanded kernel's 4x MACs + odd-size pad/slice relayouts cost
    # more than dense lanes save; same verdict as UNet.s2d_deep). Kept
    # opt-in with the x-equality test; see BASELINE.md.
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Upstream hard-asserts num_channels==3 (linknet.py:36), which crashes
        # the public -g flag; here the lazy stem conv accepts any channel
        # count (pretrained RGB stems are collapsed by summing — see
        # compat/encoder_weights.py).
        filters = [64, 128, 256, 512]
        enc = resnet34(dilated=self.dilated, dtype=self.dtype)
        stem, e1, e2, e3, e4 = enc.copy(name="encoder")(x, train)

        stride1 = self.dilated  # stride-8 encoder -> no upsampling in deep decoders

        def dec(n_filters, s1, name):
            return DecoderBlockLinkNet(
                n_filters, plain_bn=self.plain_bn, stride1=s1,
                dtype=self.dtype, name=name,
            )

        # additive skips (linknet.py:77-79)
        d4 = dec(filters[2], stride1, "decoder4")(e4, train) + e3
        d3 = dec(filters[1], stride1, "decoder3")(d4, train) + e2
        d2 = dec(filters[0], False, "decoder2")(d3, train) + e1
        d1 = dec(filters[0], False, "decoder1")(d2, train)

        # final classifier (linknet.py:57-62). The dilated variant uses plain
        # ReLU and skips the dropout (dilated_linknet.py:66-72, 94).
        if not self.dilated:
            d1 = Dropout2d(0.5, name="finaldrop1")(d1, deterministic=not train)
        act = (lambda v: nn.relu(v)) if self.dilated else (lambda v: nn.leaky_relu(v, 0.01))
        f = ConvTranspose2dTorch(32, 3, 2, dtype=self.dtype, name="finaldeconv1")(d1)
        f = act(f)
        if self.s2d and f.shape[1] % 2 == 1 and f.shape[2] % 2 == 1:
            # VALID 3x3 at ODD full resolution via a SAME conv in s2d
            # space (pad to even, expanded kernel, slice off the first and
            # last SAME rows — the only rows touching the zero padding, so
            # the math is exact; param tree identical). See the class-level
            # note: measured slower end-to-end, opt-in only.
            from segtpu.models.layers import S2DConv
            from segtpu.ops.s2d import d2s, s2d

            h, w = f.shape[1], f.shape[2]
            fp = jnp.pad(f, ((0, 0), (0, 1), (0, 1), (0, 0)))
            g = d2s(S2DConv(32, 3, dtype=self.dtype, name="finalconv2")(s2d(fp)))
            f = g[:, 1:h - 1, 1:w - 1, :]
        else:
            f = Conv(32, 3, padding=0, dtype=self.dtype, name="finalconv2")(f)
        f = act(f)
        f = Conv(self.num_classes, 2, padding=1, dtype=self.dtype, name="finalconv3")(f)
        return f.astype(jnp.float32)


class DilatedLinkNet34(nn.Module):
    """LinkNet over stride-8 dilated_resnet34, plain-BN decoders
    (reference dilated_linknet.py:42-99).

    Conscious fix vs the reference: as written there, decoder4/decoder3
    upsample 2x while their additive skips (e3/e2) stay at stride 8, which
    raises a runtime shape error — the module is unrunnable upstream. Here
    the deep decoders keep stride 1 (3x3 conv instead of deconv) so the
    additive skips align and the model trains.
    """

    num_classes: int = 1
    num_channels: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return LinkNet34(
            num_classes=self.num_classes, num_channels=self.num_channels,
            plain_bn=True, dilated=True, dtype=self.dtype, name="linknet",
        )(x, train)


@register("linknet34")
def _linknet34(patch_size, num_channels):
    return LinkNet34(num_channels=num_channels, num_classes=1)


@register("dilated_linknet34")
def _dilated_linknet34(patch_size, num_channels):
    return DilatedLinkNet34(num_channels=num_channels, num_classes=1)
