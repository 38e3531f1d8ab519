"""U-Net family: UNet, UNetABN, ZF_UNET, Afterburner (NHWC Flax).

Capability parity with reference lib/models/unet.py, unet_abn.py, zf_unet.py,
afterburner.py — rebuilt as functional NHWC modules. All output raw logits
with ``n_classes`` channels (default 1).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from segtpu.models.layers import (
    BatchNormTorch,
    Conv,
    ConvTranspose2dTorch,
    Dropout2d,
    InPlaceABN,
    max_pool,
    upsample_nearest,
)


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> ReLU) x2 (reference unet.py:6-22).

    ``s2d=True`` evaluates the block in space-to-depth representation (same
    math, dense 128-lane channels — segtpu.ops.s2d); params identical."""

    features: int
    dtype: Optional[jnp.dtype] = None
    s2d: bool = False
    in_parts: Optional[tuple] = None  # for conv0 when input is a blocked concat

    @nn.compact
    def __call__(self, x, train: bool):
        from segtpu.models.layers import S2DConv

        for i in range(2):
            if self.s2d:
                x = S2DConv(self.features, 3, dtype=self.dtype,
                            in_parts=self.in_parts if i == 0 else None,
                            name=f"conv{i}")(x)
            else:
                x = Conv(self.features, 3, padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            x = BatchNormTorch(
                self.features, stat_groups=4 if self.s2d else 1, name=f"bn{i}"
            )(x, use_running_average=not train)
            x = nn.relu(x)
        return x


class DoubleConvABN(nn.Module):
    """(conv3x3 -> InPlaceABN) x2 (reference unet_abn.py:6-22) — the fused
    ABN path with the memory-saving from-output backward.

    ``s2d=True`` evaluates the block in space-to-depth representation: the
    convs expand their kernels (segtpu.ops.s2d) and the ABN combines its
    statistics across the 4 sub-positions (InPlaceABN stat_groups) — same
    math, dense 128-lane channels, params identical."""

    features: int
    dtype: Optional[jnp.dtype] = None
    s2d: bool = False
    in_parts: Optional[tuple] = None  # for conv0 when input is a blocked concat

    @nn.compact
    def __call__(self, x, train: bool):
        from segtpu.models.layers import S2DConv

        for i in range(2):
            if self.s2d:
                x = S2DConv(self.features, 3, dtype=self.dtype,
                            in_parts=self.in_parts if i == 0 else None,
                            name=f"conv{i}")(x)
            else:
                x = Conv(self.features, 3, padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            x = InPlaceABN(
                self.features, stat_groups=4 if self.s2d else 1, name=f"abn{i}"
            )(x, use_running_average=not train)
        return x


def _pad_to_match(small, big):
    """Pad `small` spatially to `big`'s H/W (reference unet.py:60-64)."""
    dh = big.shape[1] - small.shape[1]
    dw = big.shape[2] - small.shape[2]
    if dh == 0 and dw == 0:
        return small
    return jnp.pad(
        small, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0))
    )


class _Up(nn.Module):
    """Upsample (nearest or deconv), pad-and-concat skip, double conv
    (reference unet.py:48-67).

    ``s2d=True`` (nearest-upsample, non-ABN only): ``x1`` arrives in normal
    space at half resolution (upsampling is a channel tile in s2d space),
    ``x2`` arrives as the s2d skip; output stays s2d."""

    features: int
    abn: bool = False
    upsample: bool = True
    dtype: Optional[jnp.dtype] = None
    s2d: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        if self.s2d:
            # lane-aligned concat [s2d skip | raw half-res tensor]; the
            # nearest-upsample of x1 is folded into the consuming conv's
            # expanded kernel (s2d.expand_kernel_parts) — no channel tile.
            x = jnp.concatenate([x2, x1], axis=-1)
            parts = (("s2d", x2.shape[-1] // 4), ("fold", x1.shape[-1]))
            block = DoubleConvABN if self.abn else DoubleConv
            return block(self.features, dtype=self.dtype, s2d=True,
                         in_parts=parts, name="conv")(x, train)
        if self.upsample:
            x1 = upsample_nearest(x1)
        else:
            x1 = ConvTranspose2dTorch(x1.shape[-1], 2, 2, dtype=self.dtype)(x1)
        x2 = _pad_to_match(x2, x1)
        x = jnp.concatenate([x2, x1], axis=-1)
        block = DoubleConvABN if self.abn else DoubleConv
        return block(self.features, dtype=self.dtype, name="conv")(x, train)


class UNet(nn.Module):
    """Classic U-Net (reference lib/models/unet.py:80-107).

    4x down via maxpool, 4x up via nearest upsample (or deconv), concat
    skips, Dropout2d(0.5) before the 1x1 head.
    """

    n_channels: int = 3
    n_classes: int = 1
    n_filters: int = 32
    upsample: bool = True
    abn: bool = False
    final_dropout: float = 0.5  # reference unet.py:93 Dropout2d(p=0.5)
    s2d: bool = False  # s2d execution of the full-res level (exact math)
    s2d_deep: bool = False  # ALSO run the H/2 level in s2d — measured net-
    # negative on v5e (the 4x expanded-kernel MACs at level 1 outweigh the
    # dense-lane bandwidth win: zf_unet-512 94.2 -> 96.2 ms/step); exact
    # math, kept as an opt-in + x64-exactness-tested.
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.n_filters
        block = DoubleConvABN if self.abn else DoubleConv
        # s2d covers the ABN variant too: the fused from-output ABN backward
        # composes with grouped (stat_groups=4) s2d statistics — the guard
        # that excluded unet_abn from the zoo's biggest lever is lifted
        # (VERDICT r4 item 2); measurement in BASELINE.md.
        use_s2d = (self.s2d and self.upsample
                   and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        deep = (use_s2d and not self.abn and self.s2d_deep
                and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0)
        if use_s2d:
            from segtpu.models.layers import S2DConv
            from segtpu.ops.s2d import d2s, s2d, s2d_max_pool_exit

            x1s = block(f, dtype=self.dtype, s2d=True, name="inc")(s2d(x), train)
            pooled = s2d_max_pool_exit(x1s)
        else:
            x1 = block(f, dtype=self.dtype, name="inc")(x, train)
            pooled = max_pool(x1)
        if deep:
            # level-1 s2d: the H/2 level (C=2f, lane-padded) runs dense too
            x2s = DoubleConv(f * 2, dtype=self.dtype, s2d=True, name="down1")(
                s2d(pooled), train)
            x3_in = s2d_max_pool_exit(x2s)
        else:
            x2 = block(f * 2, dtype=self.dtype, name="down1")(pooled, train)
            x3_in = max_pool(x2)
        x3 = block(f * 4, dtype=self.dtype, name="down2")(x3_in, train)
        x4 = block(f * 8, dtype=self.dtype, name="down3")(max_pool(x3), train)
        x5 = block(f * 8, dtype=self.dtype, name="down4")(max_pool(x4), train)
        y = _Up(f * 4, abn=self.abn, upsample=self.upsample, dtype=self.dtype, name="up1")(x5, x4, train)
        y = _Up(f * 2, abn=self.abn, upsample=self.upsample, dtype=self.dtype, name="up2")(y, x3, train)
        if deep:
            y = _Up(f, dtype=self.dtype, s2d=True, name="up3")(y, x2s, train)
            y = d2s(y)  # normal space @ H/2 for up4's fold part
        else:
            y = _Up(f, abn=self.abn, upsample=self.upsample, dtype=self.dtype, name="up3")(y, x2, train)
        if use_s2d:
            y = _Up(f, abn=self.abn, dtype=self.dtype, s2d=True,
                    name="up4")(y, x1s, train)
            y = Dropout2d(self.final_dropout, groups=4, name="finaldrop")(
                y, deterministic=not train)
            y = S2DConv(self.n_classes, 1, dtype=self.dtype, name="outc")(y)
            return d2s(y).astype(jnp.float32)
        y = _Up(f, abn=self.abn, upsample=self.upsample, dtype=self.dtype, name="up4")(y, x1, train)
        y = Dropout2d(self.final_dropout, name="finaldrop")(y, deterministic=not train)
        return Conv(self.n_classes, 1, padding=0, dtype=self.dtype, name="outc")(
            y
        ).astype(jnp.float32)


class UNetABN(nn.Module):
    """UNet with fused InPlaceABN blocks (reference lib/models/unet_abn.py).

    ``s2d``: space-to-depth execution of the full-res level — the grouped-
    stats ABN variant (InPlaceABN stat_groups=4), exact math."""

    n_channels: int = 3
    n_classes: int = 1
    n_filters: int = 32
    s2d: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return UNet(
            n_channels=self.n_channels,
            n_classes=self.n_classes,
            n_filters=self.n_filters,
            abn=True,
            s2d=self.s2d,
            dtype=self.dtype,
            name="unet",
        )(x, train)


class _ZFDoubleConv(nn.Module):
    """conv-BN-ReLU x2 + Dropout2d (reference zf_unet.py:5-32).

    ``s2d=True`` evaluates the block in space-to-depth representation
    (same math, dense 128-lane channels — segtpu.ops.s2d): input/output are
    s2d tensors, params identical to the normal path."""

    features: int
    dropout: float = 0.2
    batch_norm: bool = True
    dtype: Optional[jnp.dtype] = None
    s2d: bool = False
    in_parts: Optional[tuple] = None  # for conv0 when input is a blocked concat

    @nn.compact
    def __call__(self, x, train: bool):
        from segtpu.models.layers import S2DConv

        g = 4 if self.s2d else 1
        for i in range(2):
            if self.s2d:
                x = S2DConv(self.features, 3, dtype=self.dtype,
                            in_parts=self.in_parts if i == 0 else None,
                            name=f"conv{i}")(x)
            else:
                x = Conv(self.features, 3, padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            if self.batch_norm:
                x = BatchNormTorch(self.features, stat_groups=g, name=f"bn{i}")(
                    x, use_running_average=not train)
            x = nn.relu(x)
        x = Dropout2d(self.dropout, groups=g)(x, deterministic=not train)
        return x


class ZF_UNET(nn.Module):
    """ZF_UNET_224: 5-level U-Net, 32->1024 filters, per-block Dropout2d(0.2),
    nearest upsample + concat (reference lib/models/zf_unet.py:35-95).

    ``remat``: rematerialize each double-conv block in the backward pass —
    on a bandwidth-bound profile this trades cheap recompute FLOPs for
    saved-activation HBM traffic.
    """

    input_channels: int = 3
    num_classes: int = 1
    filters: int = 32
    dropout_val: float = 0.2
    batch_norm: bool = True
    remat: bool = False
    s2d: bool = False  # evaluate the 512-res level in s2d space (exact math)
    s2d_deep: bool = False  # ALSO run the H/2 level in s2d (see UNet.s2d_deep)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        block_cls = (nn.remat(_ZFDoubleConv, static_argnums=(2,))
                     if self.remat else _ZFDoubleConv)
        use_s2d = self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0

        def dc(feat, name, s2d=False, in_parts=None):
            return block_cls(
                feat, self.dropout_val, self.batch_norm, self.dtype,
                s2d=s2d, in_parts=in_parts, name=name,
            )

        deep = (use_s2d and self.s2d_deep
                and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0)
        if use_s2d:
            from segtpu.models.layers import S2DConv
            from segtpu.ops.s2d import d2s, s2d, s2d_max_pool_exit

            c224s = dc(f, "conv_224", s2d=True)(s2d(x), train)
            pooled = s2d_max_pool_exit(c224s)  # exits to normal space @ H/2
        else:
            c224 = dc(f, "conv_224")(x, train)
            pooled = max_pool(c224)
        if deep:
            # level-1 s2d: the H/2 level runs C=2f (lane-padded in normal
            # space) — same machinery one level down, exact math.
            c112s = dc(2 * f, "conv_112", s2d=True)(s2d(pooled), train)
            c56_in = s2d_max_pool_exit(c112s)
        else:
            c112 = dc(2 * f, "conv_112")(pooled, train)
            c56_in = max_pool(c112)
        c56 = dc(4 * f, "conv_56")(c56_in, train)
        c28 = dc(8 * f, "conv_28")(max_pool(c56), train)
        c14 = dc(16 * f, "conv_14")(max_pool(c28), train)
        c7 = dc(32 * f, "conv_7")(max_pool(c14), train)

        u = dc(16 * f, "up_conv_14")(jnp.concatenate([upsample_nearest(c7), c14], -1), train)
        u = dc(8 * f, "up_conv_28")(jnp.concatenate([upsample_nearest(u), c28], -1), train)
        u = dc(4 * f, "up_conv_56")(jnp.concatenate([upsample_nearest(u), c56], -1), train)
        if deep:
            u = dc(2 * f, "up_conv_112", s2d=True,
                   in_parts=(("fold", u.shape[-1]), ("s2d", c112s.shape[-1] // 4)))(
                jnp.concatenate([u, c112s], axis=-1), train)
            u = d2s(u)  # normal space @ H/2 for the level-0 fold part
        else:
            u = dc(2 * f, "up_conv_112")(jnp.concatenate([upsample_nearest(u), c112], -1), train)
        if use_s2d:
            # nearest-2x upsample feeding the conv is FOLDED into the
            # expanded kernel (s2d.expand_kernel_parts): the half-res tensor
            # joins the s2d skip in a plain lane concat — no materialized
            # channel tile, and 4x fewer MACs for the upsampled part.
            u = dc(f, "up_conv_224", s2d=True,
                   in_parts=(("fold", u.shape[-1]), ("s2d", c224s.shape[-1] // 4)))(
                jnp.concatenate([u, c224s], axis=-1), train)
            y = S2DConv(self.num_classes, 1, dtype=self.dtype, name="conv_final")(u)
            return d2s(y).astype(jnp.float32)
        u = dc(f, "up_conv_224")(jnp.concatenate([upsample_nearest(u), c224], -1), train)
        return Conv(self.num_classes, 1, padding=0, dtype=self.dtype, name="conv_final")(
            u
        ).astype(jnp.float32)


class Afterburner(nn.Module):
    """1-channel-in UNet refining a frozen head's sigmoid output
    (reference lib/models/afterburner.py:8-15)."""

    n_channels: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return UNet(n_channels=self.n_channels, n_classes=1, dtype=self.dtype, name="unet")(x, train)
