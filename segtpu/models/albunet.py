"""AlbuNet: U-Net with a ResNet-34 encoder.

Named by BASELINE.json config #3 ("TernausNet VGG11/VGG16 + AlbuNet") but
absent from the reference repo's registry — this is the public AlbuNet
architecture (ternausnet companion model, arXiv:1801.05746 lineage): the
torchvision ResNet-34 feature pyramid as the encoder, TernausNet-style
decoder blocks (ConvRelu -> deconv k4 s2 p1 -> ReLU, ternaus.DecoderBlock)
with concat skips at each scale, a final ConvRelu + 1x1 head.

Composition of existing parts: encoders/resnet.resnet34 (NHWC Flax,
``--encoder-weights`` transplant + ``--freeze-encoder`` supported via
compat/encoder_weights.py) and ternaus.ConvRelu/DecoderBlock.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from segtpu.models import register
from segtpu.models.encoders.resnet import resnet34
from segtpu.models.layers import Conv, max_pool
from segtpu.models.ternaus import ConvRelu, DecoderBlock


def _cat_skip(up, skip):
    """Concat an upsampled decoder tensor with its encoder skip, padding the
    smaller one spatially (UNet pad-and-concat, reference unet.py:60-64).

    The public torch AlbuNet requires input %64 == 0 (pool floor + exact-2x
    deconv make 7 -> 3 -> 6 != 7 at 224 and torch's cat raises just like
    jnp.concatenate); this grace-pad is a no-op at valid sizes and makes
    the odd-scale chain well-defined at any patch. Each spatial dim pads
    independently: a non-square input can leave ``up`` smaller in H but
    larger in W (odd-size parity mismatch), so both tensors pad up to the
    per-dim max rather than assuming one is uniformly smaller."""
    th = max(up.shape[1], skip.shape[1])
    tw = max(up.shape[2], skip.shape[2])

    def pad_to(t):
        dh, dw = th - t.shape[1], tw - t.shape[2]
        if dh == 0 and dw == 0:
            return t
        return jnp.pad(t, ((0, 0), (dh // 2, dh - dh // 2),
                           (dw // 2, dw - dw // 2), (0, 0)))

    return jnp.concatenate([pad_to(up), pad_to(skip)], -1)


class AlbuNet(nn.Module):
    """ResNet34-encoder U-Net (public AlbuNet, deconv decoder variant).

    Scale bookkeeping (input 1/1): encoder stem+pool 1/4 (= layer1 input),
    e1..e4 at 1/4, 1/8, 1/16, 1/32; center pools e4 to 1/64 and the six
    decoder blocks upsample back to full resolution.
    """

    num_classes: int = 1
    num_channels: int = 3
    num_filters: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.num_filters
        enc = resnet34(dtype=self.dtype)
        _stem, e1, e2, e3, e4 = enc.copy(name="encoder")(x, train)

        center = DecoderBlock(nf * 8 * 2, nf * 8, self.dtype, name="center")(
            max_pool(e4))
        dec5 = DecoderBlock(nf * 8 * 2, nf * 8, self.dtype, name="dec5")(
            _cat_skip(center, e4))
        dec4 = DecoderBlock(nf * 8 * 2, nf * 8, self.dtype, name="dec4")(
            _cat_skip(dec5, e3))
        dec3 = DecoderBlock(nf * 4 * 2, nf * 2, self.dtype, name="dec3")(
            _cat_skip(dec4, e2))
        dec2 = DecoderBlock(nf * 2 * 2, nf * 2 * 2, self.dtype, name="dec2")(
            _cat_skip(dec3, e1))
        dec1 = DecoderBlock(nf * 2 * 2, nf, self.dtype, name="dec1")(dec2)
        dec0 = ConvRelu(nf, self.dtype, name="dec0")(dec1)
        out = Conv(self.num_classes, 1, padding=0, dtype=self.dtype,
                   name="final")(dec0)
        return out.astype(jnp.float32)


@register("albunet")
def _albunet(patch_size, num_channels):
    return AlbuNet(num_channels=num_channels, num_classes=1)
