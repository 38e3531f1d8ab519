"""SqueezeNet encoder-decoder segmentation net
(reference lib/models/squeezenet.py:68-151): Fire/DFire squeeze-expand
modules with ELU, additive skips, nearest upsampling.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from segtpu.models import register
from segtpu.models.layers import Conv, max_pool, upsample_nearest


class Fire(nn.Module):
    """squeeze 1x1 -> ELU -> [expand1x1 || expand3x3] -> ELU -> concat
    (reference squeezenet.py:7-27)."""

    squeeze_planes: int
    expand1x1_planes: int
    expand3x3_planes: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s = nn.elu(Conv(self.squeeze_planes, 1, padding=0, dtype=self.dtype,
                        name="squeeze")(x))
        e1 = nn.elu(Conv(self.expand1x1_planes, 1, padding=0, dtype=self.dtype,
                         name="expand1x1")(s))
        e3 = nn.elu(Conv(self.expand3x3_planes, 3, padding=1, dtype=self.dtype,
                         name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class DFire(nn.Module):
    """[expand1x1 || expand3x3] -> ELU -> concat -> squeeze 1x1 -> ELU
    (reference squeezenet.py:29-52)."""

    squeeze_planes: int
    expand1x1_planes: int
    expand3x3_planes: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        e1 = nn.elu(Conv(self.expand1x1_planes, 1, padding=0, dtype=self.dtype,
                         name="expand1x1")(x))
        e3 = nn.elu(Conv(self.expand3x3_planes, 3, padding=1, dtype=self.dtype,
                         name="expand3x3")(x))
        y = jnp.concatenate([e1, e3], axis=-1)
        return nn.elu(Conv(self.squeeze_planes, 1, padding=0, dtype=self.dtype,
                           name="squeeze")(y))


class SqueezeNet(nn.Module):
    """reference lib/models/squeezenet.py:68-151."""

    in_channels: int = 3
    num_classes: int = 1
    s2d: bool = False  # s2d execution of the full-res level (exact math)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        use_s2d = self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if use_s2d:
            # stem conv (96ch @ full res, 1.33x lane-padded) runs dense in
            # s2d space; the skip stays s2d for the head (segtpu.ops.s2d)
            from segtpu.models.layers import S2DConv
            from segtpu.ops.s2d import (
                d2s, s2d, s2d_max_pool_exit, s2d_tile_channels)

            conv1s = S2DConv(96, 3, dtype=dt, name="conv1")(s2d(x))
            pool1 = s2d_max_pool_exit(conv1s)
        else:
            conv1 = Conv(96, 3, padding=1, dtype=dt, name="conv1")(x)
            pool1 = max_pool(conv1)

        fire2 = Fire(16, 64, 64, dt, name="fire2")(pool1)
        fire3 = Fire(16, 64, 64, dt, name="fire3")(fire2)
        fire4 = Fire(48, 128, 128, dt, name="fire4")(fire3)
        pool4 = max_pool(fire4)

        fire5 = Fire(48, 128, 128, dt, name="fire5")(pool4)
        fire6 = Fire(48, 192, 192, dt, name="fire6")(fire5)
        fire7 = Fire(48, 192, 192, dt, name="fire7")(fire6)
        fire8 = Fire(64, 256, 256, dt, name="fire8")(fire7)
        pool8 = max_pool(fire8)

        fire9 = Fire(64, 256, 256, dt, name="fire9")(pool8)
        center = nn.elu(Conv(1024, 1, padding=0, dtype=dt, name="conv10")(fire9))
        center = nn.elu(Conv(512, 1, padding=0, dtype=dt, name="dconv10")(center))

        d9 = DFire(512, 256, 256, dt, name="dfire9")(center)
        d9 = upsample_nearest(d9)
        d8 = DFire(384, 256, 256, dt, name="dfire8")(d9 + fire8)
        d7 = DFire(384, 192, 192, dt, name="dfire7")(d8)
        d6 = DFire(256, 192, 192, dt, name="dfire6")(d7)
        d5 = DFire(256, 128, 128, dt, name="dfire5")(d6)

        d5 = upsample_nearest(d5)
        d4 = DFire(128, 128, 128, dt, name="dfire4")(d5 + fire4)
        d3 = DFire(128, 64, 64, dt, name="dfire3")(d4)
        d2 = DFire(96, 48, 48, dt, name="dfire2")(d3)

        if use_s2d:
            # nearest-2x upsample of d2 is a channel tile in s2d space; the
            # additive skip and the 1x1 head stay s2d, one d2s at the end
            summed = conv1s + s2d_tile_channels(d2)
            out = S2DConv(self.num_classes, 1, dtype=dt, name="dconv1")(summed)
            return d2s(out).astype(jnp.float32)
        d2 = upsample_nearest(d2)
        out = Conv(self.num_classes, 1, padding=0, dtype=dt, name="dconv1")(d2 + conv1)
        return out.astype(jnp.float32)


@register("squeezenet")
def _squeezenet(patch_size, num_channels):
    return SqueezeNet(num_classes=1, in_channels=3)
