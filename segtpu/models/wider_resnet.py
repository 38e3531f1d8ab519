"""Wide ResNet classifier (reference lib/models/wider_resnet.py:48-84).

The reference's version is dead code with a broken forward (it references
undefined ``self.bn1``/``self.linear``, wider_resnet.py:79-82, and is never
imported by the harness). Rebuilt here as a *working* module with the
obviously-intended final BN + global pool + linear head; still not in the
segmentation registry (it is a classifier), matching upstream's non-use.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from segtpu.models.layers import BatchNormTorch, Conv


class WideBasic(nn.Module):
    """Pre-activation wide basic block (reference wider_resnet.py:25-46)."""

    planes: int
    dropout_rate: float = 0.0
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        in_planes = x.shape[-1]
        y = BatchNormTorch(in_planes, name="bn1")(x, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.planes, 3, padding=1, dtype=self.dtype, name="conv1")(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = BatchNormTorch(self.planes, name="bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.planes, 3, stride=self.stride, padding=1,
                 dtype=self.dtype, name="conv2")(y)
        if self.stride != 1 or in_planes != self.planes:
            sc = Conv(self.planes, 1, stride=self.stride, padding=0,
                      dtype=self.dtype, name="shortcut")(x)
        else:
            sc = x
        return y + sc


class WideResNet(nn.Module):
    """depth = 6n+4, width k (reference wider_resnet.py:48-76)."""

    depth: int = 28
    widen_factor: int = 10
    dropout_rate: float = 0.0
    num_classes: int = 10
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert (self.depth - 4) % 6 == 0, "Wide-resnet depth should be 6n+4"
        n = (self.depth - 4) // 6
        k = self.widen_factor
        stages = [16, 16 * k, 32 * k, 64 * k]

        y = Conv(stages[0], 3, padding=1, dtype=self.dtype, name="conv1")(x)
        for li, (planes, stride) in enumerate(zip(stages[1:], (1, 2, 2))):
            for b in range(n):
                y = WideBasic(planes, self.dropout_rate,
                              stride if b == 0 else 1, dtype=self.dtype,
                              name=f"layer{li + 1}_{b}")(y, train)
        # the reference's intended-but-missing head: BN -> relu -> GAP -> linear
        y = BatchNormTorch(stages[3], name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = jnp.mean(y, axis=(1, 2))
        return nn.Dense(self.num_classes, name="linear")(y)
