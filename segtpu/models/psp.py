"""PSPNet (reference lib/models/psp_net.py:42-96): dilated ResNet101
(stride 8), pyramid pooling module {1,2,3,6}, optional aux head.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from segtpu.models import register
from segtpu.models.encoders.resnet import resnet101
from segtpu.models.layers import BatchNormTorch, Conv, upsample_bilinear


def _adaptive_avg_pool(x, out: int):
    """torch AdaptiveAvgPool2d(out) for NHWC: average over equal-ish bins."""
    n, h, w, c = x.shape
    # torch computes bin i as [floor(i*h/out), ceil((i+1)*h/out))
    import numpy as np

    rows = [(int(np.floor(i * h / out)), int(np.ceil((i + 1) * h / out)))
            for i in range(out)]
    cols = [(int(np.floor(i * w / out)), int(np.ceil((i + 1) * w / out)))
            for i in range(out)]
    pooled = jnp.stack([
        jnp.stack([
            jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)) for (c0, c1) in cols
        ], axis=1)
        for (r0, r1) in rows
    ], axis=1)
    return pooled  # (n, out, out, c)


class PyramidPoolingModule(nn.Module):
    """adaptive-avg-pool {1,2,3,6} -> conv1x1 -> BN(momentum .95) -> ReLU ->
    bilinear upsample -> concat with input (reference psp_net.py:20-39)."""

    reduction_dim: int
    setting: Sequence[int] = (1, 2, 3, 6)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = x.shape[1], x.shape[2]
        out = [x]
        for s in self.setting:
            y = _adaptive_avg_pool(x, s)
            y = Conv(self.reduction_dim, 1, padding=0, use_bias=False,
                     dtype=self.dtype, name=f"conv_{s}")(y)
            # torch BatchNorm2d(momentum=.95) -> running update factor 0.95
            y = BatchNormTorch(self.reduction_dim, momentum=0.95,
                               name=f"bn_{s}")(y, use_running_average=not train)
            y = nn.relu(y)
            out.append(upsample_bilinear(y, (h, w)))
        return jnp.concatenate(out, axis=-1)


class PSPNet(nn.Module):
    """reference lib/models/psp_net.py:42-96."""

    num_classes: int = 1
    use_aux: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        enc = resnet101(dilated=True, dtype=self.dtype)
        stem, e1, e2, e3, e4 = enc.copy(name="encoder")(x, train)

        y = PyramidPoolingModule(512, dtype=self.dtype, name="ppm")(e4, train)
        y = Conv(512, 3, padding=1, use_bias=False, dtype=self.dtype,
                 name="final_conv")(y)
        y = BatchNormTorch(512, momentum=0.95, name="final_bn")(
            y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Dropout(0.1, deterministic=not train, name="final_drop")(y)
        y = Conv(self.num_classes, 1, padding=0, dtype=self.dtype,
                 name="final_cls")(y)

        out = upsample_bilinear(y, (h, w)).astype(jnp.float32)
        if train and self.use_aux:
            aux = Conv(self.num_classes, 1, padding=0, dtype=self.dtype,
                       name="aux_logits")(e3)
            return out, upsample_bilinear(aux, (h, w)).astype(jnp.float32)
        return out


@register("psp_net")
def _psp_net(patch_size, num_channels):
    # reference registry: PSPNet(pretrained=True, use_aux=False, num_classes=1)
    return PSPNet(num_classes=1, use_aux=False)
