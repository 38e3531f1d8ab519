"""FC-DenseNet "Tiramisu" 57/67/103 (reference lib/models/tiramisu.py:93-205).

The memory/recompute stress case (SURVEY.md §7): dense blocks concatenate
every layer's output, so activation memory grows quadratically with depth.
TPU-native handling: optional per-block ``nn.remat`` (rematerialization) so
the backward pass recomputes block activations instead of keeping them in
HBM — the reference had to run batch=1 (run_all.cmd:5). MEASURED (round 2b,
v5e): XLA's own scheduling beats explicit remat at both benchmark shapes
(224^2 b16: 82.2 -> 103.5 img/s; 512^2 b4: 7.5 -> 8.8 img/s — XLA spills /
rematerializes selectively where the blanket per-block remat recomputes
everything), so ``remat`` now defaults OFF and remains the opt-in lever for
shapes that exceed HBM.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from segtpu.models import register
from segtpu.models.layers import (
    BatchNormTorch,
    Conv,
    ConvTranspose2dTorch,
    Dropout2d,
    max_pool,
)


class DenseLayer(nn.Module):
    """BN -> ReLU -> conv3x3 -> Dropout2d(0.2) (reference tiramisu.py:9-19).

    ``in_parts`` (s2d mode): the input is a lane-aligned block concat of s2d
    tensors with these true-channel sizes (segtpu.ops.s2d) — BN combines
    stats per part and the conv absorbs the canonical re-ordering into its
    expanded kernel; the output is a canonical s2d tensor."""

    growth_rate: int
    dtype: Optional[jnp.dtype] = None
    in_parts: Optional[tuple] = None
    tag_conv_in: bool = False  # checkpoint_name the post-BN-relu conv input
    # (only under the targeted remat policy — see FCDenseNet.remat_policy)

    def _tag(self, y):
        if self.tag_conv_in:
            from jax.ad_checkpoint import checkpoint_name
            return checkpoint_name(y, "dl_conv_in")
        return y

    @nn.compact
    def __call__(self, x, train: bool):
        if self.in_parts is not None:
            from segtpu.models.layers import S2DConv
            from segtpu.ops.s2d import blocked_perm

            features = sum(self.in_parts)
            y = BatchNormTorch(features, stat_parts=self.in_parts, name="norm")(
                x, use_running_average=not train)
            y = self._tag(nn.relu(y))
            y = S2DConv(self.growth_rate, 3, dtype=self.dtype,
                        in_perm=blocked_perm(self.in_parts), name="conv")(y)
            return Dropout2d(0.2, groups=4, name="drop")(y, deterministic=not train)
        y = BatchNormTorch(x.shape[-1], name="norm")(x, use_running_average=not train)
        y = self._tag(nn.relu(y))
        y = Conv(self.growth_rate, 3, padding=1, dtype=self.dtype, name="conv")(y)
        return Dropout2d(0.2, name="drop")(y, deterministic=not train)


class DenseBlock(nn.Module):
    """Concatenative growth (reference tiramisu.py:22-44). ``upsample=True``
    returns only the newly produced features.

    ``in_parts`` (s2d mode, non-upsample only): the running concat stays a
    lane-aligned block layout; each layer handles it via ``in_parts``.
    When both ``in_parts`` and ``packed`` are set, the s2d block layout
    takes precedence and this block keeps the concat formulation — packed
    growth applies only to normal-space blocks."""

    growth_rate: int
    n_layers: int
    upsample: bool = False
    dtype: Optional[jnp.dtype] = None
    in_parts: Optional[tuple] = None
    packed: bool = False
    remat_policy: Optional[str] = None  # see FCDenseNet.remat_policy

    def _layer_cls(self):
        """DenseLayer, optionally checkpointed with the targeted policy:
        per-LAYER ``jax.checkpoint`` whose residual set is ONLY the tagged
        post-BN-relu conv input (save_only_these_names) — the backward's
        dgrad reads a saved tensor instead of re-deriving the BN/relu chain
        inside its fusion, and everything else (the cheap elementwise chain
        + BN stat sums over the already-resident block input) recomputes."""
        if self.remat_policy is None:
            return DenseLayer
        import functools

        import jax as _jax
        assert self.remat_policy == "conv_in", self.remat_policy
        policy = _jax.checkpoint_policies.save_only_these_names("dl_conv_in")
        return functools.partial(
            nn.remat(DenseLayer, static_argnums=(2,), policy=policy),
            tag_conv_in=True,
        )

    @nn.compact
    def __call__(self, x, train: bool):
        Layer = self._layer_cls()
        if self.in_parts is not None:
            assert not self.upsample
            parts = tuple(self.in_parts)
            for i in range(self.n_layers):
                out = Layer(self.growth_rate, self.dtype, in_parts=parts,
                            name=f"layer{i}")(x, train)
                x = jnp.concatenate([x, out], axis=-1)
                parts = parts + (self.growth_rate,)
            return x
        if self.packed:
            # Packed growth: one preallocated buffer, each layer appended via
            # a static-offset dynamic_update_slice instead of rebuilding the
            # running concat (the concat formulation rewrites all prior
            # channels every layer — O(n^2·g) HBM writes). Exact math: the
            # zero-filled tail is never read before it is written.
            ch_axis = x.ndim - 1
            n_in = x.shape[-1]
            total = n_in + self.n_layers * self.growth_rate
            buf = jnp.zeros(x.shape[:-1] + (total,), x.dtype)
            buf = lax.dynamic_update_slice_in_dim(buf, x, 0, ch_axis)
            c = n_in
            for i in range(self.n_layers):
                out = Layer(self.growth_rate, self.dtype,
                            name=f"layer{i}")(
                    lax.slice_in_dim(buf, 0, c, axis=ch_axis), train)
                buf = lax.dynamic_update_slice_in_dim(
                    buf, out.astype(buf.dtype), c, ch_axis)
                c += self.growth_rate
            if self.upsample:
                return lax.slice_in_dim(buf, n_in, total, axis=ch_axis)
            return buf
        new_features = []
        for i in range(self.n_layers):
            out = Layer(self.growth_rate, self.dtype, name=f"layer{i}")(x, train)
            x = jnp.concatenate([x, out], axis=-1)
            new_features.append(out)
        if self.upsample:
            return jnp.concatenate(new_features, axis=-1)
        return x


class TransitionDown(nn.Module):
    """BN -> ReLU -> conv1x1 -> Dropout2d(0.2) -> maxpool2
    (reference tiramisu.py:47-59).

    ``in_parts`` (s2d mode): block-layout input; the maxpool is the s2d
    exit pool, so the output is a NORMAL-space half-resolution tensor."""

    dtype: Optional[jnp.dtype] = None
    in_parts: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.in_parts is not None:
            from segtpu.models.layers import S2DConv
            from segtpu.ops.s2d import blocked_perm, s2d_max_pool_exit

            features = sum(self.in_parts)
            y = BatchNormTorch(features, stat_parts=self.in_parts, name="norm")(
                x, use_running_average=not train)
            y = nn.relu(y)
            y = S2DConv(features, 1, dtype=self.dtype,
                        in_perm=blocked_perm(self.in_parts), name="conv")(y)
            y = Dropout2d(0.2, groups=4, name="drop")(y, deterministic=not train)
            return s2d_max_pool_exit(y)
        y = BatchNormTorch(x.shape[-1], name="norm")(x, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(x.shape[-1], 1, padding=0, dtype=self.dtype, name="conv")(y)
        y = Dropout2d(0.2, name="drop")(y, deterministic=not train)
        return max_pool(y)


def _center_crop(layer, h, w):
    """(reference center_crop, tiramisu.py:86-90) — NHWC."""
    lh, lw = layer.shape[1], layer.shape[2]
    y0 = (lh - h) // 2
    x0 = (lw - w) // 2
    return layer[:, y0:y0 + h, x0:x0 + w, :]


class TransitionUp(nn.Module):
    """deconv(k3,s2) -> center-crop to skip -> concat (reference
    tiramisu.py:62-73)."""

    out_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, skip):
        y = ConvTranspose2dTorch(self.out_channels, 3, 2, dtype=self.dtype,
                                 name="convTrans")(x)
        y = _center_crop(y, skip.shape[1], skip.shape[2])
        return jnp.concatenate([y, skip], axis=-1)


class FCDenseNet(nn.Module):
    """reference FCDenseNet (tiramisu.py:93-205), NHWC + per-block remat."""

    in_channels: int = 3
    down_blocks: Sequence[int] = (5, 5, 5, 5, 5)
    up_blocks: Sequence[int] = (5, 5, 5, 5, 5)
    bottleneck_layers: int = 5
    growth_rate: int = 16
    out_chans_first_conv: int = 48
    n_classes: int = 12
    remat: bool = False
    s2d: bool = False  # s2d execution of the full-res level (exact math)
    packed: bool = False  # packed dense-block growth (exact math, see DenseBlock)
    remat_policy: Optional[str] = None  # "conv_in": per-DENSE-LAYER
    # jax.checkpoint saving ONLY the tagged post-BN-relu conv inputs
    # (save_only_these_names) — the targeted alternative to blanket
    # per-block remat, aimed at the re-derivation traffic the byte-floor
    # analysis blames (BASELINE.md "Tiramisu concat-traffic floor");
    # measured win-or-negative row lives next to that table
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        Block = nn.remat(DenseBlock, static_argnums=(2,)) if self.remat else DenseBlock
        import functools
        if self.packed:
            Block = functools.partial(Block, packed=True)
        if self.remat_policy is not None:
            assert not self.remat, "remat and remat_policy are exclusive"
            Block = functools.partial(Block, remat_policy=self.remat_policy)
        use_s2d = self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0

        skips = []
        if use_s2d:
            from segtpu.models.layers import S2DConv
            from segtpu.ops.s2d import s2d

            out = S2DConv(self.out_chans_first_conv, 3, dtype=self.dtype,
                          name="firstconv")(s2d(x))
            parts = (self.out_chans_first_conv,)
            n0 = self.down_blocks[0]
            out = Block(self.growth_rate, n0, dtype=self.dtype, in_parts=parts,
                        name="denseDown0")(out, train)
            parts = parts + (self.growth_rate,) * n0
            # the full-res skip stays blocked-s2d; converted once where the
            # (normal-space) up path consumes it
            skips.append(("s2d", out, parts))
            out = TransitionDown(dtype=self.dtype, in_parts=parts,
                                 name="transDown0")(out, train)
            down_rest = list(enumerate(self.down_blocks))[1:]
        else:
            out = Conv(self.out_chans_first_conv, 3, padding=1, dtype=self.dtype,
                       name="firstconv")(x)
            down_rest = list(enumerate(self.down_blocks))

        for i, n in down_rest:
            out = Block(self.growth_rate, n, dtype=self.dtype,
                        name=f"denseDown{i}")(out, train)
            skips.append(out)
            out = TransitionDown(dtype=self.dtype, name=f"transDown{i}")(out, train)

        out = Block(self.growth_rate, self.bottleneck_layers, upsample=True,
                    dtype=self.dtype, name="bottleneck")(out, train)

        for i, n in enumerate(self.up_blocks):
            skip = skips.pop()
            if isinstance(skip, tuple) and skip[0] == "s2d":
                from segtpu.ops.s2d import d2s_parts
                skip = d2s_parts(skip[1], skip[2])
            last = i == len(self.up_blocks) - 1
            out = TransitionUp(out.shape[-1], dtype=self.dtype,
                               name=f"transUp{i}")(out, skip)
            out = Block(self.growth_rate, n, upsample=not last,
                        dtype=self.dtype, name=f"denseUp{i}")(out, train)

        out = Conv(self.n_classes, 1, padding=0, dtype=self.dtype,
                   name="finalConv")(out)
        return out.astype(jnp.float32)


def FCDenseNet57(n_classes: int = 1, **kw) -> FCDenseNet:
    return FCDenseNet(down_blocks=(4,) * 5, up_blocks=(4,) * 5,
                      bottleneck_layers=4, growth_rate=12,
                      out_chans_first_conv=48, n_classes=n_classes, **kw)


def FCDenseNet67(n_classes: int = 1, **kw) -> FCDenseNet:
    return FCDenseNet(down_blocks=(5,) * 5, up_blocks=(5,) * 5,
                      bottleneck_layers=5, growth_rate=16,
                      out_chans_first_conv=48, n_classes=n_classes, **kw)


def FCDenseNet103(n_classes: int = 1, **kw) -> FCDenseNet:
    return FCDenseNet(down_blocks=(4, 5, 7, 10, 12), up_blocks=(12, 10, 7, 5, 4),
                      bottleneck_layers=15, growth_rate=16,
                      out_chans_first_conv=48, n_classes=n_classes, **kw)


@register("tiramisu67")
def _tiramisu67(patch_size, num_channels):
    return FCDenseNet67(n_classes=1)


@register("tiramisu57")
def _tiramisu57(patch_size, num_channels):
    return FCDenseNet57(n_classes=1)


@register("tiramisu103")
def _tiramisu103(patch_size, num_channels):
    return FCDenseNet103(n_classes=1)
