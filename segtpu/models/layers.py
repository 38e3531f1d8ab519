"""Shared Flax layers: torch-semantics BatchNorm, ABN, InPlaceABN, helpers.

NHWC layout throughout. BatchNorm reproduces torch semantics for running-stat
parity with the reference (reference lib/modules/abn/functions.py:85-88):
``running = (1 - momentum) * running + momentum * batch_stat`` with the
*unbiased* variance correction in the running var, while normalization uses
the biased batch variance.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from segtpu.ops import abn as abn_ops

# Diagnostic switch for the controlled A/B ladder — see Dropout2d docstring.
import os as _os_top

DROPOUT_DISABLED = _os_top.environ.get("SEGTPU_DISABLE_DROPOUT", "") == "1"


class BatchNormTorch(nn.Module):
    """BatchNorm2d with torch running-stat semantics (NHWC, channel-last).

    Under jit over a batch-sharded mesh the (N,H,W) reductions are global, so
    this is synchronized BN for free; ``axis_name`` adds explicit pmean for
    shard_map/pmap contexts (SURVEY.md §2.8).

    ``stat_groups`` > 1: the input carries ``stat_groups`` s2d sub-positions
    per true channel (C_in = stat_groups * features, sub-position-major, see
    segtpu.ops.s2d) — statistics are combined across the sub-positions so
    they equal the normal-space values exactly (equal counts per group),
    and params/running stats keep their [features] shapes (checkpoint
    compatible).

    ``stat_parts``: block-layout variant — the input is a PLAIN concat of
    s2d tensors, part p spanning ``4 * stat_parts[p]`` channels with its own
    sub-position-major layout (sum(stat_parts) == features). Used by dense
    blocks whose running concat stays lane-aligned (segtpu.ops.s2d
    ``blocked_perm``).
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    use_running_average: Optional[bool] = None
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    stat_groups: int = 1
    stat_parts: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        parts = self.stat_parts
        if parts is None and self.stat_groups > 1:
            parts = (self.features,)
        if parts is not None:
            assert sum(parts) == self.features, (parts, self.features)
            assert x.shape[-1] == 4 * self.features, (x.shape, self.features)
        else:
            assert x.shape[-1] == self.features, (x.shape, self.features)
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
            rstd = jax.lax.rsqrt(var + self.eps)
            w = scale * rstd
            b = bias
            if parts is not None:
                mean = abn_ops._expand_parts(mean, parts)
                w = abn_ops._expand_parts(w, parts)
                b = abn_ops._expand_parts(b, parts)
            return (x - mean.astype(x.dtype)) * w.astype(x.dtype) + b.astype(x.dtype)

        # Training: custom-VJP BN (abn.bn_train) with the exact torch
        # training backward. SEGTPU_BN_IMPL=autodiff switches to the plain
        # autodiff formula (A/B lever; the custom VJP measured equal on the
        # unet family) — see the abn module docstring for the full switch.
        if abn_ops._bn_impl() == "autodiff":
            xf = x.astype(jnp.float32)
            mean_s, var_s = abn_ops.batch_mean_var(xf, self.axis_name)
            if parts is not None:
                mean, var = abn_ops._combine_parts(
                    mean_s, var_s + jnp.square(mean_s), parts)
            else:
                mean, var = mean_s, var_s
            rstd = jax.lax.rsqrt(var + self.eps)
            w = scale * rstd
            b = bias
            if parts is not None:
                mean_e = abn_ops._expand_parts(mean, parts)
                w = abn_ops._expand_parts(w, parts)
                b = abn_ops._expand_parts(b, parts)
            else:
                mean_e = mean
            y = (x - mean_e.astype(x.dtype)) * w.astype(x.dtype) + b.astype(x.dtype)
        else:
            y, mean, var = abn_ops.bn_train_stats(
                x, scale, bias, eps=self.eps, parts=parts,
                axis_name=self.axis_name,
            )
        if not self.is_initializing():
            count = x.size // self.features
            unbiased = var * (count / max(count - 1, 1))
            ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
            ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        return y


class ABN(nn.Module):
    """Plain (non-fused) BN + activation (reference lib/modules/abn/bn.py:23-44)."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    activation: str = abn_ops.ACT_LEAKY_RELU
    slope: float = 0.01
    use_running_average: Optional[bool] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        y = BatchNormTorch(
            self.features,
            eps=self.eps,
            momentum=self.momentum,
            use_running_average=self.use_running_average,
            axis_name=self.axis_name,
            name="bn",
        )(x, use_running_average)
        return abn_ops._act_forward(y, self.activation, self.slope)


class InPlaceABN(nn.Module):
    """Fused activated BN (reference lib/modules/abn/bn.py:47-103).

    Uses :func:`segtpu.ops.abn.fused_abn` — memory-saving custom VJP (the
    input is never saved for backward) with a Pallas normalize+activate
    kernel on TPU. Also covers InPlaceABNSync (bn.py:106-190): with a
    batch-sharded mesh the statistics are globally reduced by XLA.

    ``stat_groups`` > 1 (s2d execution, cf. BatchNormTorch): the input
    carries 4 s2d sub-positions per true channel; statistics are combined
    across the sub-positions (values and grads equal the normal-space ABN
    exactly) while params/running stats keep their ``[features]`` shapes,
    so checkpoints/transplants are unaffected.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    activation: str = abn_ops.ACT_LEAKY_RELU
    slope: float = 0.01
    use_running_average: Optional[bool] = None
    axis_name: Optional[str] = None
    stat_groups: int = 1

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        parts = (self.features,) if self.stat_groups > 1 else None
        if parts is not None:
            assert x.shape[-1] == 4 * self.features, (x.shape, self.features)
        else:
            assert x.shape[-1] == self.features, (x.shape, self.features)
        gamma = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if use_ra:
            return abn_ops.fused_abn(
                x, gamma, beta,
                mean=ra_mean.value, var=ra_var.value, training=False,
                eps=self.eps, activation=self.activation, slope=self.slope,
                parts=parts,
            )

        z, mean, var = abn_ops.fused_abn(
            x, gamma, beta, training=True,
            eps=self.eps, activation=self.activation, slope=self.slope,
            axis_name=self.axis_name, parts=parts,
        )
        if not self.is_initializing():
            count = x.size // self.features
            unbiased = var * (count / max(count - 1, 1))
            ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
            ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        return z


def max_pool(x, window: int = 2, stride: int = 2, padding="VALID"):
    """2x2 max pooling, NHWC (torch nn.MaxPool2d(2) equivalent).

    The common 2x2/2 case is a pure where-cascade over the window view:
    forward equals the max, and since ``where`` is linear in its branches
    the cotangent routes to the FIRST maximal position in row-major order —
    exactly torch's argmax semantics — with a fused elementwise backward
    instead of XLA's slow select-and-scatter (~7 ms/step on zf_unet-512).
    (Two custom-VJP variants measured SLOWER: explicit residuals in
    segtpu/ops/pool.py, and an equality-routed recompute backward —
    94.2 -> 98.3 ms/step on zf_unet-512 s2d; autodiff of the cascade wins
    because XLA packs the predicate masks and fuses the backward.) Gated to
    dense-lane channel counts (C >= 128): on lane-padded small-C tensors the
    strided window slices cost more than select-and-scatter saves
    (measured 110.1 -> 105.6 img/s ungated on zf_unet-512 normal path)."""
    if (window == 2 and stride == 2 and padding == "VALID"
            and x.shape[-1] >= 128
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        n, h, w, c = x.shape
        v = x.reshape(n, h // 2, 2, w // 2, 2, c)
        x00, x01 = v[:, :, 0, :, 0, :], v[:, :, 0, :, 1, :]
        x10, x11 = v[:, :, 1, :, 0, :], v[:, :, 1, :, 1, :]
        top = jnp.where(x00 >= x01, x00, x01)
        bot = jnp.where(x10 >= x11, x10, x11)
        return jnp.where(top >= bot, top, bot)
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding=padding)


def upsample_nearest(x, scale: int = 2):
    """Nearest-neighbor 2x upsample (torch nn.Upsample(scale_factor=2))."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, scale, w, scale, c))
    return x.reshape(n, h * scale, w * scale, c)


def upsample_bilinear(x, out_hw, align_corners: bool = True):
    """Bilinear resize matching torch F.upsample(mode='bilinear') defaults.

    torch<=0.4 default was align_corners semantics for these models; jax.image
    'linear' is half-pixel (align_corners=False). Implement align_corners=True
    via explicit gather weights for parity with reference GCN/PSP/DUC heads.
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if align_corners and oh > 1 and ow > 1:
        ys = jnp.linspace(0.0, h - 1.0, oh)
        xs = jnp.linspace(0.0, w - 1.0, ow)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        wy = (ys - y0)[None, :, None, None]
        wx = (xs - x0)[None, None, :, None]
        g = lambda yi, xi: x[:, yi, :, :][:, :, xi, :]
        top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
        bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
        return top * (1 - wy) + bot * wy
    return jax.image.resize(x, (n, oh, ow, c), method="linear")


def pixel_shuffle(x, upscale: int):
    """PixelShuffle: (N,H,W,C*r^2) -> (N,H*r,W*r,C), matching torch channel order.

    torch PixelShuffle on NCHW views channels as (C, r, r); in NHWC the
    channel axis holds the same (C, r, r) layout flattened.
    """
    n, h, w, crr = x.shape
    r = upscale
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, c
    return x.reshape(n, h * r, w * r, c)


class Dropout2d(nn.Module):
    """torch nn.Dropout2d equivalent: channel-wise spatial dropout, NHWC.

    ``groups`` > 1 (s2d representation): one mask per TRUE channel, tiled
    over the sub-position-major channel groups so every sub-position of a
    channel drops together — exactly the normal-space channel mask.

    ``SEGTPU_DISABLE_DROPOUT=1`` (read once at import, process-start-only
    like ``DECONV_BWD``) turns every Dropout2d into identity — a DIAGNOSTIC
    switch for the controlled A/B ladder (tools/ab_ladder.py), where both
    frameworks' dropout must be off to make training fully deterministic.
    Never set in production runs."""

    rate: float
    groups: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0 or DROPOUT_DISABLED:
            return x
        # One make_rng at THIS module's scope for every groups value, so the
        # s2d (groups=4) and normal (groups=1) executions of the same model
        # draw identical channel masks (delegating groups=1 to a child
        # nn.Dropout would fold a different module path into the key).
        key = self.make_rng("dropout")
        c = x.shape[-1] // self.groups
        keep = jax.random.bernoulli(key, 1.0 - self.rate, (x.shape[0], 1, 1, c))
        if self.groups > 1:
            keep = jnp.tile(keep, (1, 1, 1, self.groups))
        return jnp.where(keep, x / (1.0 - self.rate), jnp.zeros_like(x))


# torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
torch_conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_conv_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Conv(nn.Module):
    """nn.Conv with torch-default initialization (NHWC)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: object = 0  # int pixels (torch-style) or a flax padding spec
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size if isinstance(self.kernel_size, tuple) else (
            self.kernel_size, self.kernel_size)
        if isinstance(self.padding, int):
            pad = [(self.padding, self.padding), (self.padding, self.padding)]
        else:
            pad = self.padding
        fan_in = (x.shape[-1] // self.groups) * k[0] * k[1]
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=(self.stride, self.stride),
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_conv_bias_init(fan_in),
        )(x)


class _S2DConvInner(nn.Module):
    """Holds the DENSE conv params (same shapes/init as ``nn.Conv`` inside
    :class:`Conv`) and applies them in s2d space via kernel expansion."""

    features: int
    kernel_size: int
    true_in_features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    in_perm: Optional[tuple] = None
    in_parts: Optional[tuple] = None  # (('s2d'|'fold', c), ...) — see s2d.expand_kernel_parts

    @nn.compact
    def __call__(self, x):
        from segtpu.ops.s2d import _axis_tables, expand_kernel_parts, s2d_kernel

        k = self.kernel_size
        kernel = self.param(
            "kernel", torch_conv_kernel_init,
            (k, k, self.true_in_features, self.features), jnp.float32,
        )
        dtype = self.dtype or x.dtype
        if self.in_parts is not None:
            # mixed s2d / folded-upsample blocked concat input
            kp = expand_kernel_parts(kernel.astype(dtype), self.in_parts)
        else:
            kp = s2d_kernel(kernel.astype(dtype))
        if self.in_perm is not None:
            # input arrives as a block-wise (lane-aligned) concat of s2d
            # tensors; absorb the re-ordering into the tiny expanded kernel
            kp = kp[:, :, jnp.asarray(self.in_perm, jnp.int32), :]
        A, _ = _axis_tables(k)  # odd k -> symmetric block-tap window
        pad = A.shape[0] // 2
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kp, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = self.true_in_features * k * k
            bias = self.param(
                "bias", torch_conv_bias_init(fan_in), (self.features,), jnp.float32
            )
            y = y + jnp.tile(bias, 4).astype(dtype)
        return y


class S2DConv(nn.Module):
    """Stride-1 SAME conv evaluated in space-to-depth representation
    (segtpu.ops.s2d): input/output are [N, H/2, W/2, 4C] with dense 128-lane
    channels instead of 4x-padded [N, H, W, C] tiles. Parameter tree is
    identical to :class:`Conv` (``Conv_0/{kernel,bias}`` with the dense
    shapes), so checkpoints/transplants are unaffected."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    in_perm: Optional[tuple] = None
    in_parts: Optional[tuple] = None

    @nn.compact
    def __call__(self, x):
        if self.in_parts is not None:
            true_in = sum(c for _, c in self.in_parts)
        else:
            true_in = x.shape[-1] // 4
        return _S2DConvInner(
            self.features, self.kernel_size, true_in,
            use_bias=self.use_bias, dtype=self.dtype, in_perm=self.in_perm,
            in_parts=self.in_parts, name="Conv_0",
        )(x)


class _DeconvS2DInner(nn.Module):
    """Holds the DENSE transposed-conv params (same shapes/init as the
    ``nn.ConvTranspose`` inside :class:`ConvTranspose2dTorch`) and applies
    them via :func:`segtpu.ops.s2d.deconv_s2d_kernel` — the output is the
    s2d layout of the (k=4, s=2, p=1) deconv, emitted directly at input
    resolution."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from segtpu.ops.s2d import deconv_s2d_kernel

        i = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (4, 4, self.features, i),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        kp = deconv_s2d_kernel(kernel.astype(dtype))
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kp, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_conv_bias_init(i * 16), (self.features,),
                jnp.float32,
            )
            y = y + jnp.tile(bias, 4).astype(dtype)
        return y


class DeconvS2D(nn.Module):
    """``ConvTranspose2dTorch(features, 4, 2, padding=1)`` evaluated so the
    result comes out in s2d representation ([N, H, W, 4*features] at input
    resolution == s2d of the [N, 2H, 2W, features] deconv output). Parameter
    tree is identical to :class:`ConvTranspose2dTorch`
    (``ConvTranspose_0/{kernel,bias}``), so checkpoints are unaffected."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return _DeconvS2DInner(self.features, self.use_bias, self.dtype,
                               name="ConvTranspose_0")(x)


def _deconv_s2_polyphase(x, kernel, bias=None):
    """Full (VALID) stride-2 transposed conv via polyphase decomposition.

    ``kernel`` is the flax transpose_kernel layout [k, k, OUT, IN] with
    DIRECT orientation: out[2j+a, 2i+b] += x[j,i,:] @ K[a,b].T (verified
    against nn.ConvTranspose). Each of the 4 output-parity phases is a
    tiny stride-1 conv AT INPUT RESOLUTION (taps K[dy::2, dx::2]); the
    full output is a reshape-interleave of the phases.

    MEASURED NEGATIVE (linknet34-512, v5e): wiring this into
    ConvTranspose2dTorch ran 74.2 -> 97.0 ms/step (+21 GB traffic) — the
    four phase tensors + pads + interleave materialize more than XLA's
    native conv_transpose lowering, which keeps everything in one fused
    emitter. Kept as a value+grad-tested reference implementation.
    """
    k = kernel.shape[0]
    n, h, w, _ = x.shape
    cout = kernel.shape[2]
    l_h, l_w = 2 * h + k - 2, 2 * w + k - 2
    kmax = (k + 1) // 2
    hm, wm = h + kmax - 1, w + kmax - 1
    phases = []
    for dy in range(2):
        row = []
        for dx in range(2):
            sub = kernel[dy::2, dx::2]              # [kdy, kdx, out, in]
            kdy, kdx = sub.shape[0], sub.shape[1]
            wk = jnp.flip(sub, axis=(0, 1)).transpose(0, 1, 3, 2)  # HWIO
            y = jax.lax.conv_general_dilated(
                x, wk, (1, 1), [(kdy - 1, kdy - 1), (kdx - 1, kdx - 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )                                        # (n, h+kdy-1, w+kdx-1, out)
            y = jnp.pad(y, ((0, 0), (0, hm - y.shape[1]),
                            (0, wm - y.shape[2]), (0, 0)))
            row.append(y)
        phases.append(row)
    # interleave: out[2j+dy, 2i+dx] = phases[dy][dx][j, i]
    stacked = jnp.stack(
        [jnp.stack(r, axis=3) for r in phases], axis=2
    )                                                # (n, hm, 2, wm, 2, out)
    full = stacked.reshape(n, 2 * hm, 2 * wm, cout)[:, :l_h, :l_w, :]
    if bias is not None:
        full = full + bias.astype(full.dtype)
    return full


def _deconv_full_cv(stride: int):
    """Full (VALID) stride-``s`` transposed conv with a reverse-free backward.

    Forward is bit-identical to flax ``nn.ConvTranspose(padding='VALID',
    transpose_kernel=True)`` (same ``lax.conv_transpose`` lowering — one
    fused emitter, measured optimal). The REVERSE-MODE rule is replaced:
    JAX's builtin transpose of the lhs-dilated conv materializes a spatial
    ``reverse`` of the full-resolution cotangent (e.g. bf16[16,225,225,32]
    on linknet34-224 — ~0.6 ms/step of pure HBM traffic on a 4x lane-padded
    tensor, the single largest non-conv op in the trace). The deconv is
    exactly the adjoint of a stride-``s`` VALID conv C with the SAME kernel,
    so both gradients are plain convs with no data movement:

      dx = C(dy, W)                 (stride-s VALID conv, MXU-native)
      dW = filter-grad of C at (dy -> x)   (standard conv filter-grad)

    Value-checked against the autodiff gradients (dx bit-exact, dW equal up
    to contraction order). Kernel layout [k, k, OUT, IN] (transpose_kernel).
    """
    s = (stride, stride)
    dn = ("NHWC", "HWIO", "NHWC")

    def _adjoint(a, w):
        return jax.lax.conv_general_dilated(a, w, s, "VALID", dimension_numbers=dn)

    @jax.custom_vjp
    def deconv(x, w):
        return jax.lax.conv_transpose(
            x, w, s, "VALID", dimension_numbers=dn, transpose_kernel=True)

    def fwd(x, w):
        return deconv(x, w), (x, w)

    def bwd(res, dy):
        x, w = res
        dx = _adjoint(dy, w)
        dw = jax.vjp(lambda ww: _adjoint(dy, ww), w)[1](x)[0]
        return dx, dw

    deconv.defvjp(fwd, bwd)
    return deconv


_DECONV_FULL_CV = {}

# Process-start-only switch: captured ONCE at import. Reading the env var at
# trace time looked flexible but was a trap — jit caches are not keyed on it,
# so flipping it after a train step compiled silently kept the old backward
# and an in-process A/B could measure the same path twice. Set it before the
# first segtpu import (the bench/roofline tools run each leg in its own
# subprocess, which is also what makes the measurement conditions honest).
import os as _os

DECONV_BWD = _os.environ.get("SEGTPU_DECONV_BWD", "rf")


def deconv_full(x, kernel, stride: int):
    """VALID transposed conv (reverse-free backward), any stride.

    ``SEGTPU_DECONV_BWD=autodiff`` (read once at import — see ``DECONV_BWD``
    above) routes through plain ``lax.conv_transpose`` (JAX's builtin
    reverse rule, which materializes a spatial ``reverse`` of the cotangent)
    — the A/B lever for the reverse-free backward; measurements in
    BASELINE.md. Note the custom VJP makes the default path reverse-mode
    only: ``jvp``/``linearize`` through deconv models require the autodiff
    setting.
    """
    if DECONV_BWD == "autodiff":
        return jax.lax.conv_transpose(
            x, kernel, (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    fn = _DECONV_FULL_CV.get(stride)
    if fn is None:
        fn = _DECONV_FULL_CV[stride] = _deconv_full_cv(stride)
    return fn(x, kernel)


class _ConvTransposeRF(nn.Module):
    """Param-tree-compatible stand-in for ``nn.ConvTranspose(padding='VALID',
    transpose_kernel=True)`` routing through :func:`deconv_full`. Instantiated
    with ``name='ConvTranspose_0'`` so checkpoints/transplants are unchanged."""

    features: int
    kernel_size: int
    stride: int
    use_bias: bool
    dtype: Optional[jnp.dtype]
    kernel_init: object
    bias_init: object

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, self.features, x.shape[-1]),
            jnp.float32,
        )
        bias = (self.param("bias", self.bias_init, (self.features,), jnp.float32)
                if self.use_bias else None)
        dt = self.dtype or jnp.result_type(x, kernel)
        y = deconv_full(x.astype(dt), kernel.astype(dt), self.stride)
        if bias is not None:
            y = y + bias.astype(dt)
        return y


class ConvTranspose2dTorch(nn.Module):
    """torch nn.ConvTranspose2d(k, stride, padding, output_padding) in NHWC.

    torch output size = (H-1)*stride - 2*padding + kernel + output_padding.
    flax nn.ConvTranspose with padding='VALID' computes the full transposed
    conv of size (H-1)*stride + kernel; torch's result is that full output
    cropped by ``padding`` at the start and ``padding - output_padding`` at
    the end of each spatial dim (zero-extended if negative — positions beyond
    the full extent receive no contributions, so zeros are exact).

    Production path: :class:`_ConvTransposeRF` / :func:`deconv_full` — XLA's
    one-emitter ``conv_transpose`` forward (measured optimal) with the
    reverse-free adjoint backward (both grads are plain convs; no spatial
    ``reverse`` of the cotangent). Identical math and identical parameter
    tree (scope/shape/init) to the nn.ConvTranspose lowering; grad-parity
    tests in tests/test_layers.py (``test_deconv_full_grads_match_autodiff``,
    ``test_linknet34_train_step_grads_match_autodiff_deconv``). The polyphase formulation
    (:func:`_deconv_s2_polyphase`) is kept only as a documented-negative
    alternative (BASELINE.md). Reverse-mode only by default — see
    :func:`deconv_full` for the ``SEGTPU_DECONV_BWD=autodiff`` escape hatch
    (restores jvp/forward-mode support).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        fan_in = x.shape[-1] * k * k
        # NOTE (measured, linknet34-512 v5e): routing s==2 through the
        # polyphase path below LOSES end-to-end — 74.2 -> 97.0 ms/step,
        # traffic 47.4 -> 68.7 GB (four phase tensors + pad + interleave
        # materialize more than XLA's native conv_transpose lowering).
        # The production path keeps that one-emitter FORWARD but swaps the
        # backward for the reverse-free adjoint formulation (_ConvTransposeRF
        # / deconv_full); _deconv_s2_polyphase is kept (value+grad-tested)
        # as the documented alternative.
        y = _ConvTransposeRF(
            features=self.features,
            kernel_size=k,
            stride=s,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_conv_bias_init(fan_in),
            name="ConvTranspose_0",
        )(x)
        end = p - self.output_padding
        if p > 0 or end > 0:
            y = y[:, p: y.shape[1] - max(end, 0), p: y.shape[2] - max(end, 0), :]
        if end < 0:
            y = jnp.pad(y, ((0, 0), (0, -end), (0, -end), (0, 0)))
        return y
