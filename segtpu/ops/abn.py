"""Fused Activated BatchNorm (the TPU-native inplace-abn equivalent).

The reference's single native component is the external ``inplace_abn``
CUDA/C++ extension (reference lib/modules/abn/functions.py:1, ops used at
functions.py:81,94,112,118): a fused BN+activation whose backward
reconstructs gradients from the *output* tensor so the pre-activation input
never needs to be saved — halving activation memory for BN-heavy nets.

TPU-native rebuild:

  * ``fused_abn`` — a ``jax.custom_vjp`` op with the same memory-saving
    semantics: residuals are (output, var, gamma, beta), NOT the input. The
    backward inverts the activation analytically (leaky-relu and elu are
    bijective), recovers x_hat = (pre_act - beta) / gamma, computes the
    edz/eydz channel reductions, and reconstructs dx — mirroring
    ``backend.edz_eydz`` + ``backend.backward``
    (reference functions.py:104-122) as XLA ops.
  * Cross-device sync (the reference's InPlaceABNSync queue+comm machinery,
    functions.py:125-238) is replaced entirely by mesh semantics: under
    ``jit`` over a sharded batch the channel reductions are *global* arrays,
    so XLA inserts the ICI collectives automatically. An explicit
    ``axis_name`` is supported for ``shard_map``/``pmap`` contexts where
    reductions are per-shard (``lax.pmean`` — SURVEY.md §2.8).

The production compute path is the XLA composite — measured fastest across
seven alternative formulations (BASELINE.md "Roofline analysis"). The
alternates (Pallas fused norm-act, Pallas/dot/staged channel sums, forward
barrier) live in :mod:`segtpu.ops.bn_alt` and are selectable for A/B study
through ONE switch:

    SEGTPU_BN_IMPL = xla (default) | pallas | pallas_stats | dot_stats
                     | staged_stats | fwd_barrier | autodiff

(env var, read at trace time; or set ``abn.BN_IMPL_OVERRIDE`` in-process —
it takes precedence). ``tools/bn_bench.py --train-ab`` drives the full
matrix end-to-end and reproduces every recorded negative result.

Layout: NHWC (channel-last), reductions over (N, H, W).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

ACT_LEAKY_RELU = "leaky_relu"
ACT_ELU = "elu"
ACT_NONE = "none"

# The single BN-implementation switch (see module docstring). Tests set the
# override; benches set the env var per subprocess.
BN_IMPL_OVERRIDE: Optional[str] = None
_BN_IMPLS = ("xla", "pallas", "pallas_stats", "dot_stats", "staged_stats",
             "fwd_barrier", "autodiff")


def _bn_impl() -> str:
    impl = BN_IMPL_OVERRIDE or os.environ.get("SEGTPU_BN_IMPL", "xla")
    if impl not in _BN_IMPLS:
        raise ValueError(
            f"SEGTPU_BN_IMPL={impl!r}: expected one of {_BN_IMPLS}")
    return impl


def _pallas_interpret() -> bool:
    """Interpret mode lets the bn_alt kernels run (and be tested) on CPU."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


# ---------------------------------------------------------------------------
# Activation forward / inverse / derivative-from-output
# ---------------------------------------------------------------------------

def _act_forward(y: jnp.ndarray, activation: str, slope: float) -> jnp.ndarray:
    if activation == ACT_LEAKY_RELU:
        return jnp.where(y >= 0, y, y * slope)
    if activation == ACT_ELU:
        return jnp.where(y >= 0, y, jnp.expm1(y))
    return y


def _act_invert(z: jnp.ndarray, activation: str, slope: float) -> jnp.ndarray:
    """Recover pre-activation from the activated output (both bijective)."""
    if activation == ACT_LEAKY_RELU:
        return jnp.where(z >= 0, z, z / slope)
    if activation == ACT_ELU:
        return jnp.where(z >= 0, z, jnp.log1p(z))
    return z


def _act_grad_from_output(z: jnp.ndarray, activation: str, slope: float) -> jnp.ndarray:
    """d(activation)/d(pre_act) expressed via the *output* z."""
    if activation == ACT_LEAKY_RELU:
        return jnp.where(z >= 0, 1.0, slope)
    if activation == ACT_ELU:
        # for y<0: d elu/dy = exp(y) = z + 1
        return jnp.where(z >= 0, 1.0, z + 1.0)
    return jnp.ones_like(z)


# ---------------------------------------------------------------------------
# Channel sums (the BN-stat hot path)
# ---------------------------------------------------------------------------

def _bn_channel_sums(a2d, b2d=None):
    """(sum(a), sum(a*b)) over rows of [M, C] — b None means b = a.

    Production path: plain fp32 sum — XLA loop-fuses the convert+reduce with
    the producing op; every alternate formulation measured slower end-to-end
    (bn_alt module docstring has the numbers)."""
    impl = _bn_impl()
    if impl in ("dot_stats", "pallas_stats", "staged_stats"):
        from segtpu.ops import bn_alt
        r = bn_alt.channel_sums(impl, a2d, b2d)
        if r is not None:
            return r
    acc_t = jnp.promote_types(a2d.dtype, jnp.float32)
    af = a2d.astype(acc_t)
    bf = af if b2d is None else b2d.astype(acc_t)
    s = jnp.sum(af, axis=0)
    q = jnp.sum(af * bf, axis=0)
    return s, q


def batch_mean_var(x: jnp.ndarray, axis_name: Optional[str] = None):
    """Per-channel biased mean/var over all non-channel axes (NHWC).

    Equivalent of ``backend.mean_var`` (reference functions.py:81). With
    ``axis_name`` the moments are synchronized across that mapped axis — the
    replacement for InPlaceABNSync's gather/broadcast queues.
    """
    c = x.shape[-1]
    m = x.size // c
    s, q = _bn_channel_sums(x.reshape(m, c))
    mean, mean_sq = s / m, q / m
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
        mean_sq = lax.pmean(mean_sq, axis_name)
    var = mean_sq - jnp.square(mean)
    return mean, var


# ---------------------------------------------------------------------------
# Full training-mode BatchNorm with a shared-pass custom VJP (fwd AND bwd)
# ---------------------------------------------------------------------------
#
# Used by ``segtpu.models.layers.BatchNormTorch``. The autodiff backward of a
# plain normalize expression re-derives d_scale/d_bias as separate column
# reduces; this custom VJP computes both backward channel reductions in one
# fused pass over (g, x). Supports the s2d grouped/blocked statistics
# (``parts`` — see layers.BatchNormTorch docstring): statistics and parameter
# gradients are combined across the 4 sub-positions of each true channel, so
# values match the normal-space math exactly.
#
# Backward formula (reduction set = all elements of a channel group, size N):
#   d_beta  = sum(g);  d_gamma = sum(g * xhat) = (sum(g*x) - mu*sum(g)) * rstd
#   dx      = w*g - w*d_beta/N - w*rstd*(x - mu)*d_gamma/N,   w = gamma*rstd
# (exactly torch BatchNorm2d training backward; gradients flow through the
# batch statistics).


def _combine_parts(sub_mean, sub_msq, parts):
    """per-sub-channel stats [4F] -> dense [F] (exact; equal group counts)."""
    means, varis = [], []
    off = 0
    for cp in parts:
        m = sub_mean[off: off + 4 * cp].reshape(4, cp)
        q = sub_msq[off: off + 4 * cp].reshape(4, cp)
        gm = jnp.mean(m, axis=0)
        means.append(gm)
        varis.append(jnp.mean(q, axis=0) - jnp.square(gm))
        off += 4 * cp
    return jnp.concatenate(means), jnp.concatenate(varis)


def _sum_parts(v, parts):
    """group-sum a per-sub-channel vector [4F] -> dense [F]."""
    out, off = [], 0
    for cp in parts:
        out.append(v[off: off + 4 * cp].reshape(4, cp).sum(axis=0))
        off += 4 * cp
    return jnp.concatenate(out)


def _expand_parts(v, parts):
    """dense [F] -> blocked s2d layout [4F] (tile per part)."""
    out, off = [], 0
    for cp in parts:
        out.append(jnp.tile(v[off: off + cp], 4))
        off += cp
    return jnp.concatenate(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def bn_train(x, scale, bias, eps, parts, axis_name):
    """Training-mode BN: returns y, differentiable in (x, scale, bias) with
    the full torch training backward (gradients flow through batch stats).
    ``parts`` None = plain per-channel BN; else s2d blocked statistics.
    Use :func:`bn_train_stats` to also get (mean, var) for running stats."""
    y, _, _, _, _ = _bn_train_impl(x, scale, bias, eps, parts, axis_name)
    return y


def _bn_train_impl(x, scale, bias, eps, parts, axis_name):
    c_e = x.shape[-1]
    m = x.size // c_e
    x2d = x.reshape(m, c_e)
    s, q = _bn_channel_sums(x2d)
    if axis_name is not None:
        s = lax.psum(s, axis_name)
        q = lax.psum(q, axis_name)
        n_dev = lax.psum(jnp.ones((), jnp.float32), axis_name)
        count = m * n_dev
    else:
        count = jnp.float32(m)
    sub_mean = s / count
    sub_msq = q / count
    if parts is not None:
        mean, var = _combine_parts(sub_mean, sub_msq, parts)
        n_group = count * 4
    else:
        mean = sub_mean
        var = sub_msq - jnp.square(sub_mean)
        n_group = count
    rstd = lax.rsqrt(var + eps)
    w = scale * rstd
    if parts is not None:
        mean_e = _expand_parts(mean, parts)
        w_e = _expand_parts(w, parts)
        b_e = _expand_parts(bias, parts)
    else:
        mean_e, w_e, b_e = mean, w, bias
    y = (x - mean_e.astype(x.dtype)) * w_e.astype(x.dtype) + b_e.astype(x.dtype)
    return y, mean, var, rstd, n_group


def _bn_train_fwd(x, scale, bias, eps, parts, axis_name):
    y, mean, var, rstd, n_group = _bn_train_impl(x, scale, bias, eps, parts, axis_name)
    return y, (x, scale, mean, rstd, n_group)


def _bn_train_bwd(eps, parts, axis_name, res, g):
    x, scale, mean, rstd, n_group = res
    c_e = x.shape[-1]
    m = x.size // c_e
    x2d = x.reshape(m, c_e)
    # NOTE (measured): XLA loop-fuses the entire upstream elementwise chain
    # (relu-mask recompute, dropout select, concat-split, d2s pad/add
    # cascades) INTO this reduce fusion (trace: 4.8 ms / 6.1M est. cycles
    # for a 256 MB reduction). Barrier-materializing g first to get a pure
    # fast reduce was tried and LOST (94.2 -> 100.8 ms/step, +5.5 GB
    # traffic): the extra cotangent writes cost more than the slow fused
    # emitter. Left un-barriered deliberately.
    g2d = g.reshape(m, c_e)
    edz_sub, egx_sub = _bn_channel_sums(g2d, x2d)
    if axis_name is not None:
        edz_sub = lax.psum(edz_sub, axis_name)
        egx_sub = lax.psum(egx_sub, axis_name)
    if parts is not None:
        d_bias = _sum_parts(edz_sub, parts)
        sgx = _sum_parts(egx_sub, parts)
    else:
        d_bias = edz_sub
        sgx = egx_sub
    d_scale = (sgx - mean * d_bias) * rstd
    w = scale * rstd
    a = w * d_bias / n_group                     # w * mean_G(g)
    b2 = scale * jnp.square(rstd) * d_scale / n_group  # w * rstd * mean_G(g*xhat)
    if parts is not None:
        w_e = _expand_parts(w, parts)
        a_e = _expand_parts(a, parts)
        b2_e = _expand_parts(b2, parts)
        mean_e = _expand_parts(mean, parts)
    else:
        w_e, a_e, b2_e, mean_e = w, a, b2, mean
    dx = (
        w_e.astype(x.dtype) * g
        - a_e.astype(x.dtype)
        - (x - mean_e.astype(x.dtype)) * b2_e.astype(x.dtype)
    )
    return dx, d_scale.astype(scale.dtype), d_bias.astype(scale.dtype)


bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


def bn_train_stats(x, scale, bias, *, eps=1e-5, parts=None, axis_name=None):
    """Differentiable training BN + the dense (mean, var) for running stats.

    The stats are recomputed outside the custom-VJP op from the same sums —
    XLA CSEs the duplicate dots, so there is no extra pass; keeping them
    outside the VJP means their (unused) cotangents never exist."""
    if _bn_impl() == "fwd_barrier":
        # A/B experiment: split the conv+stats kOutput fusion (measured
        # slower — bn_alt docstring).
        x = lax.optimization_barrier(x)
    y = bn_train(x, scale, bias, eps, parts, axis_name)
    xf = lax.stop_gradient(x)
    c_e = x.shape[-1]
    m = x.size // c_e
    s, q = _bn_channel_sums(xf.reshape(m, c_e))
    if axis_name is not None:
        s = lax.psum(s, axis_name)
        q = lax.psum(q, axis_name)
        n_dev = lax.psum(jnp.ones((), jnp.float32), axis_name)
        count = m * n_dev
    else:
        count = jnp.float32(m)
    sub_mean, sub_msq = s / count, q / count
    if parts is not None:
        mean, var = _combine_parts(sub_mean, sub_msq, parts)
    else:
        mean = sub_mean
        var = sub_msq - jnp.square(sub_mean)
    return y, mean, var


# ---------------------------------------------------------------------------
# Core fused op with memory-saving custom VJP
# ---------------------------------------------------------------------------

@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def _fused_abn_train(x, gamma, beta, mean, var, eps, activation, slope,
                     axis_name, parts):
    """Normalize with given batch stats, affine, activate. Differentiable in
    (x, gamma, beta); stats are treated as *functions of x* in the VJP, i.e.
    full training-mode BN backward (matches inplace-abn).

    ``parts`` (s2d grouped statistics): x's channels are 4 s2d sub-positions
    per true channel; gamma/beta/mean/var arrive PRE-EXPANDED to [4F]
    (``_expand_parts``) and the backward's edz/eydz group means combine the
    sub-positions so dx equals the normal-space training backward exactly.
    The [4F] dgamma/dbeta cotangents flow back through the caller's
    differentiable expand (tile backward = group sum)."""
    return _abn_apply(x, gamma, beta, mean, var, eps, activation, slope)


def _abn_apply(x, gamma, beta, mean, var, eps, activation, slope):
    rstd = lax.rsqrt(var + eps)
    scale = gamma * rstd
    shift = beta - mean * scale
    if _bn_impl() == "pallas" and x.ndim >= 2 and x.dtype == jnp.float32:
        from segtpu.ops import bn_alt
        shp = x.shape
        x2d = x.reshape(-1, shp[-1])
        out = bn_alt.abn_norm_act_pallas(
            x2d, scale.astype(x.dtype), shift.astype(x.dtype), activation, slope
        )
        return out.reshape(shp)
    y = x * scale.astype(x.dtype) + shift.astype(x.dtype)
    return _act_forward(y, activation, slope)


def _fused_abn_train_fwd(x, gamma, beta, mean, var, eps, activation, slope,
                         axis_name, parts):
    z = _abn_apply(x, gamma, beta, mean, var, eps, activation, slope)
    # Memory-saving residuals: the input x is NOT saved.
    count = x.size // x.shape[-1]
    return z, (z, gamma, beta, var, count)


def _fused_abn_train_bwd(eps, activation, slope, axis_name, parts, res, g):
    z, gamma, beta, var, count = res
    c = z.shape[-1]
    rstd = lax.rsqrt(var + eps)

    if _bn_impl() == "pallas" and z.ndim >= 2 and z.dtype == jnp.float32:
        from segtpu.ops import bn_alt
        z2d = z.reshape(-1, c)
        g2d = g.reshape(-1, c)
        edz, eydz = bn_alt.abn_bwd_pallas(z2d, g2d, gamma, beta, activation, slope)
    else:
        edz = eydz = None

    # Elementwise reconstruction (XLA fuses this with the dx expression).
    dz_act = _act_grad_from_output(z, activation, slope)
    dy = g * dz_act
    y = _act_invert(z, activation, slope)
    xhat = (y - beta.astype(z.dtype)) / gamma.astype(z.dtype)

    axes = tuple(range(z.ndim - 1))
    if edz is None:
        edz = jnp.sum(dy, axis=axes)
        eydz = jnp.sum(xhat * dy, axis=axes)

    if axis_name is not None:
        n_dev = lax.psum(jnp.ones((), jnp.float32), axis_name)
        edz_g = lax.psum(edz, axis_name)
        eydz_g = lax.psum(eydz, axis_name)
        n_sub = count * n_dev
    else:
        edz_g, eydz_g, n_sub = edz, eydz, count
    if parts is not None:
        # grouped s2d statistics: the normalization group of a true channel
        # spans its 4 sub-positions, so the backward means combine them
        edz_mean = _expand_parts(_sum_parts(edz_g, parts) / (n_sub * 4), parts)
        eydz_mean = _expand_parts(_sum_parts(eydz_g, parts) / (n_sub * 4), parts)
    else:
        edz_mean = edz_g / n_sub
        eydz_mean = eydz_g / n_sub

    dx = (
        (dy - edz_mean.astype(z.dtype) - xhat * eydz_mean.astype(z.dtype))
        * (gamma * rstd).astype(z.dtype)
    )
    dgamma = eydz.astype(gamma.dtype)
    dbeta = edz.astype(beta.dtype)
    # mean/var received zero cotangents: their dependence on x is already
    # folded into the dx expression above (training-mode BN backward).
    return dx, dgamma, dbeta, jnp.zeros_like(edz), jnp.zeros_like(edz)


_fused_abn_train.defvjp(_fused_abn_train_fwd, _fused_abn_train_bwd)


def fused_abn(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    *,
    mean: Optional[jnp.ndarray] = None,
    var: Optional[jnp.ndarray] = None,
    training: bool = True,
    eps: float = 1e-5,
    activation: str = ACT_LEAKY_RELU,
    slope: float = 0.01,
    axis_name: Optional[str] = None,
    parts: Optional[tuple] = None,
):
    """Fused BN + activation.

    Training mode computes batch statistics (synchronized over ``axis_name``
    if given) and returns ``(z, mean, var)`` so the caller can update running
    stats with the unbiased correction (reference functions.py:85-88).
    Inference mode takes running ``mean``/``var`` and returns ``z`` only.

    ``parts`` (s2d grouped statistics, cf. ``bn_train``): x is an s2d tensor
    whose channels carry 4 sub-positions per true channel (sub-position-
    major, part p spanning ``4 * parts[p]`` channels); gamma/beta/running
    stats keep their dense ``[sum(parts)]`` shapes (checkpoint compatible),
    statistics combine across the sub-positions, and the memory-saving
    from-output backward applies group-combined edz/eydz means — values AND
    gradients equal the normal-space ABN exactly. The dense->s2d expansion
    of gamma/beta happens outside the custom VJP (``_expand_parts`` — the
    tile's autodiff backward group-sums dgamma/dbeta to dense)."""
    if parts is not None:
        gamma_e = _expand_parts(gamma, parts)
        beta_e = _expand_parts(beta, parts)
    else:
        gamma_e, beta_e = gamma, beta
    if training:
        sub_mean, sub_var = batch_mean_var(x, axis_name)
        if parts is not None:
            bmean, bvar = _combine_parts(
                sub_mean, sub_var + jnp.square(sub_mean), parts)
            bmean_e = _expand_parts(bmean, parts)
            bvar_e = _expand_parts(bvar, parts)
        else:
            bmean = bmean_e = sub_mean
            bvar = bvar_e = sub_var
        bmean_e = lax.stop_gradient(bmean_e)
        bvar_e = lax.stop_gradient(bvar_e)
        z = _fused_abn_train(x, gamma_e, beta_e, bmean_e, bvar_e, eps,
                             activation, slope, axis_name, parts)
        return z, lax.stop_gradient(bmean), lax.stop_gradient(bvar)
    assert mean is not None and var is not None
    if parts is not None:
        mean = _expand_parts(mean, parts)
        var = _expand_parts(var, parts)
    z = _abn_apply(x, gamma_e, beta_e, mean, var, eps, activation, slope)
    return z
