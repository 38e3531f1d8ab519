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
    (reference functions.py:104-122) as XLA/Pallas ops.
  * Cross-device sync (the reference's InPlaceABNSync queue+comm machinery,
    functions.py:125-238) is replaced entirely by mesh semantics: under
    ``jit`` over a sharded batch the channel reductions are *global* arrays,
    so XLA inserts the ICI collectives automatically. An explicit
    ``axis_name`` is supported for ``shard_map``/``pmap`` contexts where
    reductions are per-shard (``lax.pmean`` — SURVEY.md §2.8).
  * A Pallas TPU kernel fuses normalize+affine+activation in one VMEM pass
    (opt in with ``segtpu.ops.abn.USE_PALLAS = True``); the default is the
    XLA composite, which measured faster — see the USE_PALLAS note below.

Layout: NHWC (channel-last), reductions over (N, H, W).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

ACT_LEAKY_RELU = "leaky_relu"
ACT_ELU = "elu"
ACT_NONE = "none"

# Measured on TPU v5e (16x128x128x64 fwd+bwd): the XLA composite runs 1.7ms
# vs 3.3ms for the two-pallas_call pipeline — XLA already fuses the
# elementwise+reduction pattern optimally and the extra kernel boundaries
# cost a full HBM round trip. The Pallas kernels stay available for study /
# future fusion work; default OFF. (The inplace-abn memory saving comes from
# the custom VJP below and applies on both paths.)
USE_PALLAS: Optional[bool] = None  # None = off; True forces the Pallas path


def _pallas_enabled() -> bool:
    if USE_PALLAS is not None:
        return USE_PALLAS
    return False


def _pallas_interpret() -> bool:
    """Interpret mode lets the kernels run (and be tested) on CPU."""
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
# Channel reductions as MXU contractions
# ---------------------------------------------------------------------------
#
# BN's per-channel sums reduce over every non-minor axis (N, H, W with C in
# the 128-lane minor dim) — a "column reduction" that XLA's TPU reduce
# emitter runs at ~125-170 GB/s effective (trace-measured, BASELINE.md
# "Roofline analysis"). The same sums expressed as contractions stream the
# operand through the MXU at HBM speed:
#
#   sum(x)    = ones[1,M] @ x[M,C]
#   sum(x*x)  = diag(x^T @ x)        (no materialized x*x; the C x C Gram
#                                     costs M*C^2 MACs — trivial next to the
#                                     conv FLOPs at the C<=512 levels where
#                                     column reductions hurt)
#   sum(g*x)  = diag(g^T @ x)        (BN backward: d_scale / d_bias sums)
#
# ``optimization_barrier`` hides the ones vector from the algebraic
# simplifier so the dot is not rewritten back into the slow reduce.
#
# MEASURED (zf_unet-512 s2d, v5e): the dot formulation LOSES end-to-end —
# 159.5 ms/step vs 107.5 baseline. Dot operands must materialize, so every
# BN input loses its producer fusion and logical traffic grows 54.6 -> 90.9
# GB/step. Default OFF; kept for study. The shipped fast path is the Pallas
# one-pass stats kernel below (USE_PALLAS_STATS).

USE_DOT_STATS: Optional[bool] = None  # None/False = off; True forces dots


def _dot_stats_enabled(m: int, c: int) -> bool:
    if USE_DOT_STATS is None:
        return False
    return USE_DOT_STATS and m >= 4096 and c <= 512


def _ones_row(m: int, dtype) -> jnp.ndarray:
    return lax.optimization_barrier(jnp.ones((1, m), dtype))


def _col_sum_dot(a2d: jnp.ndarray) -> jnp.ndarray:
    """sum over axis 0 of [M, C] via MXU, fp32 accumulation -> [C] f32."""
    m = a2d.shape[0]
    s = lax.dot_general(
        _ones_row(m, a2d.dtype), a2d,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return s.reshape(a2d.shape[1])


def _col_dot_diag(a2d: jnp.ndarray, b2d: jnp.ndarray) -> jnp.ndarray:
    """sum(a * b) over axis 0 via diag of the [C, C] Gram -> [C] f32."""
    g = lax.dot_general(
        a2d, b2d, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return jnp.diagonal(g)


# ---------------------------------------------------------------------------
# Batch statistics
# ---------------------------------------------------------------------------

def batch_mean_var(x: jnp.ndarray, axis_name: Optional[str] = None):
    """Per-channel biased mean/var over all non-channel axes (NHWC).

    Equivalent of ``backend.mean_var`` (reference functions.py:81). With
    ``axis_name`` the moments are synchronized across that mapped axis — the
    replacement for InPlaceABNSync's gather/broadcast queues.
    """
    c = x.shape[-1]
    m = x.size // c
    if _pallas_stats_enabled(m, c) or _dot_stats_enabled(m, c):
        s, q = _bn_channel_sums(x.reshape(m, c))
        mean, mean_sq = s / m, q / m
    else:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        mean_sq = jnp.mean(jnp.square(x), axis=axes)
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
        mean_sq = lax.pmean(mean_sq, axis_name)
    var = mean_sq - jnp.square(mean)
    return mean, var


# ---------------------------------------------------------------------------
# Full training-mode BatchNorm with MXU-dot reductions (fwd AND bwd)
# ---------------------------------------------------------------------------
#
# Used by ``segtpu.models.layers.BatchNormTorch``. The autodiff backward of a
# plain normalize expression re-derives d_scale/d_bias as XLA column reduces
# (the slow emitter); this custom VJP computes every channel reduction as an
# MXU contraction instead. Supports the s2d grouped/blocked statistics
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


# Pallas one-pass channel sums: reads the operand(s) once, accumulates both
# fp32 channel sums in VMEM scratch across a sequential row-tile grid.
# XLA's convert+reduce "column reduction" fusions measured ~110-150 GB/s
# in-step (trace: convert_reduce_fusion 21 ms/step on zf_unet-512 s2d).

USE_PALLAS_STATS: Optional[bool] = None  # None = auto (TPU only); False off


def _pallas_stats_enabled(m: int, c: int) -> bool:
    import os
    env = os.environ.get("SEGTPU_PALLAS_STATS")
    flag = USE_PALLAS_STATS if env is None else env == "1"
    if flag is None:
        flag = False  # default off: measured slower in-step than the XLA
        # composite on zf_unet-512 s2d (layout copy before the custom call);
        # enable with SEGTPU_PALLAS_STATS=1 / USE_PALLAS_STATS=True to study.
    if not flag:
        return False
    return m >= 65536 and c <= 1024


def _pallas_channel_sums(a2d, b2d=None, tile_m: int = 2048):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = a2d.shape
    grid = (pl.cdiv(m, tile_m),)
    pair = b2d is not None
    masked = (m % tile_m) != 0

    def kernel(*refs):
        if pair:
            a_ref, b_ref, s_ref, q_ref, acc_ref = refs
        else:
            a_ref, s_ref, q_ref, acc_ref = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a = a_ref[:].astype(jnp.float32)
        b = b_ref[:].astype(jnp.float32) if pair else a
        if masked:
            rows = jax.lax.broadcasted_iota(jnp.int32, (tile_m, c), 0)
            valid = (i * tile_m + rows) < m
            a = jnp.where(valid, a, 0.0)
            b = jnp.where(valid, b, 0.0) if pair else a
        # Sublane-friendly accumulation: sum over the MAJOR axis of the
        # (groups, 8, C) view — pure full-rate vector adds that preserve the
        # (8, C) register tile. The cross-sublane fold happens ONCE at the
        # end instead of once per block (a per-block latency-bound tree).
        av = a.reshape(-1, 8, c)
        bv = b.reshape(-1, 8, c) if pair else av
        acc_ref[0:8, :] += jnp.sum(av, axis=0)
        acc_ref[8:16, :] += jnp.sum(av * bv, axis=0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            s_ref[:] = jnp.sum(acc_ref[0:8, :], axis=0, keepdims=True)
            q_ref[:] = jnp.sum(acc_ref[8:16, :], axis=0, keepdims=True)

    row_spec = pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [row_spec, row_spec] if pair else [row_spec]
    args = (a2d, b2d) if pair else (a2d,)
    s, q = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((16, c), jnp.float32)],
        interpret=_pallas_interpret(),
    )(*args)
    return s.reshape(c), q.reshape(c)


# Staged reduction: fold the row dim in halves with full-rate elementwise
# adds (log2 steps) until small, then one final reduce. XLA's one-shot
# column-reduce emitter measured ~90-150 GB/s on these shapes; elementwise
# adds stream at HBM speed. Enable with SEGTPU_STAGED_STATS=1 /
# USE_STAGED_STATS=True for A/B.

USE_STAGED_STATS: Optional[bool] = None


def _staged_stats_enabled(m: int) -> bool:
    import os
    env = os.environ.get("SEGTPU_STAGED_STATS")
    flag = USE_STAGED_STATS if env is None else env == "1"
    return bool(flag) and m >= 65536 and (m & (m - 1)) == 0


def _staged_col_sums(a2d, b2d=None, keep_rows: int = 1024):
    """Reduce over the GROUPS axis of a (groups, keep_rows, C) view first —
    the [keep_rows, C] accumulator tile makes the inner loop pure
    full-width vector adds over contiguous memory — then fold the small
    remainder."""
    m, c = a2d.shape
    af = a2d.astype(jnp.float32)
    bf = af if b2d is None else b2d.astype(jnp.float32)
    a3 = af.reshape(-1, keep_rows, c)
    q3 = (af * bf).reshape(-1, keep_rows, c)
    s1 = jnp.sum(a3, axis=0)
    q1 = jnp.sum(q3, axis=0)
    return jnp.sum(s1, axis=0), jnp.sum(q1, axis=0)


def _bn_channel_sums(a2d, b2d=None):
    """(sum(a), sum(a*b)) over rows — b None means b = a (sum, sumsq)."""
    m, c = a2d.shape
    if _pallas_stats_enabled(m, c):
        s, q = _pallas_channel_sums(a2d, b2d)
    elif _staged_stats_enabled(m):
        s, q = _staged_col_sums(a2d, b2d)
    elif _dot_stats_enabled(m, c):
        s = _col_sum_dot(a2d)
        q = _col_dot_diag(a2d, a2d if b2d is None else b2d)
    else:
        acc_t = jnp.promote_types(a2d.dtype, jnp.float32)
        af = a2d.astype(acc_t)
        bf = af if b2d is None else b2d.astype(acc_t)
        s = jnp.sum(af, axis=0)
        q = jnp.sum(af * bf, axis=0)
    return s, q


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


# Forward-side barrier experiment: XLA fuses the producing CONV with the
# stats epilogue (kOutput fusion rooted at conv_general_dilated, trace
# ~2.9 ms each) — the combined emitter throttles both. A barrier splits
# them into a fast conv and a pure convert+reduce.

USE_BN_FWD_BARRIER: Optional[bool] = None


def _bn_fwd_barrier_enabled() -> bool:
    import os
    env = os.environ.get("SEGTPU_BN_FWD_BARRIER")
    if env is not None:
        return env == "1"
    return bool(USE_BN_FWD_BARRIER)


def bn_train_stats(x, scale, bias, *, eps=1e-5, parts=None, axis_name=None):
    """Differentiable training BN + the dense (mean, var) for running stats.

    The stats are recomputed outside the custom-VJP op from the same sums —
    XLA CSEs the duplicate dots, so there is no extra pass; keeping them
    outside the VJP means their (unused) cotangents never exist."""
    if _bn_fwd_barrier_enabled():
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
# Pallas fused normalize+affine+activation kernel (forward hot path)
# ---------------------------------------------------------------------------

def _abn_norm_act_pallas(x2d, scale, shift, activation: str, slope: float):
    """(M, C) -> (M, C): (x * scale + shift) then activation, one VMEM pass.

    scale = gamma * rsqrt(var+eps); shift = beta - mean*scale (precomputed,
    so the kernel is a single FMA + select per element).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = x2d.shape
    tile_m = min(1024, max(8, m))
    grid = (pl.cdiv(m, tile_m),)

    def kernel(x_ref, scale_ref, shift_ref, o_ref):
        y = x_ref[:] * scale_ref[:] + shift_ref[:]
        if activation == ACT_LEAKY_RELU:
            y = jnp.where(y >= 0, y, y * slope)
        elif activation == ACT_ELU:
            # expm1 is not lowered by Mosaic; exp-1 is fine at these magnitudes
            y = jnp.where(y >= 0, y, jnp.exp(jnp.minimum(y, 0.0)) - 1.0)
        o_ref[:] = y

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x2d.dtype),
        interpret=_pallas_interpret(),
    )(x2d, scale.reshape(1, c), shift.reshape(1, c))


def _abn_bwd_pallas(z2d, g2d, gamma, beta, activation: str, slope: float):
    """Fused backward pass 1: per-channel edz / eydz reductions from output.

    One read of (z, g): undo activation on the gradient, recover x_hat from
    the output, and accumulate both channel sums in VMEM scratch across the
    (sequential) grid. Equivalent of ``backend.edz_eydz``
    (reference functions.py:112).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = z2d.shape
    tile_m = min(1024, max(8, m))
    grid = (pl.cdiv(m, tile_m),)
    inv_gamma = (1.0 / gamma).reshape(1, c)
    beta_r = beta.reshape(1, c)

    def kernel(z_ref, g_ref, invg_ref, beta_ref, edz_ref, eydz_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # Mask rows past m in the (possibly padded) last tile so the
        # reductions only see real data.
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_m, c), 0)
        valid = (i * tile_m + row_ids) < m
        z = jnp.where(valid, z_ref[:], 0.0)
        g = jnp.where(valid, g_ref[:], 0.0)
        if activation == ACT_LEAKY_RELU:
            dy = jnp.where(z >= 0, g, g * slope)
            y = jnp.where(z >= 0, z, z / slope)
        elif activation == ACT_ELU:
            dy = jnp.where(z >= 0, g, g * (z + 1.0))
            y = jnp.where(z >= 0, z, jnp.log(jnp.maximum(1.0 + z, 1e-20)))
        else:
            dy = g
            y = z
        xhat = (y - beta_ref[:]) * invg_ref[:]
        acc_ref[0, :] += jnp.sum(dy, axis=0)
        acc_ref[1, :] += jnp.sum(xhat * dy, axis=0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            edz_ref[:] = acc_ref[0:1, :]
            eydz_ref[:] = acc_ref[1:2, :]

    edz, eydz = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=_pallas_interpret(),
    )(z2d, g2d, inv_gamma, beta_r)
    return edz.reshape(c), eydz.reshape(c)


# ---------------------------------------------------------------------------
# Core fused op with memory-saving custom VJP
# ---------------------------------------------------------------------------

@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def _fused_abn_train(x, gamma, beta, mean, var, eps, activation, slope, axis_name):
    """Normalize with given batch stats, affine, activate. Differentiable in
    (x, gamma, beta); stats are treated as *functions of x* in the VJP, i.e.
    full training-mode BN backward (matches inplace-abn)."""
    return _abn_apply(x, gamma, beta, mean, var, eps, activation, slope)


def _abn_apply(x, gamma, beta, mean, var, eps, activation, slope):
    rstd = lax.rsqrt(var + eps)
    scale = gamma * rstd
    shift = beta - mean * scale
    if _pallas_enabled() and x.ndim >= 2 and x.dtype == jnp.float32:
        shp = x.shape
        x2d = x.reshape(-1, shp[-1])
        out = _abn_norm_act_pallas(
            x2d, scale.astype(x.dtype), shift.astype(x.dtype), activation, slope
        )
        return out.reshape(shp)
    y = x * scale.astype(x.dtype) + shift.astype(x.dtype)
    return _act_forward(y, activation, slope)


def _fused_abn_train_fwd(x, gamma, beta, mean, var, eps, activation, slope, axis_name):
    z = _abn_apply(x, gamma, beta, mean, var, eps, activation, slope)
    # Memory-saving residuals: the input x is NOT saved.
    count = x.size // x.shape[-1]
    return z, (z, gamma, beta, var, count)


def _fused_abn_train_bwd(eps, activation, slope, axis_name, res, g):
    z, gamma, beta, var, count = res
    c = z.shape[-1]
    rstd = lax.rsqrt(var + eps)

    if _pallas_enabled() and z.ndim >= 2 and z.dtype == jnp.float32:
        z2d = z.reshape(-1, c)
        g2d = g.reshape(-1, c)
        edz, eydz = _abn_bwd_pallas(z2d, g2d, gamma, beta, activation, slope)
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
        edz_mean = lax.psum(edz, axis_name) / (count * n_dev)
        eydz_mean = lax.psum(eydz, axis_name) / (count * n_dev)
    else:
        edz_mean = edz / count
        eydz_mean = eydz / count

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
):
    """Fused BN + activation.

    Training mode computes batch statistics (synchronized over ``axis_name``
    if given) and returns ``(z, mean, var)`` so the caller can update running
    stats with the unbiased correction (reference functions.py:85-88).
    Inference mode takes running ``mean``/``var`` and returns ``z`` only.
    """
    if training:
        bmean, bvar = batch_mean_var(x, axis_name)
        bmean = lax.stop_gradient(bmean)
        bvar = lax.stop_gradient(bvar)
        z = _fused_abn_train(x, gamma, beta, bmean, bvar, eps, activation, slope, axis_name)
        return z, bmean, bvar
    assert mean is not None and var is not None
    z = _abn_apply(x, gamma, beta, mean, var, eps, activation, slope)
    return z
