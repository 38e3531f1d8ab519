"""Alternative BN formulations — measured-negative experiments, kept for A/B.

Every implementation here was benchmarked end-to-end on TPU v5e against the
production XLA composite in :mod:`segtpu.ops.abn` and LOST (numbers in
BASELINE.md, "Roofline analysis" / "BN-stat emitter" sections). They are kept
out of the production module so the hot path has exactly one code path, but
remain selectable through the single documented switch

    SEGTPU_BN_IMPL = xla | pallas | pallas_stats | dot_stats | staged_stats
                     | fwd_barrier | autodiff

(read per-trace by ``segtpu.ops.abn._bn_impl``; ``abn.BN_IMPL_OVERRIDE``
takes precedence for in-process tests). ``tools/bn_bench.py --train-ab``
re-runs each of them end-to-end and reproduces the recorded results.

Recorded measurements (zf_unet-512 b16 bf16 s2d step, TPU v5e, round 2):

  xla (production)  94.2 ms/step   — baseline
  dot_stats        159.5 ms/step   — MXU contractions for the channel sums:
                    dot operands must materialize, every BN input loses its
                    producer fusion, logical traffic 54.6 -> 90.9 GB/step.
  pallas_stats      slower in-step — the custom call forces a layout copy of
                    the operand before the kernel; the one-pass read never
                    pays for the relayout.
  staged_stats      no win         — XLA already schedules the reshaped
                    two-stage reduce the same way; extra reshapes cost copies.
  pallas (norm-act) 3.3 ms vs 1.7 ms on a 16x128x128x64 fwd+bwd microbench —
                    XLA's fused elementwise+reduce beats the two-pallas_call
                    pipeline (kernel boundary = an extra HBM round trip).
  fwd_barrier       100.8 ms/step  — splitting the conv+stats kOutput fusion
                    materializes the conv output; the extra write costs more
                    than the throttled fused emitter.
  autodiff          (layers.py)    — plain autodiff BN backward re-derives
                    d_scale/d_bias as separate column reduces; the custom VJP
                    in abn.bn_train shares one fused pass.

The reference's native surface this replaces: inplace_abn CUDA ops
(reference lib/modules/abn/functions.py:81-122).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from segtpu.ops.abn import ACT_ELU, ACT_LEAKY_RELU, _pallas_interpret

# ---------------------------------------------------------------------------
# Channel-sum alternates: (sum(a), sum(a*b)) over rows of [M, C]
# ---------------------------------------------------------------------------


def channel_sums(impl: str, a2d, b2d=None):
    """Dispatch for abn._bn_channel_sums when SEGTPU_BN_IMPL selects an
    alternate. Returns None when the impl's shape gate rejects the operand
    (caller falls back to the production composite)."""
    m, c = a2d.shape
    if impl == "dot_stats":
        if not (m >= 4096 and c <= 512):
            return None
        s = _col_sum_dot(a2d)
        q = _col_dot_diag(a2d, a2d if b2d is None else b2d)
        return s, q
    if impl == "pallas_stats":
        if not (m >= 65536 and c <= 1024):
            return None
        return _pallas_channel_sums(a2d, b2d)
    if impl == "staged_stats":
        if not (m >= 65536 and (m & (m - 1)) == 0):
            return None
        return _staged_col_sums(a2d, b2d)
    return None


# MXU contractions: sum(x) = ones[1,M] @ x; sum(a*b) = diag(a^T @ b). The
# optimization_barrier hides the ones vector from the algebraic simplifier so
# the dot is not rewritten back into the slow column reduce.

def _ones_row(m: int, dtype) -> jnp.ndarray:
    return lax.optimization_barrier(jnp.ones((1, m), dtype))


def _col_sum_dot(a2d: jnp.ndarray) -> jnp.ndarray:
    m = a2d.shape[0]
    s = lax.dot_general(
        _ones_row(m, a2d.dtype), a2d,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return s.reshape(a2d.shape[1])


def _col_dot_diag(a2d: jnp.ndarray, b2d: jnp.ndarray) -> jnp.ndarray:
    g = lax.dot_general(
        a2d, b2d, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return jnp.diagonal(g)


def _pallas_channel_sums(a2d, b2d=None, tile_m: int = 2048):
    """One-pass Pallas kernel: reads the operand(s) once, accumulates both
    fp32 channel sums in VMEM scratch across a sequential row-tile grid."""
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
        # (groups, 8, C) view — full-rate vector adds that preserve the
        # (8, C) register tile; the cross-sublane fold happens ONCE at the
        # end instead of once per block.
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


def _staged_col_sums(a2d, b2d=None, keep_rows: int = 1024):
    """Reduce over the GROUPS axis of a (groups, keep_rows, C) view first —
    the [keep_rows, C] accumulator tile makes the inner loop full-width
    vector adds over contiguous memory — then fold the small remainder."""
    m, c = a2d.shape
    af = a2d.astype(jnp.float32)
    bf = af if b2d is None else b2d.astype(jnp.float32)
    a3 = af.reshape(-1, keep_rows, c)
    q3 = (af * bf).reshape(-1, keep_rows, c)
    s1 = jnp.sum(a3, axis=0)
    q1 = jnp.sum(q3, axis=0)
    return jnp.sum(s1, axis=0), jnp.sum(q1, axis=0)


# ---------------------------------------------------------------------------
# Pallas fused normalize+affine+activation (impl = "pallas")
# ---------------------------------------------------------------------------


def abn_norm_act_pallas(x2d, scale, shift, activation: str, slope: float):
    """(M, C) -> (M, C): (x * scale + shift) then activation, one VMEM pass.

    scale = gamma * rsqrt(var+eps); shift = beta - mean*scale (precomputed,
    so the kernel is a single FMA + select per element)."""
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


def abn_bwd_pallas(z2d, g2d, gamma, beta, activation: str, slope: float):
    """Fused backward pass 1: per-channel edz / eydz reductions from output.

    One read of (z, g): undo activation on the gradient, recover x_hat from
    the output, and accumulate both channel sums in VMEM scratch across the
    (sequential) grid. Equivalent of ``backend.edz_eydz``
    (reference lib/modules/abn/functions.py:112)."""
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
