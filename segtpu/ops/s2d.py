"""Space-to-depth (s2d) execution of low-channel conv blocks.

TPU arrays are tiled (8 sublanes x 128 lanes) with the minor (channel) dim
padded to 128 lanes. The 512-resolution blocks of the U-Net family run at
C=32, so every feature map physically occupies 4x its logical bytes in HBM
— and these blocks are bandwidth-bound. Executing the SAME math on the
space-to-depth representation ([N, H/2, W/2, 4C], dense 128-lane channels)
removes the padding: measured 2.23x faster for the zf_unet level-0 double
conv fwd+bwd at [16,512,512,*] (see BASELINE.md).

Exact equivalence: s2d is a pixel permutation, and a stride-1 odd-k conv in
normal space equals a conv in s2d space with a structurally-expanded kernel
(`s2d_kernel`, verified bit-level against `lax.conv` in tests). BN stats,
losses and metrics are permutation-invariant reductions, so training math
is unchanged up to float reassociation.

The reference has no analogue (single-GPU torch, NCHW); this is TPU-native
design, not a port (SURVEY.md §7 "hard parts": input pipeline / layout).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def s2d(x):
    """[N,H,W,C] -> [N,H/2,W/2,4C]; channel order (dy, dx, c) flattened."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def d2s(x):
    """Inverse of :func:`s2d`: [N,H,W,4C] -> [N,2H,2W,C]."""
    n, h, w, cc = x.shape
    c = cc // 4
    x = x.reshape(n, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * 2, w * 2, c)


def _axis_tables(k: int):
    """Static (block-tap index, validity) tables for one spatial axis.

    For output sub-position d_out and kernel tap a (SAME padding p=k//2),
    the input row is r = 2*B + d_out + a - p for output block B; r falls in
    block B + u at sub-position d_in with a = 2*u + d_in - d_out + p.
    Returns A[u, d_in, d_out] (clipped tap) and V (validity mask) over the
    minimal block-tap window."""
    p = k // 2
    lo = -((p + 1) // 2)          # a=0, d_in=0, d_out=1 -> u = (0 -1 -p)/2
    hi = (k - 1 + 1 - p) // 2     # a=k-1, d_in=1, d_out=0
    us = list(range(lo, hi + 1))
    A = np.zeros((len(us), 2, 2), np.int32)
    V = np.zeros((len(us), 2, 2), bool)
    for i, u in enumerate(us):
        for d_in in range(2):
            for d_out in range(2):
                a = 2 * u + d_in - d_out + p
                V[i, d_in, d_out] = 0 <= a < k
                A[i, d_in, d_out] = np.clip(a, 0, k - 1)
    return A, V


def s2d_kernel(k):
    """Expand a dense HWIO kernel [k,k,C,O] (stride 1, SAME) to the s2d-space
    kernel [K,K,4C,4O] with conv(s2d(x), k') == s2d(conv(x, k)).

    Pure gathers over static index tables — differentiable, so the dense
    kernel stays the trained parameter (checkpoint/transplant compatible)."""
    kh = k.shape[0]
    A, V = _axis_tables(kh)
    U = A.shape[0]
    # [U, 2(d_in), 2(d_out), V(v), 2(dx_in), 2(dx_out), C, O]
    kp = k[A[:, :, :, None, None, None], A[None, None, None, :, :, :]]
    mask = (V[:, :, :, None, None, None] & V[None, None, None, :, :, :])
    kp = kp * jnp.asarray(mask, k.dtype)[..., None, None]
    # -> [U, V, (dy_in, dx_in, C), (dy_out, dx_out, O)]
    kp = kp.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    c, o = k.shape[2], k.shape[3]
    return kp.reshape(U, U, 4 * c, 4 * o)


def s2d_tile_channels(x, reps: int = 4):
    """Broadcast per-true-channel data to all 4 sub-positions: the s2d form
    of 2x nearest upsampling is exactly this tile ([..,C] -> [..,4C])."""
    return jnp.tile(x, (1,) * (x.ndim - 1) + (reps,))


def s2d_concat(a, b):
    """Channel-concat in s2d space: interleave so the result equals
    s2d(concat(A, B)) — each (dy,dx) group holds [a_c, b_c].

    NOTE: the interleave lowers to unaligned strided copies (~5 ms/step on
    zf_unet-512). The fast path is a PLAIN ``jnp.concatenate`` (lane-aligned)
    plus :func:`blocked_perm` applied to the consuming conv's expanded
    kernel — see ``S2DConv(in_perm=...)``. Kept for tests/fallback."""
    ca, cb = a.shape[-1] // 4, b.shape[-1] // 4
    av = a.reshape(a.shape[:-1] + (4, ca))
    bv = b.reshape(b.shape[:-1] + (4, cb))
    out = jnp.concatenate([av, bv], axis=-1)
    return out.reshape(a.shape[:-1] + (4 * (ca + cb),))


def expand_kernel_parts(kernel, parts):
    """Expand a dense HWIO kernel for an input that is a PLAIN lane concat of
    mixed-representation parts (in dense-channel order matching the kernel):

      ('s2d', c)  — an s2d tensor of c true channels (4c lanes, its own
                    sub-position-major layout), gathered via permutation;
      ('fold', c) — a NORMAL-space tensor at the s2d grid resolution whose
                    nearest-2x upsample feeds the conv: since all 4
                    sub-positions of an upsampled pixel share one value, the
                    4 expanded taps are PRE-SUMMED into one input channel.
                    This consumes the raw half-res tensor directly — no
                    materialized channel tile, and 4x fewer kernel MACs for
                    that part than normal-space upsample+conv.

    Returns the [K, K, sum(4c | c), 4*O] kernel for the blocked concat.
    Pure gathers/sums over the tiny expanded kernel — differentiable, so the
    dense kernel stays the trained parameter (checkpoints unaffected)."""
    kp = s2d_kernel(kernel)  # [U, U, 4*Cd, 4*O], d_in-major canonical order
    cd = kernel.shape[2]
    cols = []
    off = 0
    for kind, c in parts:
        idx = np.arange(c) + off
        if kind == "s2d":
            gather = (np.arange(4)[:, None] * cd + idx[None, :]).reshape(-1)
            cols.append(kp[:, :, gather, :])
        elif kind == "fold":
            folded = sum(kp[:, :, d * cd + idx, :] for d in range(4))
            cols.append(folded)
        else:
            raise ValueError(kind)
        off += c
    assert off == cd, (parts, cd)
    return jnp.concatenate(cols, axis=2)


def deconv_s2d_kernel(kernel):
    """Expand a stride-2 transposed-conv kernel (k=4, torch padding=1 — the
    TernausNet decoder deconv, reference unet11.py:23-48) into the stride-1
    SAME [3,3,I,4O] kernel that emits the S2D LAYOUT of the deconv output
    directly from the half-res input.

    Derivation: torch's out[2b+d] = sum_u x[b+u] * K[d+1-2u] with u in
    {-1,0,1} per axis, so each output sub-position d is a 2-tap window
    inside a common 3-tap block window — one stride-1 SAME conv at input
    resolution, no materialized full-res (4x lane-padded) tensor and no
    phase interleave (the interleave is what sank the normal-space
    polyphase path, layers._deconv_s2_polyphase).

    ``kernel`` layout is the flax transpose_kernel [4, 4, O, I]; output
    channel order is the s2d convention ((dy, dx, o) flattened). Pure
    gathers — differentiable, parameters unaffected. MAC padding: 9 taps
    with 4 valid per (dy,dx) = 2.25x the true deconv MACs, paid on the MXU
    where these bandwidth-bound decoder levels have headroom.
    """
    assert kernel.shape[0] == kernel.shape[1] == 4, kernel.shape
    A = np.zeros((3, 2), np.int32)
    V = np.zeros((3, 2), bool)
    for ui, u in enumerate((-1, 0, 1)):
        for d in range(2):
            a = d + 1 - 2 * u
            V[ui, d] = 0 <= a < 4
            A[ui, d] = np.clip(a, 0, 3)
    # [ty, tx, dy, dx, O, I]
    kp = kernel[A[:, None, :, None], A[None, :, None, :]]
    mask = V[:, None, :, None] & V[None, :, None, :]
    kp = kp * jnp.asarray(mask, kernel.dtype)[..., None, None]
    # -> [ty, tx, I, (dy, dx, O)]
    kp = kp.transpose(0, 1, 5, 2, 3, 4)
    o, i = kernel.shape[2], kernel.shape[3]
    return kp.reshape(3, 3, i, 4 * o)


def blocked_perm(sizes):
    """Static input-channel permutation mapping a BLOCK-wise concat of s2d
    tensors (each part keeps its own sub-position-major layout:
    ``[4*C_0 | 4*C_1 | ...]``) onto the canonical s2d channel order
    (sub-position-major over the dense concat ``sum(C_p)``).

    ``kp[:, :, blocked_perm(sizes), :]`` makes an expanded kernel consume
    the plain lane-aligned concat directly — no runtime interleave."""
    total = sum(sizes)
    perm = []
    for p, cp in enumerate(sizes):
        base = sum(sizes[:p])
        for d in range(4):
            perm.extend(d * total + base + c for c in range(cp))
    return tuple(perm)


def d2s_parts(x, parts):
    """d2s of a BLOCK-layout concat of s2d tensors (sizes ``parts``):
    converts each part independently and concatenates in dense order."""
    outs, off = [], 0
    for cp in parts:
        outs.append(d2s(x[..., off: off + 4 * cp]))
        off += 4 * cp
    return jnp.concatenate(outs, axis=-1)


def s2d_max_pool3_exit(x):
    """3x3 stride-2 pad-1 max pool (the ResNet/ResNeXt stem pool) expressed
    in s2d space: output row 2o+a-1 for tap a maps to sub-position d=(a+1)%2
    of block o-(a==0), so the 9 window taps are 9 aligned channel slices
    (3 of them block-shifted, -inf padded at the leading edge) — one fused
    elementwise max pass, and the output is already in NORMAL space at half
    resolution.

    Gradient routes to the FIRST maximal tap in torch's row-major window
    order via the same ge-cascade as :func:`s2d_max_pool_exit`."""
    n, hb, wb, cc = x.shape
    c = cc // 4
    v = x.reshape(n, hb, wb, 2, 2, c)
    neg = jnp.asarray(-jnp.inf, x.dtype)

    def shift_down_edge(t, axis):
        pad = jnp.full_like(jax.lax.slice_in_dim(t, 0, 1, axis=axis), neg)
        return jnp.concatenate(
            [pad, jax.lax.slice_in_dim(t, 0, t.shape[axis] - 1, axis=axis)],
            axis=axis)

    # tap a: (needs block shift, sub-position) — a=0 reads block o-1 at d=1
    sel = {0: (True, 1), 1: (False, 0), 2: (False, 1)}
    best = None
    for ar in range(3):
        shift_r, dy = sel[ar]
        for ac in range(3):
            shift_c, dx = sel[ac]
            t = v[..., dy, dx, :]
            if shift_r:
                t = shift_down_edge(t, 1)
            if shift_c:
                t = shift_down_edge(t, 2)
            best = t if best is None else jnp.where(best >= t, best, t)
    return best


def s2d_max_pool_exit(x):
    """2x2/2 max pool expressed in s2d space: the pool window IS the s2d
    block, so the result is a per-channel max over the 4 sub-positions —
    and the output is already in normal space at half resolution.

    Gradient routes to the FIRST maximal sub-position in row-major window
    order (torch MaxPool2d argmax semantics; ties at 0.0 after ReLU are
    common — ``jnp.maximum`` would SPLIT tied gradients instead). ``where``
    selects are linear in their branches, so the ge-cascade below routes the
    full cotangent to the first argmax, and the four operands are contiguous
    channel slices that fuse into one elementwise pass. (An equality-routed
    custom-VJP backward measured SLOWER — 94.2 -> 98.3 ms/step on
    zf_unet-512 s2d together with the max_pool variant; autodiff of the
    cascade wins because XLA packs the predicate masks densely.)"""
    c = x.shape[-1] // 4
    x00, x01, x10, x11 = (x[..., i * c:(i + 1) * c] for i in range(4))
    top = jnp.where(x00 >= x01, x00, x01)
    bot = jnp.where(x10 >= x11, x10, x11)
    return jnp.where(top >= bot, top, bot)
