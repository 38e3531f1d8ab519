"""Fast 2x2/2 max pooling with a torch-exact backward.

XLA differentiates ``reduce_window_max`` into a ``select-and-scatter`` op,
which is one of the slowest TPU primitives in the zf_unet-512 profile
(~3.7 ms/step on the level-0 feature map alone). This module replaces it
with a custom VJP that is pure elementwise work over a [N, H/2, 2, W/2, 2, C]
view, which XLA fuses into one bandwidth-bound pass:

  forward:  y = max over the 4 window positions (strided slices, no gather)
  backward: route dy to the FIRST maximal position in row-major window
            order — exactly torch's MaxPool2d argmax tie-breaking
            (ties at 0.0 after ReLU are common, so first-match routing,
            not equality-split, is required for train-step parity with the
            reference; see tests/test_reference_parity.py).

Only the (window=2, stride=2, VALID) shape every zoo model uses is handled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_view(x):
    """[N,H,W,C] -> the 4 window positions, each [N,H/2,W/2,C]."""
    n, h, w, c = x.shape
    v = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return v[:, :, 0, :, 0, :], v[:, :, 0, :, 1, :], v[:, :, 1, :, 0, :], v[:, :, 1, :, 1, :]


@jax.custom_vjp
def max_pool_2x2(x):
    x00, x01, x10, x11 = _window_view(x)
    return jnp.maximum(jnp.maximum(x00, x01), jnp.maximum(x10, x11))


def _fwd(x):
    y = max_pool_2x2(x)
    return y, (x, y)


def _bwd(res, dy):
    x, y = res
    x00, x01, x10, x11 = _window_view(x)
    # first maximal position in row-major window order gets the gradient
    m00 = x00 == y
    m01 = (x01 == y) & ~m00
    m10 = (x10 == y) & ~(m00 | m01)
    m11 = ~(m00 | m01 | m10)
    zeros = jnp.zeros_like(dy)
    pick = lambda m: jnp.where(m, dy, zeros)
    g = jnp.stack(
        [jnp.stack([pick(m00), pick(m01)], axis=3),
         jnp.stack([pick(m10), pick(m11)], axis=3)],
        axis=2,
    )  # [N, H/2, 2, W/2, 2, C]
    n, hh, _, ww, _, c = g.shape
    return (g.reshape(n, hh * 2, ww * 2, c),)


max_pool_2x2.defvjp(_fwd, _bwd)
