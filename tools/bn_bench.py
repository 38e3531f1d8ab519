"""Microbenchmark: BN statistic reductions — XLA vs Pallas single-pass.

The zf_unet-512 trace attributes ~25 ms/step to BN-stat forward reductions
and BN backward (d_scale/d_bias-style) reductions running at ~125-170 GB/s
effective (BASELINE.md "Roofline analysis"). This tool measures, on the real
chip, the same reduction patterns as (a) the current XLA composite and
(b) a Pallas one-pass kernel, at the exact shapes zf_unet-512 runs.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# -- XLA composite (what BatchNormTorch does today) -------------------------

@jax.jit
def xla_stats(x):
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    return jnp.mean(xf, axis=axes), jnp.mean(jnp.square(xf), axis=axes)


@jax.jit
def xla_bwd_stats(g, x):
    gf = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    return jnp.sum(gf, axis=axes), jnp.sum(gf * xf, axis=axes)


# -- Pallas one-pass --------------------------------------------------------

def pallas_stats(x2d, tile_m=2048):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = x2d.shape
    grid = (pl.cdiv(m, tile_m),)

    def kernel(x_ref, s_ref, q_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        z = x_ref[:].astype(jnp.float32)
        acc_ref[0, :] += jnp.sum(z, axis=0)
        acc_ref[1, :] += jnp.sum(z * z, axis=0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            s_ref[:] = acc_ref[0:1, :]
            q_ref[:] = acc_ref[1:2, :]

    s, q = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
    )(x2d)
    return s.reshape(c), q.reshape(c)


def pallas_bwd_stats(g2d, x2d, tile_m=2048):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = x2d.shape
    grid = (pl.cdiv(m, tile_m),)

    def kernel(g_ref, x_ref, s_ref, q_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        gf = g_ref[:].astype(jnp.float32)
        xf = x_ref[:].astype(jnp.float32)
        acc_ref[0, :] += jnp.sum(gf, axis=0)
        acc_ref[1, :] += jnp.sum(gf * xf, axis=0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            s_ref[:] = acc_ref[0:1, :]
            q_ref[:] = acc_ref[1:2, :]

    s, q = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
    )(g2d, x2d)
    return s.reshape(c), q.reshape(c)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile-m", type=int, default=2048)
    args = ap.parse_args()

    shapes = [
        (16, 256, 256, 128),  # zf_unet-512 s2d level0 / level1-up
        (16, 256, 256, 64),   # level1
        (16, 128, 128, 128),  # level2
        (16, 64, 64, 256),    # level3
        (16, 32, 32, 512),    # level4
    ]
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].platform}, tile_m={args.tile_m}")
    for shp in shapes:
        x = jax.random.normal(key, shp, jnp.bfloat16)
        g = jax.random.normal(jax.random.PRNGKey(1), shp, jnp.bfloat16)
        m = int(np.prod(shp[:-1]))
        c = shp[-1]
        x2d = x.reshape(m, c)
        g2d = g.reshape(m, c)
        gbytes = x.size * 2 / 1e9

        t_xla = timeit(xla_stats, x)
        pstats = jax.jit(lambda v: pallas_stats(v, args.tile_m))
        t_pal = timeit(pstats, x2d)

        # correctness
        s_ref, q_ref = xla_stats(x)
        s_p, q_p = pstats(x2d)
        err = max(
            float(jnp.max(jnp.abs(s_p / m - s_ref))),
            float(jnp.max(jnp.abs(q_p / m - q_ref))),
        )

        t_xla_b = timeit(xla_bwd_stats, g, x)
        pbwd = jax.jit(lambda a, b: pallas_bwd_stats(a, b, args.tile_m))
        t_pal_b = timeit(pbwd, g2d, x2d)

        print(
            f"{str(shp):>22}  fwd-stats: xla {t_xla*1e3:6.3f} ms ({gbytes/t_xla:6.1f} GB/s)"
            f"  pallas {t_pal*1e3:6.3f} ms ({gbytes/t_pal:6.1f} GB/s)  err={err:.2e}   "
            f"bwd-stats: xla {t_xla_b*1e3:6.3f} ms ({2*gbytes/t_xla_b:6.1f} GB/s)"
            f"  pallas {t_pal_b*1e3:6.3f} ms ({2*gbytes/t_pal_b:6.1f} GB/s)"
        )


if __name__ == "__main__":
    main()
