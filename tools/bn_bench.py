"""BN implementation A/B bench — micro kernels AND end-to-end train steps.

Two modes:

``--micro`` (default): times the BN statistic reductions in isolation — the
XLA composite vs the Pallas one-pass kernel from :mod:`segtpu.ops.bn_alt` —
at the exact shapes zf_unet-512 runs. The zf_unet-512 trace attributes
~25 ms/step to these reductions at ~125-170 GB/s effective (BASELINE.md
"Roofline analysis").

``--train-ab``: runs the full jitted train step (fwd+bwd+update) under every
``SEGTPU_BN_IMPL`` value and prints a ms/step table — the reproduction
harness for the recorded negative results (see the bn_alt module docstring
for the round-2 numbers). Example:

    python tools/bn_bench.py --train-ab --model zf_unet --patch 512 --batch 16

Replaces the five ad-hoc toggles that used to live inline in segtpu/ops/abn.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

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


# -- micro: XLA composite (what BatchNormTorch does today) -------------------

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


def run_micro(args):
    from segtpu.ops.bn_alt import _pallas_channel_sums

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
        pstats = jax.jit(lambda v: _pallas_channel_sums(v, None, args.tile_m))
        t_pal = timeit(pstats, x2d)

        # correctness
        s_ref, q_ref = xla_stats(x)
        s_p, q_p = pstats(x2d)
        err = max(
            float(jnp.max(jnp.abs(s_p / m - s_ref))),
            float(jnp.max(jnp.abs(q_p / m - q_ref))),
        )

        t_xla_b = timeit(xla_bwd_stats, g, x)
        pbwd = jax.jit(lambda a, b: _pallas_channel_sums(a, b, args.tile_m))
        t_pal_b = timeit(pbwd, g2d, x2d)

        print(
            f"{str(shp):>22}  fwd-stats: xla {t_xla*1e3:6.3f} ms ({gbytes/t_xla:6.1f} GB/s)"
            f"  pallas {t_pal*1e3:6.3f} ms ({gbytes/t_pal:6.1f} GB/s)  err={err:.2e}   "
            f"bwd-stats: xla {t_xla_b*1e3:6.3f} ms ({2*gbytes/t_xla_b:6.1f} GB/s)"
            f"  pallas {t_pal_b*1e3:6.3f} ms ({2*gbytes/t_pal_b:6.1f} GB/s)"
        )


# -- end-to-end: full train step under each SEGTPU_BN_IMPL -------------------

def run_train_ab(args):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from roofline import build_step  # noqa: E402 (repo tool, not a package)

    from segtpu.ops import abn

    impls = args.impls.split(",") if args.impls else [
        "xla", "autodiff", "fwd_barrier", "dot_stats", "staged_stats",
        "pallas_stats", "pallas",
    ]
    print(f"model={args.model} patch={args.patch} batch={args.batch} "
          f"s2d={args.s2d} bf16={not args.fp32} "
          f"device={jax.devices()[0].platform}")
    rows = []
    for impl in impls:
        abn.BN_IMPL_OVERRIDE = impl
        try:
            step, state, batch_xy, _ = build_step(
                args.model, args.patch, args.batch, bf16=not args.fp32,
                s2d=args.s2d)
            rng = jax.random.PRNGKey(0)
            for _ in range(3):
                state, logs = step(state, batch_xy, 1e-3, rng)
            loss0 = float(jax.device_get(logs["loss"]))
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, logs = step(state, batch_xy, 1e-3, rng)
            float(jax.device_get(logs["loss"]))
            dt = (time.perf_counter() - t0) / args.steps
            rows.append((impl, dt * 1e3, args.batch / dt, loss0))
        except Exception as e:  # an impl failing to lower is a result too
            rows.append((impl, float("nan"), float("nan"), float("nan")))
            print(f"  {impl}: FAILED ({type(e).__name__}: {e})")
        finally:
            abn.BN_IMPL_OVERRIDE = None
    base = next((r for r in rows if r[0] == "xla"), rows[0])
    print(f"\n{'impl':>14} {'ms/step':>9} {'img/s':>8} {'vs xla':>8} {'loss@3':>9}")
    for impl, ms, ips, loss0 in rows:
        rel = ms / base[1] if base[1] == base[1] else float("nan")
        print(f"{impl:>14} {ms:9.2f} {ips:8.1f} {rel:7.2f}x {loss0:9.5f}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--micro", action="store_true", help="micro mode (default)")
    ap.add_argument("--train-ab", action="store_true",
                    help="end-to-end train-step matrix over SEGTPU_BN_IMPL")
    ap.add_argument("--tile-m", type=int, default=2048)
    ap.add_argument("--model", default="zf_unet")
    ap.add_argument("--patch", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--s2d", action="store_true", default=True)
    ap.add_argument("--no-s2d", dest="s2d", action="store_false")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--impls", default=None,
                    help="comma list; default = full matrix")
    args = ap.parse_args()
    if args.train_ab:
        run_train_ab(args)
    else:
        run_micro(args)


if __name__ == "__main__":
    main()
