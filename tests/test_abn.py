"""Tests for the fused ABN op: forward parity, from-output gradient
reconstruction, module semantics, and cross-device sync."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from segtpu.ops import abn as abn_ops
from segtpu.models.layers import ABN, InPlaceABN, BatchNormTorch


def naive_abn(x, gamma, beta, eps=1e-5, activation="leaky_relu", slope=0.01):
    """Straightforward BN+activation composition (saves x for autodiff)."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    var = jnp.mean(jnp.square(x), axis=axes) - mean**2
    y = (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    if activation == "leaky_relu":
        return jnp.where(y >= 0, y, y * slope)
    if activation == "elu":
        return jnp.where(y >= 0, y, jnp.expm1(y))
    return y


@pytest.fixture(scope="module")
def xgb():
    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(4, 8, 8, 16).astype(np.float32))
    gamma = jnp.array(rng.rand(16).astype(np.float32) + 0.5)
    beta = jnp.array(rng.randn(16).astype(np.float32) * 0.1)
    return x, gamma, beta


@pytest.mark.parametrize("activation", ["leaky_relu", "elu", "none"])
def test_fused_abn_forward_matches_naive(xgb, activation):
    x, gamma, beta = xgb
    z, mean, var = abn_ops.fused_abn(x, gamma, beta, activation=activation)
    expected = naive_abn(x, gamma, beta, activation=activation)
    np.testing.assert_allclose(np.asarray(z), np.asarray(expected), atol=1e-5)


@pytest.mark.parametrize("activation", ["leaky_relu", "elu", "none"])
def test_fused_abn_grads_match_naive(xgb, activation):
    """The memory-saving backward (reconstructed from the output) must equal
    the plain autodiff gradient of the BN+act composition."""
    x, gamma, beta = xgb

    def loss_fused(x, g, b):
        z, _, _ = abn_ops.fused_abn(x, g, b, activation=activation)
        return jnp.sum(jnp.sin(z) * z)

    def loss_naive(x, g, b):
        return jnp.sum(jnp.sin(naive_abn(x, g, b, activation=activation))
                       * naive_abn(x, g, b, activation=activation))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_ in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=2e-4)


def test_fused_abn_inference_mode(xgb):
    x, gamma, beta = xgb
    mean = jnp.full((16,), 0.3)
    var = jnp.full((16,), 2.0)
    z = abn_ops.fused_abn(x, gamma, beta, mean=mean, var=var, training=False)
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
    expected = jnp.where(y >= 0, y, y * 0.01)
    np.testing.assert_allclose(np.asarray(z), np.asarray(expected), atol=1e-5)


def test_inplace_abn_module_matches_plain_abn(xgb):
    x, _, _ = xgb
    m1 = InPlaceABN(16)
    m2 = ABN(16)
    v1 = m1.init(jax.random.PRNGKey(0), x, use_running_average=False)
    v2 = m2.init(jax.random.PRNGKey(0), x, use_running_average=False)
    z1, upd1 = m1.apply(v1, x, use_running_average=False, mutable=["batch_stats"])
    z2, upd2 = m2.apply(v2, x, use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)
    for k in ("mean", "var"):
        s1 = jax.tree_util.tree_leaves(upd1["batch_stats"])
        s2 = jax.tree_util.tree_leaves(upd2["batch_stats"])
        for a, b_ in zip(s1, s2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_running_stats_torch_semantics():
    """running = 0.9*running + 0.1*batch, with unbiased var correction."""
    rng = np.random.RandomState(1)
    x = jnp.array(rng.randn(2, 4, 4, 3).astype(np.float32))
    m = BatchNormTorch(3)
    v = m.init(jax.random.PRNGKey(0), x, use_running_average=False)
    _, upd = m.apply(v, x, use_running_average=False, mutable=["batch_stats"])
    count = 2 * 4 * 4
    bm = np.asarray(x).mean(axis=(0, 1, 2))
    bv = np.asarray(x).var(axis=(0, 1, 2))
    exp_mean = 0.1 * bm  # initial running mean is 0
    exp_var = 0.9 * 1.0 + 0.1 * bv * count / (count - 1)  # initial running var is 1
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["mean"]), exp_mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["var"]), exp_var, atol=1e-5)


def test_sync_abn_shard_map_matches_global():
    """fused_abn with axis_name under shard_map == fused_abn on the full batch
    (the InPlaceABNSync replacement, SURVEY.md §2.8)."""
    n_dev = jax.device_count()
    assert n_dev == 8
    rng = np.random.RandomState(2)
    x = jnp.array(rng.randn(16, 4, 4, 8).astype(np.float32))
    gamma = jnp.ones((8,))
    beta = jnp.zeros((8,))

    z_global, mean_g, var_g = abn_ops.fused_abn(x, gamma, beta)

    mesh = Mesh(np.array(jax.devices()), ("data",))

    @jax.jit
    def sharded(x, gamma, beta):
        def f(x, gamma, beta):
            z, m, v = abn_ops.fused_abn(x, gamma, beta, axis_name="data")
            return z, m, v
        return shard_map(
            f, mesh=mesh,
            in_specs=(P("data"), P(), P()),
            out_specs=(P("data"), P(), P()),
        )(x, gamma, beta)

    z_sh, mean_sh, var_sh = sharded(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(mean_g), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_sh), np.asarray(var_g), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_sh), np.asarray(z_global), atol=1e-5)


def test_sync_abn_gradients_match_global():
    n_dev = jax.device_count()
    rng = np.random.RandomState(3)
    x = jnp.array(rng.randn(16, 4, 4, 8).astype(np.float32))
    gamma = jnp.array(rng.rand(8).astype(np.float32) + 0.5)
    beta = jnp.zeros((8,))
    mesh = Mesh(np.array(jax.devices()), ("data",))

    def loss_global(x, g, b):
        z, _, _ = abn_ops.fused_abn(x, g, b)
        return jnp.sum(z * z)

    def loss_sharded(x, g, b):
        def f(x, g, b):
            z, _, _ = abn_ops.fused_abn(x, g, b, axis_name="data")
            # per-shard partial sums -> global loss
            return jax.lax.psum(jnp.sum(z * z), "data")
        return shard_map(
            f, mesh=mesh, in_specs=(P("data"), P(), P()), out_specs=P(),
        )(x, g, b)

    gx_g = jax.grad(loss_global)(x, gamma, beta)
    gx_s = jax.grad(loss_sharded)(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_g), atol=2e-4)


@pytest.mark.parametrize("activation", ["leaky_relu", "elu", "none"])
def test_pallas_kernels_match_xla_path(xgb, activation):
    """Force the Pallas kernels (interpret mode on CPU) and compare against
    the XLA composite path — forward and gradients."""
    x, gamma, beta = xgb

    def loss(x, g, b):
        z, _, _ = abn_ops.fused_abn(x, g, b, activation=activation)
        return jnp.sum(z * jnp.sin(z))

    try:
        abn_ops.BN_IMPL_OVERRIDE = "pallas"
        vp = loss(x, gamma, beta)
        gp = jax.grad(loss, argnums=(0, 1, 2))(x, gamma, beta)
    finally:
        abn_ops.BN_IMPL_OVERRIDE = None
    vx = loss(x, gamma, beta)
    gx = jax.grad(loss, argnums=(0, 1, 2))(x, gamma, beta)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-4)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# bn_train: custom-VJP BatchNorm with MXU-dot channel reductions
# ---------------------------------------------------------------------------

def _bn_autodiff_reference(x, scale, bias, eps, parts):
    """Plain autodiff-able BN (the pre-custom-VJP BatchNormTorch math)."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    msq = jnp.mean(jnp.square(xf), axis=axes)
    if parts is not None:
        mean, var = abn_ops._combine_parts(mean, msq, parts)
    else:
        var = msq - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    w = scale * rstd
    b = bias
    if parts is not None:
        mean = abn_ops._expand_parts(mean, parts)
        w = abn_ops._expand_parts(w, parts)
        b = abn_ops._expand_parts(b, parts)
    return (x - mean.astype(x.dtype)) * w.astype(x.dtype) + b.astype(x.dtype)


@pytest.mark.parametrize("parts", [None, (8,), (3, 5)])
def test_bn_train_matches_autodiff(parts):
    """Custom backward == autodiff through the stats (torch BN training
    semantics), including the s2d grouped/blocked statistics layouts."""
    rng = np.random.RandomState(0)
    feats = 8
    c = feats if parts is None else 4 * feats
    x = jnp.asarray(rng.randn(4, 6, 6, c).astype(np.float32))
    scale = jnp.asarray(rng.rand(feats).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(feats).astype(np.float32))
    g = jnp.asarray(rng.randn(4, 6, 6, c).astype(np.float32))

    y_new = abn_ops.bn_train(x, scale, bias, 1e-5, parts, None)
    y_ref = _bn_autodiff_reference(x, scale, bias, 1e-5, parts)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref), atol=1e-5)

    def loss_new(x, s, b):
        return jnp.sum(abn_ops.bn_train(x, s, b, 1e-5, parts, None) * g)

    def loss_ref(x, s, b):
        return jnp.sum(_bn_autodiff_reference(x, s, b, 1e-5, parts) * g)

    gn = jax.grad(loss_new, (0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, (0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gn, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["dot_stats", "pallas_stats", "staged_stats"])
def test_bn_train_alt_channel_sums_match_production(impl):
    """Every alternate channel-sum impl (SEGTPU_BN_IMPL selectable, bodies in
    segtpu.ops.bn_alt) equals the production XLA composite. Shape chosen so
    all impls' gates accept: M = 4*128*128 = 65536 (power of two)."""
    from segtpu.ops import bn_alt

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 128, 128, 8).astype(np.float32))
    scale = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(8).astype(np.float32))
    g = jnp.asarray(rng.randn(*x.shape).astype(np.float32))

    m = x.size // x.shape[-1]
    assert bn_alt.channel_sums(impl, x.reshape(m, x.shape[-1])) is not None

    def run():
        y = abn_ops.bn_train(x, scale, bias, 1e-5, None, None)
        grads = jax.grad(
            lambda *a: jnp.sum(abn_ops.bn_train(*a, 1e-5, None, None) * g),
            (0, 1, 2),
        )(x, scale, bias)
        return (y, *grads)

    ref = run()
    try:
        abn_ops.BN_IMPL_OVERRIDE = impl
        alt = run()
    finally:
        abn_ops.BN_IMPL_OVERRIDE = None
    for a, b_ in zip(ref, alt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=2e-3)


def test_bn_train_stats_running_values():
    """bn_train_stats returns the dense biased batch stats (for the torch
    running-average update) consistent with batch_mean_var."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 5, 5, 6).astype(np.float32))
    scale = jnp.ones((6,), jnp.float32)
    bias = jnp.zeros((6,), jnp.float32)
    y, mean, var = abn_ops.bn_train_stats(x, scale, bias, eps=1e-5)
    m_ref, v_ref = abn_ops.batch_mean_var(x)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(v_ref), atol=1e-6)


def test_bn_train_shard_map_matches_global():
    """bn_train with axis_name under shard_map == global bn_train (sync-BN
    semantics for the custom-VJP BatchNorm path), values and gradients."""
    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("data",))
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(8, 6, 6, 8).astype(np.float32))
    scale = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(8).astype(np.float32))
    g = jnp.asarray(rng.randn(*x.shape).astype(np.float32))

    def loss_global(x, s, b):
        return jnp.sum(abn_ops.bn_train(x, s, b, 1e-5, None, None) * g)

    def loss_sharded(x, s, b):
        def f(xs, ss, bs, gs):
            per = jnp.sum(abn_ops.bn_train(xs, ss, bs, 1e-5, None, "data") * gs)
            return jax.lax.psum(per, "data")
        per = shard_map(
            f, mesh=mesh,
            in_specs=(P("data"), P(), P(), P("data")), out_specs=P())
        return per(x, s, b, g)

    np.testing.assert_allclose(
        float(loss_sharded(x, scale, bias)), float(loss_global(x, scale, bias)),
        rtol=1e-5)
    g_g = jax.grad(loss_global, (0, 1, 2))(x, scale, bias)
    g_s = jax.grad(loss_sharded, (0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_g, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_fused_abn_parts_matches_normal_space():
    """fused_abn with s2d grouped statistics (``parts``) == the normal-space
    fused ABN: values, batch stats, dx, dgamma, dbeta (unet_abn+s2d — the
    composition of the from-output backward with grouped s2d stats)."""
    from segtpu.ops.s2d import d2s, s2d

    rng = np.random.RandomState(11)
    f = 5
    x = jnp.asarray(rng.randn(2, 8, 8, f).astype(np.float32))
    gamma = jnp.asarray(rng.rand(f).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(*x.shape).astype(np.float32))

    def loss_normal(x, gamma, beta):
        z, m, v = abn_ops.fused_abn(x, gamma, beta, training=True)
        return jnp.sum(z * w), (z, m, v)

    def loss_parts(x, gamma, beta):
        zs, m, v = abn_ops.fused_abn(s2d(x), gamma, beta, training=True,
                                     parts=(f,))
        z = d2s(zs)
        return jnp.sum(z * w), (z, m, v)

    (ln, (zn, mn, vn)) = loss_normal(x, gamma, beta)
    (lp, (zp, mp, vp)) = loss_parts(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zn), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mp), np.asarray(mn), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vn), atol=1e-5)
    np.testing.assert_allclose(float(lp), float(ln), rtol=1e-5)

    gn = jax.grad(lambda *a: loss_normal(*a)[0], (0, 1, 2))(x, gamma, beta)
    gp = jax.grad(lambda *a: loss_parts(*a)[0], (0, 1, 2))(x, gamma, beta)
    for a, b in zip(gn, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_fused_abn_parts_inference_matches_normal(xgb):
    """Eval mode with running stats: parts path == normal path."""
    from segtpu.ops.s2d import d2s, s2d

    x, gamma, beta = xgb
    f = x.shape[-1]
    rng = np.random.RandomState(3)
    mean = jnp.asarray(rng.randn(f).astype(np.float32) * 0.2)
    var = jnp.asarray(rng.rand(f).astype(np.float32) + 0.5)
    zn = abn_ops.fused_abn(x, gamma, beta, mean=mean, var=var,
                           training=False)
    zp = abn_ops.fused_abn(s2d(x), gamma, beta, mean=mean, var=var,
                           training=False, parts=(f,))
    np.testing.assert_allclose(np.asarray(d2s(zp)), np.asarray(zn),
                               atol=1e-6)
