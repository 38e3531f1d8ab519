"""Space-to-depth execution (segtpu.ops.s2d + S2D layers): exact-math tests.

The s2d path must be numerically equivalent (up to float reassociation) to
the normal-space path with the SAME parameters — it is a layout
optimization, not a model change.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from segtpu.ops.s2d import (
    d2s,
    s2d,
    s2d_concat,
    s2d_kernel,
    s2d_max_pool_exit,
    s2d_tile_channels,
)


def _conv(x, k, pad):
    return lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_roundtrip():
    x = np.random.RandomState(0).randn(2, 8, 6, 5).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(d2s(s2d(jnp.asarray(x)))), x)


@pytest.mark.parametrize("k,cin,cout", [(3, 3, 5), (3, 8, 8), (1, 6, 2), (5, 4, 3)])
def test_s2d_kernel_conv_equivalence(k, cin, cout):
    rng = np.random.RandomState(k * 100 + cin)
    x = jnp.asarray(rng.randn(2, 12, 16, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32))

    ref = _conv(x, w, k // 2)
    wp = s2d_kernel(w)
    got = d2s(_conv(s2d(x), wp, wp.shape[0] // 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_s2d_concat_and_tile_match_normal_space():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))  # low-res
    b = jnp.asarray(rng.randn(2, 16, 16, 5).astype(np.float32))

    from segtpu.models.layers import upsample_nearest
    ref = jnp.concatenate([upsample_nearest(a), b], -1)
    got = d2s(s2d_concat(s2d_tile_channels(a), s2d(b)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_blocked_perm_matches_interleaved_concat():
    """conv over a plain blocked concat with a permuted kernel equals conv
    over the canonical interleaved concat (what the dense model computes)."""
    from segtpu.ops.s2d import blocked_perm

    rng = np.random.RandomState(6)
    a = jnp.asarray(rng.randn(2, 8, 8, 12).astype(np.float32))   # s2d, C=3
    b = jnp.asarray(rng.randn(2, 8, 8, 20).astype(np.float32))   # s2d, C=5
    w = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32))    # dense C=3+5

    kp = s2d_kernel(w)
    ref = _conv(s2d_concat(a, b), kp, kp.shape[0] // 2)

    perm = blocked_perm((3, 5))
    kp_plain = kp[:, :, jnp.asarray(perm), :]
    got = _conv(jnp.concatenate([a, b], axis=-1), kp_plain, kp.shape[0] // 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_s2d_max_pool_exit_matches_torch_pool_with_ties():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    x[x < 0] = 0.0  # relu-like ties
    dy = rng.randn(2, 4, 4, 4).astype(np.float32)

    def pooled(xj):
        return jnp.sum(s2d_max_pool_exit(s2d(xj)) * jnp.asarray(dy))

    y = s2d_max_pool_exit(s2d(jnp.asarray(x)))
    g = jax.grad(pooled)(jnp.asarray(x))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
    yt = torch.nn.functional.max_pool2d(xt, 2)
    yt.backward(torch.from_numpy(dy).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(y), yt.detach().permute(0, 2, 3, 1).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g), xt.grad.permute(0, 2, 3, 1).numpy(), atol=1e-6)


class TestUNetS2D:
    """unet s2d=True == s2d=False with identical params (eval path)."""

    def test_param_tree_and_eval_equivalence(self):
        import dataclasses

        from segtpu.models import get_model

        base = get_model("unet")
        s2dm = dataclasses.replace(base, s2d=True)
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        vb = base.init(jax.random.PRNGKey(0), x, train=False)
        vs = s2dm.init(jax.random.PRNGKey(0), x, train=False)
        pb = jax.tree_util.tree_leaves_with_path(vb)
        ps = jax.tree_util.tree_leaves_with_path(vs)
        assert [p for p, _ in pb] == [p for p, _ in ps]

        yb = base.apply(vb, x, train=False)
        ys = s2dm.apply(vb, x, train=False)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yb), atol=2e-4)

class TestUNetABNS2D:
    """unet_abn s2d=True == s2d=False (grouped-stats fused ABN in s2d space;
    the guard that excluded the ABN variant from s2d is lifted — VERDICT r4
    item 2)."""

    def _models(self):
        import dataclasses

        from segtpu.models import get_model

        base = get_model("unet_abn")
        return base, dataclasses.replace(base, s2d=True)

    def test_param_tree_and_eval_equivalence(self):
        base, s2dm = self._models()
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        vb = base.init(jax.random.PRNGKey(0), x, train=False)
        vs = s2dm.init(jax.random.PRNGKey(0), x, train=False)
        pb = jax.tree_util.tree_leaves_with_path(vb)
        ps = jax.tree_util.tree_leaves_with_path(vs)
        assert [p for p, _ in pb] == [p for p, _ in ps]

        yb = base.apply(vb, x, train=False)
        ys = s2dm.apply(vb, x, train=False)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yb), atol=2e-4)

    def test_train_values_and_stats_equivalence(self):
        """Train-mode forward + updated running stats match between layouts
        (dropout keys differ per layout only in masks at the FINAL dropout —
        groups=4 draws the identical channel mask, see Dropout2d)."""
        base, s2dm = self._models()
        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        variables = base.init(jax.random.PRNGKey(0), x, train=False)
        yb, ub = base.apply(variables, x, train=True,
                            mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(1)})
        ys, us = s2dm.apply(variables, x, train=True,
                            mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(1)})
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yb), atol=3e-4)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ub),
            jax.tree_util.tree_leaves_with_path(us),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, err_msg=str(path))

    def test_abn_block_grad_equivalence(self):
        """DoubleConvABN s2d vs normal: loss and every param grad match at
        the block level (full-model fp32 grad comparison is unfalsifiable —
        see TestZFUnetS2D.test_block_grad_equivalence)."""
        from segtpu.models.layers import max_pool
        from segtpu.models.unet import DoubleConvABN

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
        w = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))

        nb = DoubleConvABN(8, s2d=False)
        sb = DoubleConvABN(8, s2d=True)
        variables = nb.init(jax.random.PRNGKey(0), x, train=False)

        def loss_n(params):
            out, _ = nb.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(max_pool(out) * w)

        def loss_s(params):
            out, _ = sb.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                s2d(x), train=True, mutable=["batch_stats"])
            return jnp.sum(s2d_max_pool_exit(out) * w)

        np.testing.assert_allclose(
            float(loss_n(variables["params"])),
            float(loss_s(variables["params"])), rtol=1e-5)
        gn = jax.grad(loss_n)(variables["params"])
        gs = jax.grad(loss_s)(variables["params"])
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gn),
            jax.tree_util.tree_leaves_with_path(gs),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, err_msg=str(path))


class TestTiramisuS2D:
    """FCDenseNet s2d=True == s2d=False (blocked dense-concat machinery:
    per-part BN stats + blocked_perm convs + d2s_parts skip)."""

    def _models(self):
        import dataclasses

        from segtpu.models.tiramisu import FCDenseNet

        base = FCDenseNet(down_blocks=(2, 2), up_blocks=(2, 2),
                          bottleneck_layers=2, growth_rate=8,
                          out_chans_first_conv=12, n_classes=1, remat=False)
        return base, dataclasses.replace(base, s2d=True)

    def test_param_tree_and_eval_equivalence(self):
        base, s2dm = self._models()
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
        vb = base.init(jax.random.PRNGKey(0), x, train=False)
        vs = s2dm.init(jax.random.PRNGKey(0), x, train=False)
        pb = jax.tree_util.tree_leaves_with_path(vb)
        ps = jax.tree_util.tree_leaves_with_path(vs)
        assert [p for p, _ in pb] == [p for p, _ in ps]

        yb = base.apply(vb, x, train=False)
        ys = s2dm.apply(vb, x, train=False)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yb), atol=2e-4)

    def test_train_stats_equivalence(self):
        base, s2dm = self._models()
        rng = np.random.RandomState(8)
        x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
        variables = base.init(jax.random.PRNGKey(0), x, train=False)
        # dropout off: stochastic masks differ between layouts
        import dataclasses  # rate is inside DenseLayer; run train with rng but
        # compare batch_stats only on the DOWN level-0 blocks that s2d touches
        _, ub = base.apply(variables, x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
        _, us = s2dm.apply(variables, x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
        # the FIRST dense layer's BN sees the un-dropped firstconv output in
        # both layouts -> its stats must match regardless of masks
        a = ub["batch_stats"]["denseDown0"]["layer0"]["norm"]
        b = us["batch_stats"]["denseDown0"]["layer0"]["norm"]
        np.testing.assert_allclose(np.asarray(a["mean"]), np.asarray(b["mean"]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(a["var"]), np.asarray(b["var"]),
                                   atol=1e-4)


class TestZFUnetS2D:
    """zf_unet s2d=True == s2d=False with identical params."""

    def _models(self):
        import dataclasses

        from segtpu.models import get_model

        base = get_model("zf_unet")
        return base, dataclasses.replace(base, s2d=True)

    def test_param_trees_identical(self):
        base, s2dm = self._models()
        x = jnp.zeros((1, 32, 32, 3))
        vb = base.init(jax.random.PRNGKey(0), x, train=False)
        vs = s2dm.init(jax.random.PRNGKey(0), x, train=False)
        pb = jax.tree_util.tree_leaves_with_path(vb)
        ps = jax.tree_util.tree_leaves_with_path(vs)
        assert [p for p, _ in pb] == [p for p, _ in ps]
        for (path, a), (_, b) in zip(pb, ps):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))

    def test_forward_equivalence_eval_and_train(self):
        import dataclasses

        base, s2dm = self._models()
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        variables = base.init(jax.random.PRNGKey(0), x, train=False)

        yb = base.apply(variables, x, train=False)
        ys = s2dm.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yb), atol=2e-4)

        # train mode: batch-stat updates must match. Dropout off (the mask
        # RNG streams legitimately differ between the layouts); tolerance
        # covers fp32 reassociation amplified through 12 stacked BNs.
        base0 = dataclasses.replace(base, dropout_val=0.0)
        s2d0 = dataclasses.replace(s2dm, dropout_val=0.0)
        _, ub = base0.apply(variables, x, train=True, mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(1)})
        _, us = s2d0.apply(variables, x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ub["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(us["batch_stats"]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3, err_msg=str(path))

    def test_block_grad_equivalence(self):
        """Gradients match at the block level, where fp32 reassociation is
        measurable (~1e-4). Full-model end-to-end gradient comparison is
        unfalsifiable at fp32: the control experiment (the NORMAL model vs
        itself with a permuted batch — identical math, different reduction
        order) shows a worst-case grad difference of ~0.11 through the
        12-deep BN stack at init, the same scale as any layout change."""
        from segtpu.models.layers import max_pool
        from segtpu.models.unet import _ZFDoubleConv

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
        w = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))

        nb = _ZFDoubleConv(8, 0.0, True, None, s2d=False)
        sb = _ZFDoubleConv(8, 0.0, True, None, s2d=True)
        variables = nb.init(jax.random.PRNGKey(0), x, train=False)

        def loss_n(params):
            out, _ = nb.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(max_pool(out) * w)

        def loss_s(params):
            out, _ = sb.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                s2d(x), train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(s2d_max_pool_exit(out) * w)

        np.testing.assert_allclose(
            float(loss_n(variables["params"])), float(loss_s(variables["params"])),
            rtol=1e-5)
        gn = jax.grad(loss_n)(variables["params"])
        gs = jax.grad(loss_s)(variables["params"])
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gn),
            jax.tree_util.tree_leaves_with_path(gs),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, err_msg=str(path))

    def test_s2d_trains_to_same_loss_trajectory(self):
        """Short SGD trajectory: s2d and normal stay within a loose band —
        the layouts are the same model, so losses must track each other."""
        from segtpu.ops import get_loss
        from segtpu.train.optim import get_optimizer
        from segtpu.train.state import create_train_state, make_train_step
        import dataclasses

        base, s2dm = self._models()
        base = dataclasses.replace(base, dropout_val=0.0)
        s2dm = dataclasses.replace(s2dm, dropout_val=0.0)
        from segtpu.data.shapes import ShapesDataset
        ds = ShapesDataset(8, 32, seed=0)
        xs, ys = zip(*[ds[i] for i in range(8)])
        batch = (jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys)))

        losses = {}
        for name, model in (("normal", base), ("s2d", s2dm)):
            state = create_train_state(model, get_optimizer("sgd", 0.05),
                                       (8, 32, 32, 3))
            step = make_train_step(get_loss("bce"), donate=False)
            traj = []
            for i in range(8):
                state, logs = step(state, batch, 0.05, jax.random.PRNGKey(0))
                traj.append(float(logs["loss"]))
            losses[name] = traj
        np.testing.assert_allclose(losses["s2d"], losses["normal"], rtol=0.05)
        assert losses["s2d"][-1] < losses["s2d"][0]


@pytest.mark.parametrize("order", ["fold_first", "s2d_first"])
def test_expand_kernel_parts_fold_matches_upsample_conv(order):
    """The folded-upsample expanded kernel consumes the raw half-res tensor
    directly: conv(concat-parts, expand_kernel_parts(K)) equals the
    normal-space conv over concat(upsample_nearest(u), b) — with 4x fewer
    MACs for the folded part and no materialized channel tile."""
    from segtpu.models.layers import upsample_nearest
    from segtpu.ops.s2d import expand_kernel_parts

    rng = np.random.RandomState(7)
    c1, c2, cout = 4, 3, 6
    u = jnp.asarray(rng.randn(2, 8, 8, c1).astype(np.float32))    # half-res
    b = jnp.asarray(rng.randn(2, 16, 16, c2).astype(np.float32))  # full-res
    w = jnp.asarray(rng.randn(3, 3, c1 + c2, cout).astype(np.float32))

    if order == "fold_first":
        ref_in = jnp.concatenate([upsample_nearest(u), b], -1)
        parts = (("fold", c1), ("s2d", c2))
        blocked = jnp.concatenate([u, s2d(b)], -1)
    else:
        w = jnp.asarray(rng.randn(3, 3, c2 + c1, cout).astype(np.float32))
        ref_in = jnp.concatenate([b, upsample_nearest(u)], -1)
        parts = (("s2d", c2), ("fold", c1))
        blocked = jnp.concatenate([s2d(b), u], -1)

    ref = _conv(ref_in, w, 1)
    kp = expand_kernel_parts(w, parts)
    got = d2s(_conv(blocked, kp, kp.shape[0] // 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("model_name", ["unet", "zf_unet"])
def test_deep_s2d_exact_in_float64(model_name):
    """s2d execution (levels 0 AND 1: folds, blocked stats, pool exits) is
    EXACTLY the normal-path math — bit-identical forward and ~1e-11 grads
    in float64, where BN-stat rounding cannot hide a wiring bug."""
    import dataclasses
    from segtpu.models import get_model

    with jax.enable_x64(True):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float64))
        m0 = get_model(model_name)
        m1 = dataclasses.replace(m0, s2d=True, s2d_deep=True)
        v = m0.init(jax.random.PRNGKey(0), x, True)
        v = jax.tree.map(
            lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a, v)

        def fwd(m):
            out, _ = m.apply(v, x, True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(7)})
            return out

        assert float(jnp.max(jnp.abs(fwd(m0) - fwd(m1)))) < 1e-12

        def loss(m, params):
            vv = {"params": params, "batch_stats": v["batch_stats"]}
            out, _ = m.apply(vv, x, True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(7)})
            return jnp.mean(out ** 2)

        g0 = jax.grad(lambda p: loss(m0, p))(v["params"])
        g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
        errs = jax.tree.leaves(
            jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1))
        assert max(errs) < 1e-9, max(errs)


def test_linknet_s2d_head_matches_normal():
    """LinkNet34's s2d head (VALID-via-SAME at odd full resolution) equals
    the normal head exactly — forward and parameter gradients."""
    import dataclasses
    from segtpu.models import get_model

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32))
    m0 = get_model("linknet34")
    m1 = dataclasses.replace(m0, s2d=True)
    v = m0.init(jax.random.PRNGKey(0), x, True)

    def fwd(m):
        out, _ = m.apply(v, x, True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(3)})
        return out

    assert float(jnp.max(jnp.abs(fwd(m0) - fwd(m1)))) < 1e-4

    def loss(m, p):
        out, _ = m.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x, True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.mean(out ** 2)

    g0 = jax.grad(lambda p: loss(m0, p))(v["params"])
    g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
    errs = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1))
    assert max(errs) < 1e-5, max(errs)


def test_deconv_s2d_kernel_matches_conv_transpose():
    """layers.DeconvS2D (stride-2 k4 p1 deconv emitted directly in s2d
    layout) equals ConvTranspose2dTorch in value and parameter gradients,
    with an identical parameter tree."""
    import jax.tree_util as jtu

    from segtpu.models.layers import ConvTranspose2dTorch, DeconvS2D

    x = jnp.asarray(np.random.RandomState(0).rand(2, 12, 10, 5).astype(np.float32))
    ref = ConvTranspose2dTorch(7, 4, 2, padding=1)
    v = ref.init(jax.random.PRNGKey(1), x)
    alt = DeconvS2D(7)
    assert (jtu.tree_structure(v)
            == jtu.tree_structure(alt.init(jax.random.PRNGKey(1), x)))

    y_ref = ref.apply(v, x)
    y_s2d = d2s(alt.apply(v, x))
    assert y_ref.shape == (2, 24, 20, 7)
    np.testing.assert_allclose(y_s2d, y_ref, atol=1e-5)

    g_ref = jax.grad(lambda p: jnp.mean(ref.apply({"params": p}, x) ** 2))(
        v["params"])
    g_s2d = jax.grad(
        lambda p: jnp.mean(d2s(alt.apply({"params": p}, x)) ** 2))(v["params"])
    errs = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g_ref, g_s2d))
    assert max(errs) < 1e-5, max(errs)


@pytest.mark.parametrize("model_name", ["squeezenet", "linknext"])
def test_stem_s2d_exact_in_float64(model_name):
    """SqueezeNet / LinkNext s2d stems (s2d stem conv, pool exits, s2d skip
    + head for squeezenet, grouped BN stats for linknext) are EXACTLY the
    normal-path math — ~1e-12 forward and ~1e-9 grads in float64, where
    BN-stat rounding cannot hide a wiring bug."""
    import dataclasses

    from segtpu.models import get_model

    with jax.enable_x64(True):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float64))
        m0 = get_model(model_name)
        m1 = dataclasses.replace(m0, s2d=True)
        v = m0.init(jax.random.PRNGKey(0), x, True)
        v = jax.tree.map(
            lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a, v)

        def fwd(m):
            out, _ = m.apply(v, x, True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(7)})
            return out

        assert float(jnp.max(jnp.abs(fwd(m0) - fwd(m1)))) < 1e-11

        def loss(m, params):
            vv = {"params": params, **{k: v[k] for k in v if k != "params"}}
            out, _ = m.apply(vv, x, True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(7)})
            return jnp.mean(out ** 2)

        g0 = jax.grad(lambda p: loss(m0, p))(v["params"])
        g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
        errs = jax.tree.leaves(
            jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1))
        assert max(errs) < 1e-9, max(errs)


@pytest.mark.parametrize("model_name", ["unet11", "unet16"])
def test_ternaus_s2d_matches_normal(model_name):
    """UNet11/UNet16 s2d execution (s2d VGG stem, deconv-to-s2d dec2,
    blocked-concat dec1, s2d 1x1 head) — forward and parameter-gradient
    parity with the normal path on shared params."""
    import dataclasses

    from segtpu.models import get_model

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32))
    m0 = get_model(model_name)
    m1 = dataclasses.replace(m0, s2d=True)
    v = m0.init(jax.random.PRNGKey(0), x)

    a = m0.apply(v, x)
    b = m1.apply(v, x)
    assert a.shape == b.shape == (2, 64, 64, 1)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-4

    g0 = jax.grad(lambda p: jnp.mean(m0.apply({"params": p}, x) ** 2))(v["params"])
    g1 = jax.grad(lambda p: jnp.mean(m1.apply({"params": p}, x) ** 2))(v["params"])
    errs = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1))
    assert max(errs) < 1e-4, max(errs)
