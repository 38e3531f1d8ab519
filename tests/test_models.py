"""Model zoo forward shape/dtype tests (SURVEY.md §4d): every registry name
produces (N, H, W, 1) float32 logits at its working sizes, in train and eval
modes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segtpu.models import get_model, model_names


FAST_MODELS = ["unet", "unet_abn", "zf_unet", "linknet34", "dilated_linknet34",
               "unet11", "squeezenet", "linknext", "albunet"]
SLOW_MODELS = ["unet16", "tiramisu57", "tiramisu67", "gcn34"]
HEAVY_MODELS = ["gcn", "psp_net", "duc", "duc_dc", "tiramisu103"]


def _run_forward(name, patch=64, batch=1):
    model = get_model(name, patch_size=patch, num_channels=3)
    x = jnp.zeros((batch, patch, patch, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (batch, patch, patch, 1), (name, y.shape)
    assert y.dtype == jnp.float32
    # train mode with mutable stats + dropout rng
    y2, _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert y2.shape == (batch, patch, patch, 1)
    assert np.isfinite(np.asarray(y2)).all(), name


@pytest.mark.parametrize("name", FAST_MODELS)
def test_forward_fast_models(name):
    _run_forward(name)


@pytest.mark.parametrize("name", SLOW_MODELS)
def test_forward_slow_models(name):
    _run_forward(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", HEAVY_MODELS)
def test_forward_heavy_models(name):
    _run_forward(name, patch=32)


def _run_forward_gray(name, patch=64):
    """-g (grayscale, 1-channel input) works for every zoo model — the
    reference hard-asserted 3 channels in linknet/linknext; here lazy stem
    convs accept any channel count (VERDICT r1 item 8)."""
    model = get_model(name, patch_size=patch, num_channels=1)
    x = jnp.zeros((1, patch, patch, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, patch, patch, 1), (name, y.shape)


@pytest.mark.parametrize("name", FAST_MODELS)
def test_forward_grayscale_fast_models(name):
    _run_forward_gray(name)


@pytest.mark.parametrize("name", SLOW_MODELS)
def test_forward_grayscale_slow_models(name):
    _run_forward_gray(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", HEAVY_MODELS)
def test_forward_grayscale_heavy_models(name):
    _run_forward_gray(name, patch=32)


def test_grayscale_encoder_weights_sum_rgb(tmp_path):
    """--encoder-weights under -g: the RGB stem kernel collapses by summing,
    so gray(x) response == rgb stem applied to replicated-gray input."""
    torch = pytest.importorskip("torch")
    import os
    import sys
    if not os.path.isdir("/root/reference"):
        pytest.skip("no reference checkout")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from lib.models.dilated_resnet import BasicBlock, DilatedResNet

    from segtpu.compat.encoder_weights import install_encoder_weights

    torch.manual_seed(0)
    ref = DilatedResNet(BasicBlock, [3, 4, 6, 3], dilated=False)
    pth = tmp_path / "resnet34.pth"
    torch.save(ref.state_dict(), str(pth))

    model = get_model("linknet34", num_channels=1)
    x1 = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1, train=False)
    params, stats = install_encoder_weights(
        "linknet34", variables["params"], variables["batch_stats"], str(pth))
    kern = np.asarray(params["encoder"]["conv1"]["Conv_0"]["kernel"])
    assert kern.shape == (7, 7, 1, 64)
    want = np.transpose(ref.state_dict()["conv1.weight"].numpy(),
                        (2, 3, 1, 0)).sum(axis=2, keepdims=True)
    np.testing.assert_allclose(kern, want, rtol=1e-6)
    y = model.apply({"params": params, "batch_stats": stats}, x1, train=False)
    assert np.isfinite(np.asarray(y)).all()


def test_registry_lists_all_reference_names():
    """All 16 reference registry names (torch_train.py:100-148) resolve."""
    reference_names = [
        "unet", "unet_abn", "unet11", "unet16", "zf_unet", "linknet34",
        "dilated_linknet34", "linknext", "tiramisu67", "gcn", "gcn34",
        "psp_net", "duc", "duc_dc", "squeezenet",
    ]
    available = model_names()
    for name in reference_names:
        assert name in available, name


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        get_model("not_a_model")


def test_unet_param_count_matches_reference():
    """Exact parameter-count parity with the torch reference UNet/ZF_UNET
    (counted from the torch modules: 3,352,257 / 31,454,721)."""
    for name, expected in [("unet", 3_352_257), ("zf_unet", 31_454_721)]:
        model = get_model(name)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        n = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
        assert n == expected, (name, n, expected)


class TestTiramisuPacked:
    """FCDenseNet packed=True == packed=False: the packed execution mode
    grows dense blocks in a preallocated buffer (static-offset
    dynamic_update_slice appends) instead of rebuilding the running concat
    every layer. Exact math, identical param tree, identical dropout RNG
    consumption (same submodule names)."""

    def _models(self):
        import dataclasses

        from segtpu.models.tiramisu import FCDenseNet

        base = FCDenseNet(down_blocks=(2, 2), up_blocks=(2, 2),
                          bottleneck_layers=2, growth_rate=8,
                          out_chans_first_conv=12, n_classes=1)
        return base, dataclasses.replace(base, packed=True)

    def test_forward_and_grad_equivalence(self):
        base, packed = self._models()
        rng = np.random.RandomState(11)
        x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
        vb = base.init(jax.random.PRNGKey(0), x, train=False)
        vp = packed.init(jax.random.PRNGKey(0), x, train=False)
        pb = jax.tree_util.tree_leaves_with_path(vb)
        pp = jax.tree_util.tree_leaves_with_path(vp)
        assert [p for p, _ in pb] == [p for p, _ in pp]

        yb = base.apply(vb, x, train=False)
        yp = packed.apply(vb, x, train=False)
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yb), atol=1e-5)

        def loss(variables, model):
            out, _ = model.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(out ** 2)

        gb = jax.grad(loss)(vb, base)
        gp = jax.grad(loss)(vb, packed)
        for a, b in zip(jax.tree_util.tree_leaves(gb),
                        jax.tree_util.tree_leaves(gp)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4)

    def test_packed_upsample_block(self):
        """upsample=True blocks (bottleneck / up path) return only the new
        features; the packed path must slice them out identically."""
        from segtpu.models.tiramisu import DenseBlock

        rng = np.random.RandomState(12)
        x = jnp.asarray(rng.randn(2, 8, 8, 12).astype(np.float32))
        blk = DenseBlock(growth_rate=8, n_layers=3, upsample=True)
        pblk = DenseBlock(growth_rate=8, n_layers=3, upsample=True, packed=True)
        v = blk.init(jax.random.PRNGKey(0), x, train=False)
        yb = blk.apply(v, x, train=False)
        yp = pblk.apply(v, x, train=False)
        assert yb.shape == (2, 8, 8, 24)
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yb), atol=1e-5)


class TestTiramisuRematPolicy:
    """FCDenseNet remat_policy='conv_in' == baseline: the targeted
    per-dense-layer jax.checkpoint (save_only_these_names on the tagged
    post-BN-relu conv input) is exact math — values AND grads — with an
    identical param tree and identical dropout RNG consumption."""

    def _models(self):
        import dataclasses

        from segtpu.models.tiramisu import FCDenseNet

        base = FCDenseNet(down_blocks=(2, 2), up_blocks=(2, 2),
                          bottleneck_layers=2, growth_rate=8,
                          out_chans_first_conv=12, n_classes=1)
        return base, dataclasses.replace(base, remat_policy="conv_in")

    def test_forward_and_grad_equivalence(self):
        base, pol = self._models()
        rng = np.random.RandomState(13)
        x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
        vb = base.init(jax.random.PRNGKey(0), x, train=False)
        vp = pol.init(jax.random.PRNGKey(0), x, train=False)
        pb = jax.tree_util.tree_leaves_with_path(vb)
        pp = jax.tree_util.tree_leaves_with_path(vp)
        assert [p for p, _ in pb] == [p for p, _ in pp]

        yb = base.apply(vb, x, train=False)
        yp = pol.apply(vb, x, train=False)
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yb), atol=1e-5)

        def loss(variables, model):
            out, _ = model.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(out ** 2)

        gb = jax.grad(loss)(vb, base)
        gp = jax.grad(loss)(vb, pol)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gb),
            jax.tree_util.tree_leaves_with_path(gp),
        ):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=str(path))
