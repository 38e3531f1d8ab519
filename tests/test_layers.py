"""Layer parity tests against torch (CPU) reference ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from segtpu.models import layers


def test_upsample_nearest_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    got = np.asarray(layers.upsample_nearest(jnp.array(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    exp = torch.nn.functional.interpolate(xt, scale_factor=2, mode="nearest")
    exp = exp.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_max_pool_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    got = np.asarray(layers.max_pool(jnp.array(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    exp = torch.nn.functional.max_pool2d(xt, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_max_pool_backward_matches_torch_with_ties():
    """Custom-VJP pool routes dy to the FIRST row-major argmax like torch —
    ties (common at 0.0 after ReLU) must not split the gradient."""
    rng = np.random.RandomState(7)
    # relu-like input: half the entries exactly zero -> many tied windows
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    x[x < 0] = 0.0
    dy = rng.randn(2, 4, 4, 4).astype(np.float32)

    def pooled_sum(xj):
        return jnp.sum(layers.max_pool(xj) * jnp.asarray(dy))

    got = np.asarray(jax.grad(pooled_sum)(jnp.asarray(x)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
    yt = torch.nn.functional.max_pool2d(xt, 2)
    yt.backward(torch.from_numpy(dy).permute(0, 3, 1, 2))
    exp = xt.grad.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_max_pool_odd_shapes_fall_back():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 7, 7, 3).astype(np.float32))
    assert layers.max_pool(x).shape == (1, 3, 3, 3)


def test_upsample_bilinear_align_corners_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 7, 9, 2).astype(np.float32)
    got = np.asarray(layers.upsample_bilinear(jnp.array(x), (14, 18)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    exp = torch.nn.functional.interpolate(
        xt, size=(14, 18), mode="bilinear", align_corners=True
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_pixel_shuffle_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 4, 18).astype(np.float32)  # C=2, r=3
    got = np.asarray(layers.pixel_shuffle(jnp.array(x), 3))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    exp = torch.nn.functional.pixel_shuffle(xt, 3).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, exp, atol=1e-6)


@pytest.mark.parametrize(
    "k,s,p,op",
    [(4, 2, 1, 0), (2, 2, 0, 0), (3, 2, 0, 0), (3, 2, 1, 1), (4, 2, 2, 0)],
)
def test_conv_transpose_matches_torch(k, s, p, op):
    rng = np.random.RandomState(4)
    cin, cout, h = 3, 5, 6
    x = rng.randn(2, h, h, cin).astype(np.float32)
    w = rng.randn(cin, cout, k, k).astype(np.float32) * 0.2
    b = rng.randn(cout).astype(np.float32) * 0.1

    m = layers.ConvTranspose2dTorch(cout, k, s, padding=p, output_padding=op)
    v = m.init(jax.random.PRNGKey(0), jnp.array(x))
    # flax ConvTranspose with transpose_kernel=True stores (k, k, cout, cin)
    kernel = jnp.array(np.transpose(w, (2, 3, 1, 0)))
    v = {"params": {"ConvTranspose_0": {"kernel": kernel, "bias": jnp.array(b)}}}
    got = np.asarray(m.apply(v, jnp.array(x)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    exp = torch.nn.functional.conv_transpose2d(
        xt, torch.from_numpy(w), torch.from_numpy(b),
        stride=s, padding=p, output_padding=op,
    ).permute(0, 2, 3, 1).numpy()
    assert got.shape == exp.shape
    np.testing.assert_allclose(got, exp, atol=1e-4)


@pytest.mark.parametrize("k,s,p,d,g", [(3, 1, 1, 1, 1), (7, 2, 3, 1, 1),
                                       (3, 1, 2, 2, 1), (3, 1, 1, 1, 4)])
def test_conv_matches_torch(k, s, p, d, g):
    rng = np.random.RandomState(5)
    cin, cout, h = 8, 16, 9
    x = rng.randn(2, h, h, cin).astype(np.float32)
    w = rng.randn(cout, cin // g, k, k).astype(np.float32) * 0.2
    b = rng.randn(cout).astype(np.float32) * 0.1

    m = layers.Conv(cout, k, stride=s, padding=p, dilation=d, groups=g)
    kernel = jnp.array(np.transpose(w, (2, 3, 1, 0)))  # flax (k,k,cin/g,cout)
    v = {"params": {"Conv_0": {"kernel": kernel, "bias": jnp.array(b)}}}
    got = np.asarray(m.apply(v, jnp.array(x)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    exp = torch.nn.functional.conv2d(
        xt, torch.from_numpy(w), torch.from_numpy(b),
        stride=s, padding=p, dilation=d, groups=g,
    ).permute(0, 2, 3, 1).numpy()
    assert got.shape == exp.shape
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_dropout2d_drops_whole_channels():
    m = layers.Dropout2d(0.5)
    x = jnp.ones((4, 8, 8, 16))
    v = m.init(jax.random.PRNGKey(0), x, deterministic=True)
    y = m.apply(v, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    y = np.asarray(y)
    # each (sample, channel) plane is either all-zero or all-scaled
    planes = y.reshape(4, 64, 16)
    per_plane_unique = [len(np.unique(planes[i, :, c])) for i in range(4) for c in range(16)]
    assert max(per_plane_unique) == 1
    assert (y == 0).any() and (y == 2.0).any()
    # deterministic passes through
    yd = m.apply(v, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(yd), np.asarray(x))


def test_polyphase_deconv_matches_conv_transpose():
    """The stride-2 polyphase fast path equals flax nn.ConvTranspose
    (VALID, transpose_kernel) in value and gradient for every zoo kernel
    size, and ConvTranspose2dTorch keeps the identical parameter tree."""
    import numpy as np
    from flax import linen as nn
    from segtpu.models.layers import ConvTranspose2dTorch, _deconv_s2_polyphase

    rng = np.random.RandomState(0)
    for k in (2, 3, 4):
        x = jnp.asarray(rng.randn(2, 5, 6, 3).astype(np.float32))
        K = jnp.asarray(rng.randn(k, k, 4, 3).astype(np.float32))
        ref_m = nn.ConvTranspose(features=4, kernel_size=(k, k), strides=(2, 2),
                                 padding="VALID", transpose_kernel=True,
                                 use_bias=False)
        ref = ref_m.apply({"params": {"kernel": K}}, x)
        got = _deconv_s2_polyphase(x, K)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        g = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))
        g_ref = jax.grad(lambda kk: jnp.sum(
            ref_m.apply({"params": {"kernel": kk}}, x) * g))(K)
        g_got = jax.grad(lambda kk: jnp.sum(_deconv_s2_polyphase(x, kk) * g))(K)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)

    # parameter tree unchanged (checkpoint / torch-transplant compat)
    m = ConvTranspose2dTorch(4, 2, 2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 3)))
    assert set(v["params"].keys()) == {"ConvTranspose_0"}
    assert v["params"]["ConvTranspose_0"]["kernel"].shape == (2, 2, 4, 3)
    assert v["params"]["ConvTranspose_0"]["bias"].shape == (4,)


@pytest.mark.parametrize("k,s", [(2, 2), (3, 2), (4, 2)])
def test_deconv_full_grads_match_autodiff(k, s):
    """The production reverse-free backward (`deconv_full`, the path every
    ConvTranspose2dTorch call routes through) matches autodiff of the plain
    ``lax.conv_transpose`` lowering — dx AND dW — for every (kernel, stride)
    the zoo instantiates: (2,2) unet up, (3,2) linknet/linknext/tiramisu
    final deconvs, (4,2) linknet/ternaus/linknext decoder deconvs."""
    from segtpu.models.layers import deconv_full

    rng = np.random.RandomState(k * 10 + s)
    x = jnp.asarray(rng.randn(2, 5, 6, 3).astype(np.float32))
    K = jnp.asarray(rng.randn(k, k, 4, 3).astype(np.float32))

    def ref(xx, kk):
        return jax.lax.conv_transpose(
            xx, kk, (s, s), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)

    y_ref = ref(x, K)
    y_got = deconv_full(x, K, s)
    np.testing.assert_array_equal(np.asarray(y_got), np.asarray(y_ref))

    g = jnp.asarray(rng.randn(*y_ref.shape).astype(np.float32))
    dx_ref, dw_ref = jax.vjp(ref, x, K)[1](g)
    dx_got, dw_got = jax.vjp(lambda xx, kk: deconv_full(xx, kk, s), x, K)[1](g)
    np.testing.assert_allclose(np.asarray(dx_got), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)


def test_linknet34_train_step_grads_match_autodiff_deconv():
    """End-to-end: linknet34 loss gradients with the production reverse-free
    deconv backward equal the gradients with JAX's builtin transposed-conv
    autodiff (same forward, only the VJP rule differs). Guards the change
    that landed in round 3 (models/layers.py::_ConvTransposeRF)."""
    from segtpu.models import get_model
    from segtpu.models.layers import _DECONV_FULL_CV
    from segtpu.ops.losses import get_loss

    model = get_model("linknet34", patch_size=64, num_channels=3)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    y = jnp.asarray((np.random.RandomState(1).rand(2, 64, 64, 1) > 0.5),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    loss_fn = get_loss("bce_jaccard")

    def loss_of(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        return loss_fn(logits, y)

    g_custom = jax.grad(loss_of)(variables["params"])

    # swap the cached custom-VJP closures for the plain autodiff lowering
    saved = dict(_DECONV_FULL_CV)
    try:
        for s in saved:
            _DECONV_FULL_CV[s] = lambda xx, kk, s=s: jax.lax.conv_transpose(
                xx, kk, (s, s), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True)
        g_auto = jax.grad(loss_of)(variables["params"])
    finally:
        _DECONV_FULL_CV.clear()
        _DECONV_FULL_CV.update(saved)

    flat_c = jax.tree_util.tree_leaves_with_path(g_custom)
    flat_a = dict(jax.tree_util.tree_leaves_with_path(g_auto))
    assert flat_c and len(flat_c) == len(flat_a)
    for path, leaf in flat_c:
        ref_leaf = flat_a[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref_leaf), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))
