"""Run the upstream torch reference trainer (/root/reference/torch_train.py)
on CPU, unmodified, as the accuracy oracle for the A/B harness
(tools/ab_nuclei.py).

The reference assumes a 2018-era CUDA environment; this shim installs the
minimum compatibility surface so the *same code* runs here, with every patch
chosen to preserve the training math exactly:

  * ``collections.Iterable`` alias — removed in Python >= 3.10
    (reference lib/modules/abn/bn.py:1).
  * fake ``torchvision``: a minimal ResNet-34 with torchvision-identical
    module structure, state_dict keys and initialization (kaiming fan-out)
    for LinkNet34's encoder (reference lib/models/linknet.py:39), plus a
    ``make_grid`` stub (only feeds TensorBoard images). ``pretrained=True``
    is ignored — zero-egress environment, no ImageNet weights exist on disk;
    the A/B therefore compares from identical *random* init on both sides
    (the standing caveat recorded in BASELINE.md).
  * fake ``inplace_abn`` extension: a pure-torch CPU implementation of the
    CUDA backend ops the reference imports at lib/modules/abn/functions.py:1
    (mean_var / forward / edz_eydz / backward / leaky_relu_* / elu_*), with
    the same in-place semantics and the same from-output gradient
    reconstruction.
  * ``Tensor.cuda`` / ``Module.cuda`` as identity (CPU run).
  * ``pd.DataFrame.append`` restored via ``pd.concat`` (removed in pandas 2).
  * ``SummaryWriter.add_graph`` no-op (tracing the 2018 graph API crashes on
    torch 2.x; observability only, training math untouched).
  * ``lib.common.find_in_dir`` sorted — the reference uses raw
    ``os.listdir`` order (lib/common.py:39-40), which is filesystem
    dependent; sorting makes the seed-1234 split identical to segtpu's
    (segtpu/utils/__init__.py:52-54) and reproducible.

Environment knobs:
  AB_SAVE_INIT=<path>  torch.save the freshly built model's state_dict
                       before any training (for identical-init transplants).
  AB_SEED=<int>        seeds torch / numpy / random before model build.

Usage:  python tools/ref_cpu_shim.py -m zf_unet -d dsb2018 -dd <dir> ...
(arguments are the reference torch_train.py flags, forwarded verbatim)
"""

from __future__ import annotations

import collections
import collections.abc
import os
import sys
import types

REF = "/root/reference"


# --------------------------------------------------------------------------
# pure-torch CPU implementation of the inplace_abn CUDA extension
# (call surface: reference lib/modules/abn/functions.py:81-122)
# --------------------------------------------------------------------------

def _make_inplace_abn_backend():
    import torch

    mod = types.ModuleType("inplace_abn")

    def _bshape(x):
        return [x.size(1) if i == 1 else 1 for i in range(x.dim())]

    def mean_var(x):
        dims = [d for d in range(x.dim()) if d != 1]
        mean = x.mean(dim=dims)
        var = x.var(dim=dims, unbiased=False)
        return mean, var

    def forward(x, mean, var, weight, bias, affine, eps):
        shape = _bshape(x)
        xhat = (x - mean.view(shape)) * torch.rsqrt(var.view(shape) + eps)
        if affine:
            xhat = xhat * weight.view(shape) + bias.view(shape)
        x.copy_(xhat)
        return True

    def leaky_relu_forward(x, slope):
        x.copy_(torch.where(x >= 0, x, x * slope))
        return True

    def leaky_relu_backward(z, dz, slope):
        # invert the activation on z AND chain-rule dz, both in place —
        # matching the CUDA kernel's dual update
        neg = z < 0
        z.copy_(torch.where(neg, z / slope, z))
        dz.copy_(torch.where(neg, dz * slope, dz))
        return True

    def elu_forward(x):
        x.copy_(torch.where(x >= 0, x, torch.expm1(x)))
        return True

    def elu_backward(z, dz):
        neg = z < 0
        dz.copy_(torch.where(neg, dz * (z + 1.0), dz))
        z.copy_(torch.where(neg, torch.log1p(z), z))
        return True

    def edz_eydz(z, dz, weight, bias, affine, eps):
        # z is the module OUTPUT; reconstruct xhat = (z - beta) / gamma
        shape = _bshape(z)
        if affine:
            xhat = (z - bias.view(shape)) / weight.view(shape)
        else:
            xhat = z
        dims = [d for d in range(z.dim()) if d != 1]
        edz = dz.sum(dim=dims)
        eydz = (xhat * dz).sum(dim=dims)
        return edz, eydz

    def backward(z, dz, var, weight, bias, edz, eydz, affine, eps):
        shape = _bshape(z)
        count = 1
        for i, s in enumerate(z.size()):
            if i != 1:
                count *= s
        if affine:
            xhat = (z - bias.view(shape)) / weight.view(shape)
            mul = weight.view(shape) * torch.rsqrt(var.view(shape) + eps)
        else:
            xhat = z
            mul = torch.rsqrt(var.view(shape) + eps)
        dx = (dz - edz.view(shape) / count - xhat * eydz.view(shape) / count) * mul
        dweight = eydz if affine else None
        dbias = edz if affine else None
        return dx, dweight, dbias

    mod.mean_var = mean_var
    mod.forward = forward
    mod.leaky_relu_forward = leaky_relu_forward
    mod.leaky_relu_backward = leaky_relu_backward
    mod.elu_forward = elu_forward
    mod.elu_backward = elu_backward
    mod.edz_eydz = edz_eydz
    mod.backward = backward
    return mod


# --------------------------------------------------------------------------
# minimal torchvision: resnet34 with torchvision-identical structure/init
# --------------------------------------------------------------------------

def _make_torchvision():
    import torch
    import torch.nn as nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, layers):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(64, layers[0])
            self.layer2 = self._make_layer(128, layers[1], 2)
            self.layer3 = self._make_layer(256, layers[2], 2)
            self.layer4 = self._make_layer(512, layers[3], 2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512, 1000)
            for m in self.modules():
                if isinstance(m, nn.Conv2d):
                    nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                            nonlinearity="relu")
                elif isinstance(m, nn.BatchNorm2d):
                    nn.init.constant_(m.weight, 1)
                    nn.init.constant_(m.bias, 0)

        def _make_layer(self, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes),
                )
            layers = [BasicBlock(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes
            for _ in range(1, blocks):
                layers.append(BasicBlock(self.inplanes, planes))
            return nn.Sequential(*layers)

        def forward(self, x):  # pragma: no cover - encoder used piecewise
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(torch.flatten(self.avgpool(x), 1))

    def resnet34(pretrained=False, **kwargs):
        if pretrained:
            print("[ref_cpu_shim] pretrained=True ignored: zero-egress "
                  "environment, random-init encoder (see BASELINE.md caveat)")
        return ResNet([3, 4, 6, 3])

    def make_grid(tensor, **kwargs):
        import torch as _t
        if isinstance(tensor, (list, tuple)):
            tensor = _t.stack(list(tensor))
        if tensor.dim() == 4:
            return tensor[0]
        return tensor

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvu = types.ModuleType("torchvision.utils")
    tvm.resnet34 = resnet34
    tvu.make_grid = make_grid
    tv.models = tvm
    tv.utils = tvu
    tv.__version__ = "0.0-segtpu-shim"
    return tv, tvm, tvu


def install(seed=None):
    """Install every shim; import and return the reference torch_train."""
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable

    import torch

    sys.modules.setdefault("inplace_abn", _make_inplace_abn_backend())
    if "torchvision" not in sys.modules:
        tv, tvm, tvu = _make_torchvision()
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.utils"] = tvu

    torch.Tensor.cuda = lambda self, *a, **kw: self
    torch.nn.Module.cuda = lambda self, *a, **kw: self

    import pandas as pd
    if not hasattr(pd.DataFrame, "append"):
        pd.DataFrame.append = lambda self, other, ignore_index=False: (
            pd.concat([self, other], ignore_index=ignore_index))

    import tensorboardX
    tensorboardX.SummaryWriter.add_graph = lambda self, *a, **kw: None

    if seed is not None:
        import random

        import numpy as np
        torch.manual_seed(seed)
        np.random.seed(seed)
        random.seed(seed)

    if REF not in sys.path:
        sys.path.insert(0, REF)

    # modern autograd rejects the reference's ctx.mark_dirty(x, running_mean,
    # running_var) because only x is returned (lib/modules/abn/functions.py:
    # 88-91); re-bind the Function with a forward that marks only x dirty —
    # the running buffers (requires_grad=False) may be updated in place
    # without marking. Math identical; backward is the reference's own.
    import lib.modules.abn.bn as ref_bn
    import lib.modules.abn.functions as ref_fn

    class _ModernInPlaceABN(ref_fn.InPlaceABN):
        @staticmethod
        def forward(ctx, x, weight, bias, running_mean, running_var,
                    training=True, momentum=0.1, eps=1e-05,
                    activation=ref_fn.ACT_LEAKY_RELU, slope=0.01):
            ctx.training = training
            ctx.momentum = momentum
            ctx.eps = eps
            ctx.activation = activation
            ctx.slope = slope
            ctx.affine = weight is not None and bias is not None
            count = ref_fn._count_samples(x)
            x = x.contiguous()
            weight = weight.contiguous() if ctx.affine else x.new_empty(0)
            bias = bias.contiguous() if ctx.affine else x.new_empty(0)
            backend = sys.modules["inplace_abn"]
            if ctx.training:
                mean, var = backend.mean_var(x)
                running_mean.mul_(1 - ctx.momentum).add_(ctx.momentum * mean)
                running_var.mul_(1 - ctx.momentum).add_(
                    ctx.momentum * var * count / (count - 1))
            else:
                mean, var = running_mean.contiguous(), running_var.contiguous()
            ctx.mark_dirty(x)
            backend.forward(x, mean, var, weight, bias, ctx.affine, ctx.eps)
            ref_fn._act_forward(ctx, x)
            ctx.var = var
            ctx.save_for_backward(x, var, weight, bias)
            return x

    ref_fn.inplace_abn = _ModernInPlaceABN.apply
    ref_bn.inplace_abn = _ModernInPlaceABN.apply

    import lib.common as ref_common
    _orig_listdir = os.listdir
    ref_common.find_in_dir = lambda d: [
        os.path.join(d, f) for f in sorted(_orig_listdir(d))]
    # dsb2018.py binds its own reference at import time
    import lib.datasets.dsb2018 as ref_dsb
    ref_dsb.find_in_dir = ref_common.find_in_dir

    import torch_train as TT

    # modern torch's _Loss no longer stores the legacy size_average/reduce
    # attributes the reference's forward() reads (lib/losses.py:53,100);
    # restore them on every constructed loss (focal registers with
    # size_average=False, torch_train.py:91-92)
    orig_get_loss = TT.get_loss

    def get_loss_with_legacy_attrs(name):
        loss = orig_get_loss(name)
        size_average = name.lower() != "focal"
        for m in loss.modules():
            if not hasattr(m, "size_average"):
                m.size_average = size_average
            if not hasattr(m, "reduce"):
                m.reduce = True
        return loss

    TT.get_loss = get_loss_with_legacy_attrs

    save_init = os.environ.get("AB_SAVE_INIT")
    if save_init:
        orig_get_model = TT.get_model

        def get_model_and_dump(*a, **kw):
            model = orig_get_model(*a, **kw)
            torch.save(model.state_dict(), save_init)
            print("[ref_cpu_shim] initial state_dict saved to", save_init)
            return model

        TT.get_model = get_model_and_dump
    return TT


def main(argv=None):
    seed = os.environ.get("AB_SEED")
    TT = install(seed=int(seed) if seed else None)
    sys.argv = ["torch_train.py"] + (argv if argv is not None else sys.argv[1:])
    TT.main()


if __name__ == "__main__":
    main()
