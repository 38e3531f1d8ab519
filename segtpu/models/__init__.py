"""Model zoo registry (reference torch_train.py:100-148).

``get_model(name, patch_size, num_channels)`` -> (flax Module, metadata).
All models are NHWC, take ``(x, train=bool)`` and return raw logits with
``num_classes`` channels.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

from segtpu.models.unet import UNet, UNetABN, ZF_UNET, Afterburner  # noqa: F401

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory
    return deco


@register("unet")
def _unet(patch_size, num_channels):
    return UNet()


@register("unet_abn")
def _unet_abn(patch_size, num_channels):
    return UNetABN()


@register("zf_unet")
def _zf_unet(patch_size, num_channels):
    return ZF_UNET()


def _lazy_registrations():
    """Import model files that register themselves (deferred so importing the
    package stays light)."""
    from segtpu.models import linknet  # noqa: F401
    from segtpu.models import ternaus  # noqa: F401
    from segtpu.models import tiramisu  # noqa: F401
    from segtpu.models import gcn  # noqa: F401
    from segtpu.models import psp  # noqa: F401
    from segtpu.models import duc_hdc  # noqa: F401
    from segtpu.models import squeezenet  # noqa: F401
    from segtpu.models import linknext  # noqa: F401
    from segtpu.models import albunet  # noqa: F401


def get_model(model_name: str, patch_size: int = 224, num_channels: int = 3):
    """name -> constructed Flax module (reference torch_train.py:100-148)."""
    name = model_name.lower()
    if name not in _REGISTRY:
        _lazy_registrations()
    if name not in _REGISTRY:
        raise ValueError(model_name)
    return _REGISTRY[name](patch_size, num_channels)


def model_names():
    _lazy_registrations()
    return sorted(_REGISTRY)
