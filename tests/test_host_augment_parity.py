"""Host augmentation parity vs the reference lib/augmentations.py (used as a
test oracle from its checkout; skipped when absent).

Both implementations draw from the global ``random`` module in the same
sequence, so seeding before each application makes them bit-comparable.
"""

import os
import random
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference checkout")
pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

if REF not in sys.path:
    sys.path.insert(0, REF)

from lib import augmentations as ref_aug  # noqa: E402

from segtpu.augment import host as our_aug  # noqa: E402


@pytest.fixture
def img_mask():
    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    mask = ((rng.rand(32, 32) > 0.5) * 255).astype(np.uint8)
    return img, mask


PAIRS = [
    ("VerticalFlip", {}, True),
    ("HorizontalFlip", {}, True),
    ("Transpose", {}, True),
    ("RandomRotate90", {}, True),
    ("Rotate", {"limit": 30, "prob": 1.0}, True),
    ("Shift", {"limit": 4, "prob": 1.0}, True),
    ("ShiftScale", {"limit": 4, "prob": 1.0}, True),
    ("ShiftScaleRotate", {"rotate_limit": 15, "prob": 1.0}, True),
    ("CenterCrop", {"height": 16, "width": 16}, True),
    ("RandomCrop", {"size": 16}, True),
]


@pytest.mark.parametrize("name,kwargs,paired", PAIRS)
def test_geometric_parity(name, kwargs, paired, img_mask):
    img, mask = img_mask
    if name in ("Shift", "ShiftScale"):
        # the reference versions index masks with a trailing ':' and crash on
        # 2D masks (they appear in no upstream pipeline); compare with a
        # 3-channel mask where both run
        mask = np.repeat(mask[..., None], 3, axis=2)
    ref_t = getattr(ref_aug, name)(**kwargs)
    our_t = getattr(our_aug, name)(**kwargs)

    random.seed(1234)
    ref_i, ref_m = ref_t(img.copy(), mask.copy())
    random.seed(1234)
    got_i, got_m = our_t(img.copy(), mask.copy())
    np.testing.assert_array_equal(got_i, ref_i)
    np.testing.assert_array_equal(got_m, ref_m)


IMAGE_ONLY = [
    ("RandomGrayscale", {"prob": 1.0}),
    ("RandomInvert", {"prob": 1.0}),
    ("RandomFilter", {"prob": 1.0}),
    ("RandomBrightness", {"prob": 1.0}),
    ("RandomContrast", {"prob": 1.0}),
    ("CLAHE", {}),
    ("NormalizeImage", {}),
]


@pytest.mark.parametrize("name,kwargs", IMAGE_ONLY)
def test_photometric_parity(name, kwargs, img_mask):
    img, _ = img_mask
    x = img.astype(np.float32) if name in ("RandomBrightness", "RandomContrast",
                                           "RandomFilter", "NormalizeImage") else img
    ref_t = getattr(ref_aug, name)(**kwargs)
    our_t = getattr(our_aug, name)(**kwargs)

    random.seed(77)
    ref_o = ref_t(x.copy())
    random.seed(77)
    got_o = our_t(x.copy())
    np.testing.assert_allclose(got_o, ref_o, atol=1e-4)


def test_make_binary_parity(img_mask):
    _, mask = img_mask
    np.testing.assert_array_equal(
        our_aug.MakeBinary()(mask.copy()), ref_aug.MakeBinary()(mask.copy())
    )


def test_sequential_pipeline_parity(img_mask):
    img, mask = img_mask

    def build(mod):
        return mod.Sequential([
            mod.VerticalFlip(),
            mod.HorizontalFlip(),
            mod.RandomRotate90(),
            mod.ShiftScaleRotate(rotate_limit=15),
            mod.ImageOnly(mod.NormalizeImage()),
            mod.MaskOnly(mod.MakeBinary()),
        ])

    random.seed(99)
    ref_i, ref_m = build(ref_aug)(img.astype(np.float32), mask.copy())
    random.seed(99)
    got_i, got_m = build(our_aug)(img.astype(np.float32), mask.copy())
    np.testing.assert_allclose(got_i, ref_i, atol=1e-4)
    np.testing.assert_array_equal(got_m, ref_m)


def test_pad_unpad_parity(img_mask):
    img, _ = img_mask
    rect = img[:30, :22]
    ref_p, ref_pads = ref_aug.pad(rect, 32, borderType=cv2.BORDER_REPLICATE)
    got_p, got_pads = our_aug_pad = __import__(
        "segtpu.augment", fromlist=["pad_to_multiple"]
    ).pad_to_multiple(rect, 32)
    assert got_pads == ref_pads
    np.testing.assert_array_equal(got_p, ref_p)
