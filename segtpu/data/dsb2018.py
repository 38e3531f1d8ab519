"""DSB2018 (Data Science Bowl 2018 nuclei) datasets
(reference lib/datasets/dsb2018.py).

Split parity: ``train_test_split(random_state=1234, test_size=0.1)`` with the
same stratification (by source image id for the sliced variant) so val-IoU is
comparable run-to-run with the reference.
"""

from __future__ import annotations

import os

from sklearn.model_selection import train_test_split

from segtpu.augment import host as aug
from segtpu.data.common import ImageMaskDataset, InMemoryDataset
from segtpu.tiles import ImageSlicer
from segtpu.utils import find_in_dir, read_mask, read_rgb


def DSB2018(dataset_dir: str, grayscale: bool, patch_size: int):
    """Random/center-crop file-based variant (reference dsb2018.py:11-49)."""
    images = find_in_dir(os.path.join(dataset_dir, "images"))
    masks = find_in_dir(os.path.join(dataset_dir, "masks"))

    x_train, x_test, y_train, y_test = train_test_split(
        images, masks, random_state=1234, test_size=0.1
    )

    train_transform = aug.Sequential([
        aug.RandomCrop(patch_size),
        aug.ImageOnly(aug.NormalizeImage()),
        aug.MaskOnly(aug.MakeBinary()),
    ])
    test_transform = aug.Sequential([
        aug.CenterCrop(patch_size, patch_size),
        aug.ImageOnly(aug.NormalizeImage()),
        aug.MaskOnly(aug.MakeBinary()),
    ])

    train = ImageMaskDataset(x_train, y_train, image_loader=read_rgb,
                             target_loader=read_mask,
                             transform=train_transform, load_in_ram=False)
    test = ImageMaskDataset(x_test, y_test, image_loader=read_rgb,
                            target_loader=read_mask,
                            transform=test_transform, load_in_ram=False)
    return train, test, 1


def DSB2018Sliced(dataset_dir: str, grayscale: bool, patch_size: int):
    """RAM-sliced variant, registered as ``dsb2018``
    (reference dsb2018.py:52-98): load all images, slice into overlapping
    patches (step = patch/2), stratified split by source image id, heavy
    train augmentations."""
    images = [read_rgb(x) for x in find_in_dir(os.path.join(dataset_dir, "images"))]
    masks = [read_mask(x) for x in find_in_dir(os.path.join(dataset_dir, "masks"))]

    image_ids = []
    patch_images = []
    patch_masks = []
    for image_id, (image, mask) in enumerate(zip(images, masks)):
        slicer = ImageSlicer(image.shape, patch_size, patch_size // 2)
        patch_images.extend(slicer.split(image))
        patch_masks.extend(slicer.split(mask))
        image_ids.extend([image_id] * len(slicer.crops))

    x_train, x_test, y_train, y_test = train_test_split(
        patch_images, patch_masks, random_state=1234, test_size=0.1,
        stratify=image_ids,
    )

    train_transform = aug.Sequential([
        aug.ImageOnly(aug.NormalizeImage()),
        aug.RandomRotate90(),
        aug.VerticalFlip(),
        aug.HorizontalFlip(),
        aug.ShiftScaleRotate(rotate_limit=15),
        aug.MaskOnly(aug.MakeBinary()),
    ])
    test_transform = aug.Sequential([
        aug.ImageOnly(aug.NormalizeImage()),
        aug.MaskOnly(aug.MakeBinary()),
    ])

    train = InMemoryDataset(x_train, y_train, transform=train_transform)
    test = InMemoryDataset(x_test, y_test, transform=test_transform)
    return train, test, 1
