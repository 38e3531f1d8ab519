"""Dataset registry (reference torch_train.py:39-64).

``get_dataset(name, dataset_dir, grayscale, patch_size, keep_in_mem)`` ->
``(train_ds, valid_ds, num_classes)``.
"""

from __future__ import annotations

from segtpu.data.pipeline import DataLoader, prefetch_to_device  # noqa: F401
from segtpu.data.shapes import SHAPES, DeviceShapes, ShapesDataset  # noqa: F401


def get_dataset(
    dataset_name: str,
    dataset_dir: str = "data",
    grayscale: bool = False,
    patch_size: int = 224,
    keep_in_mem: bool = False,
):
    name = dataset_name.lower()

    if name == "shapes":
        return SHAPES(patch_size, grayscale=grayscale)

    if name in ("shapes-device", "shapes_device"):
        # TPU-first extra (not a reference name): SHAPES with the whole
        # input pipeline generated under jit on the accelerator
        from segtpu.data.shapes import SHAPES_DEVICE
        return SHAPES_DEVICE(patch_size, grayscale=grayscale)

    if name == "dsb2018":
        from segtpu.data.dsb2018 import DSB2018Sliced
        return DSB2018Sliced(dataset_dir, grayscale, patch_size)

    if name == "inria":
        from segtpu.data.inria import INRIA
        return INRIA(dataset_dir, grayscale, patch_size, keep_in_mem)

    if name == "inria-small":
        from segtpu.data.inria import INRIA
        return INRIA(dataset_dir, grayscale, patch_size, keep_in_mem, small=True)

    if name == "inria-1024":
        if patch_size != 1024:
            raise ValueError("Patch size must be 1024")
        from segtpu.data.inria import INRIASliced
        return INRIASliced(dataset_dir, grayscale)

    if name == "inria-512":
        if patch_size != 512:
            raise ValueError("Patch size must be 512")
        from segtpu.data.inria import INRIASliced
        return INRIASliced(dataset_dir, grayscale)

    raise ValueError(dataset_name)
