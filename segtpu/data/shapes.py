"""SHAPES synthetic dataset (reference lib/datasets/shapes.py:10-69).

Random filled ellipse on a random dark background plus salt noise; the
designed zero-data smoke vehicle for the whole pipeline. Registered as
``shapes`` with 1024 train / 128 val steps and 1 class.

Two generators:
  * :func:`gen_random_image` — host NumPy, mirrors the reference's sampling
    ranges (background 0-100, object brighter than background, radii 10-56,
    salt density U(0, 0.1)).
  * :class:`DeviceShapes` — fully on-device batched generation under jit
    (TPU-first: the input pipeline can never starve the chip), used by the
    benchmark path.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def gen_random_image(patch_size: int, rng: np.random.RandomState):
    """One (image uint8 HWC, mask uint8 HW) sample, reference sampling ranges."""
    img = np.zeros((patch_size, patch_size, 3), dtype=np.uint8)
    mask = np.zeros((patch_size, patch_size), dtype=np.uint8)

    dark = rng.randint(0, 101, size=3)
    img[:, :] = dark

    light = np.array([rng.randint(d + 1, 256) for d in dark], dtype=np.uint8)
    cx = rng.randint(0, patch_size + 1)
    cy = rng.randint(0, patch_size + 1)
    r1 = rng.randint(10, 57)
    r2 = rng.randint(10, 57)

    yy, xx = np.mgrid[0:patch_size, 0:patch_size]
    inside = ((xx - cx) / r1) ** 2 + ((yy - cy) / r2) ** 2 <= 1.0
    img[inside] = light
    mask[inside] = 1

    density = rng.uniform(0, 0.1)
    salt = rng.rand(patch_size, patch_size) < density
    img[salt] = rng.randint(0, 256, size=(int(salt.sum()), 3))
    return img, mask


# ImageNet stats — the reference's NormalizeImage defaults
# (lib/augmentations.py:452-460), applied to SHAPES via
# ImageOnly(NormalizeImage()) (lib/datasets/shapes.py:48).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

# Grayscale variants: BT.601 luma weights; channel-mean ImageNet stats.
# (The reference SHAPES has no grayscale path at all — its -g flag crashes
# on this dataset upstream; supporting it here is a conscious capability fix.)
GRAY_WEIGHTS = np.array([0.299, 0.587, 0.114], dtype=np.float32)
IMAGENET_GRAY_MEAN = float(IMAGENET_MEAN.mean())
IMAGENET_GRAY_STD = float(IMAGENET_STD.mean())


class ShapesDataset:
    """Map-style dataset: index -> (image float32 HWC, mask HW1).

    Images are scaled 1/255 then ImageNet mean/std normalized, matching the
    reference SHAPES pipeline. Per-epoch determinism: sample ``i`` of epoch
    ``e`` is keyed by ``seed + e * steps + i`` so shuffling/resume reproduce
    exactly.
    """

    def __init__(self, steps: int, patch_size: int, seed: int = 0,
                 normalize: bool = True, grayscale: bool = False):
        self.steps = steps
        self.patch_size = patch_size
        self.seed = seed
        self.normalize = normalize
        self.grayscale = grayscale
        self.epoch = 0

    def __len__(self):
        return self.steps

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        rng = np.random.RandomState(self.seed + self.epoch * self.steps + i)
        img, mask = gen_random_image(self.patch_size, rng)
        x = img.astype(np.float32)
        if self.grayscale:
            x = (x @ GRAY_WEIGHTS)[..., None]
            if self.normalize:
                x = (x / 255.0 - IMAGENET_GRAY_MEAN) / IMAGENET_GRAY_STD
        elif self.normalize:
            x = (x / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        y = mask.astype(np.float32)[..., None]
        return x, y


class DeviceShapes:
    """Batched on-device shapes generation — jit-compiled, feeds the TPU
    directly with zero host->device transfer (beyond the PRNG key)."""

    def __init__(self, patch_size: int, normalize: bool = True):
        self.patch_size = patch_size
        self.normalize = normalize
        self._gen = jax.jit(self._gen_batch, static_argnums=(1,))

    def _gen_one(self, key):
        p = self.patch_size
        k = jax.random.split(key, 8)
        dark = jax.random.randint(k[0], (3,), 0, 101)
        light = dark + 1 + (
            jax.random.uniform(k[1], (3,)) * (255 - dark).astype(jnp.float32)
        ).astype(jnp.int32)
        cx = jax.random.randint(k[2], (), 0, p + 1).astype(jnp.float32)
        cy = jax.random.randint(k[3], (), 0, p + 1).astype(jnp.float32)
        r1 = jax.random.randint(k[4], (), 10, 57).astype(jnp.float32)
        r2 = jax.random.randint(k[5], (), 10, 57).astype(jnp.float32)

        yy = jnp.arange(p, dtype=jnp.float32)[:, None]
        xx = jnp.arange(p, dtype=jnp.float32)[None, :]
        inside = ((xx - cx) / r1) ** 2 + ((yy - cy) / r2) ** 2 <= 1.0

        img = jnp.where(
            inside[..., None], light[None, None, :], dark[None, None, :]
        ).astype(jnp.float32)

        density = jax.random.uniform(k[6], ()) * 0.1
        salt = jax.random.uniform(k[7], (p, p)) < density
        noise = jax.random.randint(jax.random.fold_in(key, 99), (p, p, 3), 0, 256)
        img = jnp.where(salt[..., None], noise.astype(jnp.float32), img)

        mask = inside.astype(jnp.float32)[..., None]
        if self.normalize:
            img = (img / 255.0 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return img, mask

    def _gen_batch(self, key, batch_size: int):
        keys = jax.random.split(key, batch_size)
        return jax.vmap(self._gen_one)(keys)

    def batch(self, key, batch_size: int):
        return self._gen(key, batch_size)


def SHAPES(patch_size: int, seed: int = 0, grayscale: bool = False):
    """Factory: (train_ds, valid_ds, num_classes) — 1024/128 steps, 1 class
    (reference lib/datasets/shapes.py:62-69)."""
    return (
        ShapesDataset(1024, patch_size, seed=seed, grayscale=grayscale),
        ShapesDataset(128, patch_size, seed=seed + 1_000_000,
                      grayscale=grayscale),
        1,
    )
