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


class DeviceShapesSet:
    """Device-resident SHAPES, registered as ``shapes-device``.

    The whole input pipeline is a jitted generator on the accelerator —
    zero host work per batch beyond a PRNG-key fold, so the chip can never
    starve on input (SURVEY.md §7 "Input pipeline throughput"; the
    reference instead hides CPU augmentation cost in DataLoader worker
    processes, torch_train.py:384-385 — on a slow host that path gates the
    step rate). Sample semantics mirror the host ``shapes`` registry entry
    (1024 train / 128 val, reference lib/datasets/shapes.py:62-69): train
    samples are keyed by (seed, epoch, step) — fresh every epoch like the
    host path — while the val set ignores the epoch so every epoch
    evaluates the same samples.
    """

    def __init__(self, n: int, patch_size: int, seed: int = 0,
                 fixed: bool = False, grayscale: bool = False):
        self.n = n
        self.patch_size = patch_size
        self.seed = seed
        self.fixed = fixed
        self.grayscale = grayscale

    def __len__(self):
        return self.n

    @property
    def num_channels(self) -> int:
        return 1 if self.grayscale else 3

    def take(self, n: int) -> "DeviceShapesSet":
        """A copy truncated to ``n`` samples (the `-s` step-cap analogue of
        ``pipeline.Subset``)."""
        return DeviceShapesSet(min(self.n, n), self.patch_size,
                               seed=self.seed, fixed=self.fixed,
                               grayscale=self.grayscale)

    def loader(self, batch_size: int):
        return DeviceShapesLoader(self, batch_size)


class DeviceShapesLoader:
    """Loader-interface adapter over :class:`DeviceShapes`.

    Quacks like :class:`segtpu.data.pipeline.DataLoader` (``__len__`` /
    ``set_epoch`` / iteration, ``drop_last`` semantics) but yields
    device-resident batches; ``prefetch_to_device`` passes them through
    (``device_put`` of a ``jax.Array`` under the mesh sharding is a cheap
    on-device reshard, no host copy)."""

    def __init__(self, spec: DeviceShapesSet, batch_size: int):
        if jax.process_count() > 1:
            raise NotImplementedError(
                "shapes-device generates global batches on one process; "
                "use the host `shapes` loader for multi-host runs")
        self.spec = spec
        self.batch_size = batch_size
        self.epoch = 0
        gen = DeviceShapes(spec.patch_size, normalize=not spec.grayscale)
        if spec.grayscale:
            # match the host path's order: luma from raw 0-255 RGB, then
            # grayscale ImageNet normalization (ShapesDataset.__getitem__)
            def gray_batch(key, b):
                x, y = gen._gen_batch(key, b)
                x = (x @ jnp.asarray(GRAY_WEIGHTS))[..., None]
                x = (x / 255.0 - IMAGENET_GRAY_MEAN) / IMAGENET_GRAY_STD
                return x, y

            self._batch = jax.jit(gray_batch, static_argnums=(1,))
        else:
            self._batch = gen.batch

    def __len__(self):
        return self.spec.n // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = 0 if self.spec.fixed else epoch

    def __iter__(self):
        base = jax.random.fold_in(
            jax.random.PRNGKey(self.spec.seed), self.epoch)
        for i in range(len(self)):
            yield self._batch(jax.random.fold_in(base, i), self.batch_size)


def SHAPES(patch_size: int, seed: int = 0, grayscale: bool = False):
    """Factory: (train_ds, valid_ds, num_classes) — 1024/128 steps, 1 class
    (reference lib/datasets/shapes.py:62-69)."""
    return (
        ShapesDataset(1024, patch_size, seed=seed, grayscale=grayscale),
        ShapesDataset(128, patch_size, seed=seed + 1_000_000,
                      grayscale=grayscale),
        1,
    )


def SHAPES_DEVICE(patch_size: int, seed: int = 0, grayscale: bool = False):
    """Factory for ``shapes-device``: same split sizes/class count as
    :func:`SHAPES`, but the samples are generated under jit on the
    accelerator (fully host-free input pipeline)."""
    return (
        DeviceShapesSet(1024, patch_size, seed=seed, grayscale=grayscale),
        DeviceShapesSet(128, patch_size, seed=seed + 1_000_000, fixed=True,
                        grayscale=grayscale),
        1,
    )
