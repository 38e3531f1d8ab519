"""Host input pipeline: threaded batch assembly + double-buffered device feed.

The reference hides CPU augmentation cost in DataLoader worker *processes*
(reference torch_train.py:384-385). Here the per-sample work is NumPy in a
thread pool (no pickling/fork overhead), and batches are staged onto the
device asynchronously so the TPU never waits on the host (SURVEY.md §7
"Input pipeline throughput").
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
from typing import Iterator

import numpy as np

import jax


class DataLoader:
    """Map-style dataset -> iterator of stacked numpy (x, y) batches.

    Matches the reference loader semantics: ``shuffle`` train / ordered val,
    ``drop_last=True`` (torch_train.py:384-385). ``workers`` threads prefetch
    samples ahead of the consumer.

    ``sample_seed`` (seeded training): bind a stateless per-sample RNG
    around each ``__getitem__`` — ``Random(h(sample_seed, epoch, index))``,
    segtpu.augment.host.bind_sample_rng — so host-augmentation draws depend
    only on (seed, epoch, dataset index), never on prefetch thread timing or
    worker count. Two same-seed runs are bit-identical at ANY ``workers``
    (tests/test_cli_e2e.py::test_train_cli_seed_determinism).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        workers: int = 4,
        seed: int = 0,
        prefetch_batches: int = 4,
        process_index: int = None,
        process_count: int = None,
        sample_seed: int = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.workers = max(1, workers)
        self.seed = seed
        self.prefetch_batches = prefetch_batches
        self.sample_seed = sample_seed
        self.epoch = 0
        # Multi-host: every process iterates the SAME seeded global index
        # order but materializes only its contiguous slice of each global
        # batch; segtpu.parallel.put_global reassembles the global array
        # (process p's devices are contiguous along the mesh data axis, so
        # slice p of the batch lands on process p's shard).
        self.process_index = (jax.process_index() if process_index is None
                              else process_index)
        self.process_count = (jax.process_count() if process_count is None
                              else process_count)
        if self.batch_size % self.process_count != 0:
            raise ValueError(
                f"global batch {self.batch_size} not divisible by "
                f"{self.process_count} processes")
        self.local_batch_size = self.batch_size // self.process_count

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _index_order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            return rng.permutation(n)
        return np.arange(n)

    def _fetch(self, epoch: int, i: int):
        if self.sample_seed is None:
            return self.dataset[i]
        from segtpu.augment.host import bind_sample_rng
        with bind_sample_rng(self.sample_seed, epoch, i):
            return self.dataset[i]

    def __iter__(self) -> Iterator:
        order = self._index_order()
        epoch = self.epoch
        n_batches = len(self)
        ex = cf.ThreadPoolExecutor(max_workers=self.workers)
        try:
            pending: collections.deque = collections.deque()

            def submit(b):
                start = b * self.batch_size + self.process_index * self.local_batch_size
                idxs = order[start:start + self.local_batch_size]
                futs = [ex.submit(self._fetch, epoch, int(i)) for i in idxs]
                pending.append(futs)

            warm = min(self.prefetch_batches, n_batches)
            for b in range(warm):
                submit(b)
            for b in range(n_batches):
                futs = pending.popleft()
                if b + warm < n_batches:
                    submit(b + warm)
                samples = [f.result() for f in futs]
                xs = np.stack([s[0] for s in samples])
                ys = np.stack([s[1] for s in samples])
                yield xs, ys
        finally:
            ex.shutdown(wait=False, cancel_futures=True)


class Subset:
    """First-``n`` view of a map-style dataset (used by the harness ``-s``
    steps-per-epoch cap)."""

    def __init__(self, dataset, n: int):
        self.dataset = dataset
        self.n = min(n, len(dataset))

    def __len__(self):
        return self.n

    def set_epoch(self, epoch: int):
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __getitem__(self, i):
        return self.dataset[i]


def prefetch_to_device(iterator, sharding=None, size: int = 2):
    """Double-buffer host batches onto the device.

    Stages ``size`` batches ahead (sharded if a sharding is given) so the
    host->HBM copy of batch N+1 overlaps the compute of batch N. In a
    multi-process run the iterator must yield per-process shards;
    ``segtpu.parallel.put_global`` assembles the global arrays.
    """
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            from segtpu.parallel import put_global
            return put_global(batch, sharding)
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
