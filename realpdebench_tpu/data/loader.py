"""Host batch pipeline: index sampling → threaded item reads → stacked numpy
batches → (optionally) sharded device prefetch.

Replaces torch ``DataLoader(num_workers=N, pin_memory=True)``
(`realpdebench/train.py:269-272`) with a TPU-idiomatic design:

  * shuffling / batching over indices is a plain numpy permutation;
  * item reads (HDF5/Arrow slabs — GIL-releasing IO) run in a thread pool;
  * the assembled batch is handed to `core.prefetch.prefetch_to_device`,
    which double-buffers `jax.device_put` onto a `NamedSharding` so the
    host→device copy of batch N+1 overlaps step N;
  * multi-host: each process samples only its `process_index` slice of the
    global batch (`core.mesh.local_batch_slice`).

Static shapes: the final partial batch is dropped in train mode (infinite
cycling makes this harmless) and padded in eval mode (with a mask) so every
step compiles once.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from realpdebench_tpu.core.prefetch import BackgroundGenerator


class DataLoader:
    """Minimal epoch loader over a map-style dataset returning numpy pairs."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 0,
        seed: int = 0,
        drop_last: bool = False,
        pad_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.pad_last = pad_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = self._rng.permutation(n)
        return idx

    def _fetch(self, indices):
        if self.num_workers > 0:
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                items = list(pool.map(self.dataset.__getitem__, indices))
        else:
            items = [self.dataset[i] for i in indices]
        xs = np.stack([it[0] for it in items]).astype(np.float32)
        ys = np.stack([it[1] for it in items]).astype(np.float32)
        return xs, ys

    def __iter__(self) -> Iterator:
        idx = self._indices()
        self._epoch += 1
        bs = self.batch_size
        n = len(idx)
        stop = (n // bs) * bs if self.drop_last else n
        for s in range(0, stop, bs):
            batch_idx = idx[s : s + bs]
            xs, ys = self._fetch(batch_idx)
            if self.pad_last and len(batch_idx) < bs:
                pad = bs - len(batch_idx)
                mask = np.concatenate([np.ones(len(batch_idx)), np.zeros(pad)])
                xs = np.concatenate([xs, np.repeat(xs[-1:], pad, axis=0)])
                ys = np.concatenate([ys, np.repeat(ys[-1:], pad, axis=0)])
                yield xs, ys, mask.astype(np.float32)
            elif self.pad_last:
                yield xs, ys, np.ones(bs, np.float32)
            else:
                yield xs, ys


def cycle_loader(loader: DataLoader, background: bool = True):
    """Infinite batch stream (reference `cycle`, utils/utils.py:57-60), with
    the epoch iterator optionally staged in a background thread."""

    def gen():
        while True:
            for batch in loader:
                yield batch

    if background:
        return iter(BackgroundGenerator(gen(), max_prefetch=4))
    return gen()
