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
        process_shard: bool = False,
        process_count: Optional[int] = None,
        process_index: Optional[int] = None,
    ):
        """``batch_size`` is the GLOBAL batch. With ``process_shard`` on a
        multi-host run, each process loads only its `jax.process_index()`
        slice of every batch (same permutation everywhere — the seed is
        shared); `core.prefetch.prefetch_to_device` assembles the local
        slices into global arrays with
        `jax.make_array_from_process_local_data`. Single-process runs are
        unaffected. ``process_count``/``process_index`` override the jax
        runtime values (tests, dry runs)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.pad_last = pad_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0
        import jax

        if process_shard:
            self._n_proc = (process_count if process_count is not None
                            else jax.process_count())
            self._proc = (process_index if process_index is not None
                          else jax.process_index())
        else:
            self._n_proc, self._proc = 1, 0
        if process_shard and batch_size % self._n_proc:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{self._n_proc} processes"
            )

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
        per = bs // self._n_proc
        for s in range(0, stop, bs):
            batch_idx = idx[s : s + bs]
            n_valid = len(batch_idx)
            if self.pad_last and n_valid < bs:
                # pad at the INDEX level so padding composes with
                # process_shard: the padded global batch is always exactly
                # `bs`, so each process slice is exactly `per`. The mask is
                # GLOBAL-sized (padding sits at the end of the global batch;
                # callers drop `mask.sum()` tail rows after any gather).
                batch_idx = np.concatenate(
                    [batch_idx, np.repeat(batch_idx[-1:], bs - n_valid)])
            elif not self.pad_last and self._n_proc > 1 and n_valid < bs:
                raise ValueError(
                    "process_shard with drop_last=False needs pad_last=True "
                    "to keep the final partial batch evenly divisible across "
                    f"processes (got {n_valid} rows for {self._n_proc} "
                    "processes)")
            if self._n_proc > 1:
                batch_idx = batch_idx[self._proc * per : (self._proc + 1) * per]
            xs, ys = self._fetch(batch_idx)
            if self.pad_last:
                mask = np.zeros(bs, np.float32)
                mask[:n_valid] = 1.0
                yield xs, ys, mask
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
