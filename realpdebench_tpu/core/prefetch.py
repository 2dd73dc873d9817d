"""Host→device prefetch: double-buffered, sharding-aware.

The reference relies on torch DataLoader pin_memory + implicit `.to(device)`
(`realpdebench/train.py:269-272`). TPU-native equivalent: while step N runs on
device, the batch for step N+1 is already being transferred — `jax.device_put`
with a `NamedSharding` places each host's slice directly onto its local chips.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Iterable, Iterator

import jax


def prefetch_to_device(iterator: Iterable, sharding, size: int = 2,
                       process_sharded: bool = False) -> Iterator:
    """Yield elements of ``iterator`` as device arrays, ``size`` steps ahead.

    Each element is a pytree of numpy arrays; every leaf is placed with the
    same ``sharding`` pattern applied to its leading (batch) axis.

    ``process_sharded`` must be True iff the iterator yields per-process
    slices of a global batch (``DataLoader(process_shard=True)``); the slices
    are then assembled into logical global arrays with
    ``jax.make_array_from_process_local_data``. A loader that yields full
    global batches keeps the plain ``device_put`` path regardless of
    process count.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    multi_process = process_sharded and jax.process_count() > 1

    def put(batch):
        def _place(x):
            if hasattr(sharding, "mesh"):
                ndim = getattr(x, "ndim", 0)
                spec = P(*(sharding.spec + (None,) * (ndim - len(sharding.spec))))
                s = NamedSharding(sharding.mesh, spec)
            else:
                s = sharding
            if multi_process:
                # each host holds only its 1/process_count slice of the
                # global batch (DataLoader(process_shard=True)); assemble the
                # logical global array without any cross-host transfer
                return jax.make_array_from_process_local_data(s, x)
            return jax.device_put(x, s)

        return jax.tree_util.tree_map(_place, batch)

    buf = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out


class BackgroundGenerator:
    """Run a (host-side, IO-bound) iterator in a daemon thread with a bounded
    queue — the TPU-native stand-in for DataLoader worker processes. HDF5/Arrow
    reads release the GIL, so a thread is enough on the host."""

    _END = object()

    def __init__(self, iterable, max_prefetch: int = 4):
        self.queue: queue.Queue = queue.Queue(max_prefetch)
        self.iterable = iterable
        self.exc = None
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        try:
            for item in self.iterable:
                self.queue.put(item)
        except BaseException as e:  # surface worker errors to the consumer
            self.exc = e
        finally:
            self.queue.put(self._END)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.queue.get()
        if item is self._END:
            if self.exc is not None:
                raise self.exc
            raise StopIteration
        return item
