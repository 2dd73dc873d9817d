"""Device mesh + sharding: the TPU-native "distributed backend".

The reference is single-device (`realpdebench/train.py:63` picks one
`cuda:{gpu}`); this module is the new idiomatic replacement. Design:

  * A 2-D logical mesh ``(dp, mp)``:
      - ``dp`` (data parallel): the batch axis of every training/eval array is
        sharded here. Gradient reduction is an XLA ``psum`` riding ICI,
        inserted automatically by GSPMD from the sharding annotations.
      - ``mp`` (model parallel): hidden/channel axes of large models may be
        sharded here (e.g. FNO spectral-weight out-channels). Defaults to 1.
  * Multi-host: ``jax.distributed.initialize()`` + per-process data sharding
    keyed on ``jax.process_index()`` (see data/loader.py).

Everything downstream asks this module for shardings instead of touching
devices directly, so single-chip, 8-chip, and multi-host runs share one code
path (single-device mesh is just dp=1).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
MODEL_AXIS = "mp"


def parse_mesh_shape(spec: Optional[str], n_devices: Optional[int] = None):
    """Parse ``'dp=4,mp=2'`` into an ordered dict of axis sizes.

    ``None``/empty → all available devices on the data axis. A ``-1`` size is
    inferred from the device count (at most one ``-1``).
    """
    if n_devices is None:
        n_devices = jax.device_count()
    if not spec:
        return {DATA_AXIS: n_devices, MODEL_AXIS: 1}
    axes = {}
    for part in spec.split(","):
        name, _, size = part.partition("=")
        axes[name.strip()] = int(size)
    unknown = [k for k, v in axes.items() if v == -1]
    if len(unknown) > 1:
        raise ValueError(f"At most one -1 axis allowed in mesh spec {spec!r}")
    if unknown:
        known = int(np.prod([v for v in axes.values() if v != -1]))
        axes[unknown[0]] = n_devices // known
    total = int(np.prod(list(axes.values())))
    if total > n_devices:
        raise ValueError(
            f"Mesh spec {spec!r} uses {total} devices but {n_devices} available"
        )
    axes.setdefault(DATA_AXIS, 1)
    axes.setdefault(MODEL_AXIS, 1)
    return axes


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """A mesh plus the standard shardings the framework uses."""

    mesh: Mesh

    @property
    def dp_size(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def mp_size(self) -> int:
        return self.mesh.shape.get(MODEL_AXIS, 1)

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def batch_sharding(self) -> NamedSharding:
        """Shard leading (batch) axis over dp; everything else replicated."""
        return self.sharding(DATA_AXIS)

    @property
    def replicated(self) -> NamedSharding:
        return self.sharding()

    def shard_batch_spec(self, ndim: int) -> P:
        return P(DATA_AXIS, *([None] * (ndim - 1)))

    def pad_batch(self, n: int) -> int:
        """Round a global batch size up to a multiple of dp (static shapes)."""
        dp = self.dp_size
        return ((n + dp - 1) // dp) * dp


def make_mesh_context(
    mesh_shape: Optional[str] = None,
    devices=None,
) -> MeshContext:
    """Build the global mesh. ``devices`` defaults to all of them, laid out so
    that the dp axis maps to contiguous devices (ICI-adjacent on a slice)."""
    if devices is None:
        devices = jax.devices()
    axes = parse_mesh_shape(mesh_shape, n_devices=len(devices))
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    total = int(np.prod(shape))
    # a mesh smaller than the device count uses the leading devices
    dev_array = np.asarray(devices[:total]).reshape(shape)
    return MeshContext(mesh=Mesh(dev_array, names))


def maybe_initialize_distributed():
    """Multi-host init. Safe to call on single-host (no coordinator → no-op)."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        try:
            jax.distributed.initialize()
        except Exception:  # already initialized or single-process
            pass


def assemble_from_process_local(x, mesh_ctx: MeshContext):
    """Assemble a per-process batch slice into the logical global array.

    No-op on single-process. ``x`` is this host's ``1/process_count`` slice
    of a global batch (``DataLoader(process_shard=True)``); the result is a
    global jax.Array sharded batch-over-dp on the mesh, built without any
    cross-host transfer."""
    if jax.process_count() == 1:
        return x
    s = mesh_ctx.batch_sharding
    spec = P(*(s.spec + (None,) * (getattr(x, "ndim", 0) - len(s.spec))))
    return jax.make_array_from_process_local_data(
        NamedSharding(s.mesh, spec), x)


def allgather_to_host(a):
    """Gather a (possibly non-addressable) global array to full numpy on
    every host. No-op on single-process."""
    if jax.process_count() == 1:
        return np.asarray(a)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(a, tiled=True))


def local_batch_slice(global_batch: int) -> slice:
    """The slice of the global batch this host is responsible for loading."""
    n_proc = jax.process_count()
    idx = jax.process_index()
    per = global_batch // n_proc
    return slice(idx * per, (idx + 1) * per)
