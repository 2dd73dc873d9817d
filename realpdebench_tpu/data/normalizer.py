"""Data normalizers: identity / gaussian (per-channel z-score) / range.

Reference semantics: `realpdebench/data/data_normalizer.py`. Statistics are
streamed once over the *numerical* training set and cached next to the data
(`mean_std.pt` / `max.pt`; we cache `.npz` and can also read the reference's
`.pt` caches). The Gaussian accumulation reproduces the reference's pooled
formula exactly (per-batch spatial means summed over samples; per-batch
variances weighted by batch size — data_normalizer.py:64-95) so cached stats
are interchangeable with the reference's.

Normalization itself is a pure jnp op applied *inside* the jitted train/eval
step — stats are small per-channel arrays that live on device, and XLA fuses
the affine transform into adjacent ops. Channel-sliced apply (`[..., :c]`)
lets a 3-channel stats vector normalize 2-channel targets, matching
`data_normalizer.py:50-55`.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


class IdentityNormalizer:
    """No-op (reference data_normalizer.py:6-17)."""

    def preprocess(self, x, y):
        return x, y

    def postprocess(self, x, y):
        return x, y


class _StatsNormalizer:
    cache_name = None

    def __init__(self, dataset=None, batch_size: int = 512, is_save: bool = True,
                 stats: dict | None = None, cache_dir: str | None = None):
        if stats is not None:
            self._set_stats(**stats)
            return
        cache_dir = cache_dir or dataset.dataset_dir
        npz_path = os.path.join(cache_dir, self.cache_name + ".npz")
        pt_path = os.path.join(cache_dir, self.cache_name + ".pt")
        if is_save and os.path.exists(npz_path):
            data = np.load(npz_path)
            self._set_stats(**{k: data[k] for k in data.files})
        elif is_save and os.path.exists(pt_path):
            self._set_stats(**self._load_pt(pt_path))
        else:
            stats = self._compute(dataset, batch_size)
            self._set_stats(**stats)
            if is_save:
                np.savez(npz_path, **stats)

    # -- subclass hooks --
    def _set_stats(self, **kw):
        raise NotImplementedError

    def _compute(self, dataset, batch_size):
        raise NotImplementedError

    def _load_pt(self, path):
        raise NotImplementedError

    @staticmethod
    def _iter_batches(dataset, batch_size):
        n = len(dataset)
        for s in range(0, n, batch_size):
            items = [dataset[i] for i in range(s, min(s + batch_size, n))]
            xs = np.stack([it[0] for it in items])
            ys = np.stack([it[1] for it in items])
            yield xs, ys


class GaussianNormalizer(_StatsNormalizer):
    """Per-channel z-score (reference data_normalizer.py:20-95)."""

    cache_name = "mean_std"

    def _set_stats(self, mean_inputs, mean_targets, std_inputs, std_targets):
        std_inputs = np.where(std_inputs == 0, 1.0, std_inputs)
        std_targets = np.where(std_targets == 0, 1.0, std_targets)
        self.mean_inputs = jnp.asarray(mean_inputs, jnp.float32)
        self.mean_targets = jnp.asarray(mean_targets, jnp.float32)
        self.std_inputs = jnp.asarray(std_inputs, jnp.float32)
        self.std_targets = jnp.asarray(std_targets, jnp.float32)

    def _load_pt(self, path):
        import torch

        mi, mt, si, st = torch.load(path, map_location="cpu", weights_only=False)
        return dict(
            mean_inputs=mi.numpy(), mean_targets=mt.numpy(),
            std_inputs=si.numpy(), std_targets=st.numpy(),
        )

    def _compute(self, dataset, batch_size):
        n_samples = 0
        mean_i = mean_t = 0.0
        var_i = var_t = 0.0
        for xs, ys in self._iter_batches(dataset, batch_size):
            b, c1, c2 = xs.shape[0], xs.shape[-1], ys.shape[-1]
            xf = xs.reshape(b, -1, c1).astype(np.float64)
            yf = ys.reshape(b, -1, c2).astype(np.float64)
            # per-sample spatial mean summed over samples; pooled biased var
            mean_i = mean_i + xf.mean(axis=1).sum(0)
            var_i = var_i + xf.var(axis=(0, 1)) * b
            mean_t = mean_t + yf.mean(axis=1).sum(0)
            var_t = var_t + yf.var(axis=(0, 1)) * b
            n_samples += b
        return dict(
            mean_inputs=(mean_i / n_samples).astype(np.float32),
            mean_targets=(mean_t / n_samples).astype(np.float32),
            std_inputs=np.sqrt(var_i / n_samples).astype(np.float32),
            std_targets=np.sqrt(var_t / n_samples).astype(np.float32),
        )

    def preprocess(self, x, y):
        c1, c2 = x.shape[-1], y.shape[-1]
        x = (x - self.mean_inputs[..., :c1]) / self.std_inputs[..., :c1]
        y = (y - self.mean_targets[..., :c2]) / self.std_targets[..., :c2]
        return x, y

    def postprocess(self, x, y):
        c1, c2 = x.shape[-1], y.shape[-1]
        x = x * self.std_inputs[..., :c1] + self.mean_inputs[..., :c1]
        y = y * self.std_targets[..., :c2] + self.mean_targets[..., :c2]
        return x, y


class RangeNormalizer(_StatsNormalizer):
    """Per-channel abs-max scaling (reference data_normalizer.py:98-151)."""

    cache_name = "max"

    def _set_stats(self, max_inputs, max_targets):
        max_inputs = np.where(max_inputs == 0, 1.0, max_inputs)
        max_targets = np.where(max_targets == 0, 1.0, max_targets)
        self.max_inputs = jnp.asarray(max_inputs, jnp.float32)
        self.max_targets = jnp.asarray(max_targets, jnp.float32)

    def _load_pt(self, path):
        import torch

        mi, mt = torch.load(path, map_location="cpu", weights_only=False)
        return dict(max_inputs=mi.numpy(), max_targets=mt.numpy())

    def _compute(self, dataset, batch_size):
        max_i = max_t = None
        for xs, ys in self._iter_batches(dataset, batch_size):
            bi = np.abs(xs.reshape(-1, xs.shape[-1])).max(axis=0)
            bt = np.abs(ys.reshape(-1, ys.shape[-1])).max(axis=0)
            max_i = bi if max_i is None else np.maximum(max_i, bi)
            max_t = bt if max_t is None else np.maximum(max_t, bt)
        return dict(max_inputs=max_i.astype(np.float32),
                    max_targets=max_t.astype(np.float32))

    def preprocess(self, x, y):
        c1, c2 = x.shape[-1], y.shape[-1]
        return x / self.max_inputs[..., :c1], y / self.max_targets[..., :c2]

    def postprocess(self, x, y):
        c1, c2 = x.shape[-1], y.shape[-1]
        return x * self.max_inputs[..., :c1], y * self.max_targets[..., :c2]


def build_normalizer(name: str, dataset=None, **kw):
    """Factory matching the reference dispatch (train.py:276-283)."""
    if name == "none":
        return IdentityNormalizer()
    if name == "gaussian":
        return GaussianNormalizer(dataset, **kw)
    if name == "range":
        return RangeNormalizer(dataset, **kw)
    raise ValueError(f"Normalizer {name} not supported")
