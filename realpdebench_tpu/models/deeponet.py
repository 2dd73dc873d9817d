"""DeepONet — branch-trunk operator network.

Functional parity with the reference (`realpdebench/model/deeponet.py:9-151`):
branch = 4-stage 3-D CNN (Conv k3 'same' + BN + ReLU + MaxPool 2, final stage
adaptive-avg-pool to (1,4,4)) → FC → p-vector; trunk = MLP on normalized
(t, y, x) query coordinates of the OUTPUT grid; output = MLP(branch ⊙ trunk)
per query point, reshaped to [B, T_out, H, W, C_out].

TPU notes: channels-last convs feed the MXU directly; the trunk grid is a
compile-time constant (static shapes) so XLA folds the coordinate tensor; the
branch's BatchNorm runs in f32.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from realpdebench_tpu.ops.spectral import grid_features


def adaptive_avg_pool3d(x, out_sizes):
    """torch AdaptiveAvgPool3d semantics over axes (1,2,3) of [B,T,H,W,C]:
    output bin i averages input[floor(i*n/o) : ceil((i+1)*n/o)]."""
    for axis, out in zip((1, 2, 3), out_sizes):
        n = x.shape[axis]
        if n == out:
            continue
        pieces = []
        for i in range(out):
            start = (i * n) // out
            end = -(-((i + 1) * n) // out)  # ceil
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(start, end)
            pieces.append(x[tuple(sl)].mean(axis=axis, keepdims=True))
        x = jnp.concatenate(pieces, axis=axis)
    return x


class BranchNet(nn.Module):
    p: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T, H, W, C]
        for feats in (32, 64, 128):
            x = nn.Conv(feats, kernel_size=(3, 3, 3), padding="SAME",
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.relu(x)
            # Clamp the pool window to the axis size: identical to a plain
            # 2×2×2 pool at reference shapes (all dims ≥ 2 here), but keeps
            # tiny debug shapes well-defined where torch's MaxPool3d(2)
            # would reduce a size-1 axis to size 0 and error.
            ws = tuple(min(2, s) for s in x.shape[1:4])
            x = nn.max_pool(x, window_shape=ws, strides=ws)
        x = nn.Conv(256, kernel_size=(3, 3, 3), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = adaptive_avg_pool3d(x, (1, 4, 4))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(512, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.p, dtype=self.dtype)(x)


class TrunkNet(nn.Module):
    p: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, coords):
        x = nn.relu(nn.Dense(64, dtype=self.dtype)(coords))
        x = nn.relu(nn.Dense(128, dtype=self.dtype)(x))
        return nn.Dense(self.p, dtype=self.dtype)(x)


class DeepONet(nn.Module):
    shape_in: Sequence[int]
    shape_out: Sequence[int]
    p: int
    dropout_rate: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T_in, H, W, C = x.shape
        T_out = self.shape_out[0]

        b = BranchNet(self.p, self.dropout_rate, dtype=self.compute_dtype,
                      name="branch")(x, train=train)

        gt, gy, gx = grid_features((T_out, H, W))
        coords = jnp.concatenate([gt, gy, gx], axis=-1).reshape(-1, 3)
        t = TrunkNet(self.p, dtype=self.compute_dtype,
                     name="trunk")(coords)  # [N, p]

        feat = b[:, None, :] * t[None, :, :]  # [B, N, p]
        out = nn.Dense(512, name="out_fc1", dtype=self.compute_dtype)(feat)
        out = nn.relu(out)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        out = nn.Dense(128, name="out_fc2", dtype=self.compute_dtype)(out)
        out = nn.relu(out)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        out = nn.Dense(self.shape_out[-1], name="out_fc3",
                       dtype=self.compute_dtype)(out)
        return out.astype(jnp.float32).reshape(B, T_out, H, W, -1)
