"""FNO3d — 3-D Fourier Neural Operator, the flagship baseline.

Functional parity with the reference (`realpdebench/model/fno.py:66-143`):
grid-coordinate channels appended, Dense lift, ``n_layers`` × (truncated
spectral conv + pointwise 1×1 mixing + BatchNorm + GELU[not last]), +6
end-padding on (T, H, W) for non-periodic domains, Dense 128 head, and the
time-interleaved output reshape ``[B,T_in,H,W,C_out·mult] → [B,T_out,H,W,C_out]``.

TPU-first differences from the torch implementation:
  * channels-last layout everywhere (no permutes): the pointwise mixing is a
    Dense on the lane dimension → straight MXU matmuls;
  * the 4 spectral corner blocks run in one batched complex einsum
    (ops/spectral.py);
  * optional bf16 activations with f32 FFT/params (``compute_dtype``);
  * optional model-parallel sharding of the ``width`` axis via logical axis
    annotations (see parallel notes in train/train_step.py).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from realpdebench_tpu.ops.activations import gelu as act_gelu

from realpdebench_tpu.ops.spectral import grid_features, truncated_spectral_conv3d


class SpectralConv3d(nn.Module):
    in_channels: int
    out_channels: int
    modes1: int
    modes2: int
    modes3: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (
            4,
            self.in_channels,
            self.out_channels,
            self.modes1,
            self.modes2,
            self.modes3,
        )
        # torch.rand on cfloat draws U[0,1) for real and imag independently
        # (fno.py:31-38); mirror that init.
        w_real = self.param(
            "w_real", lambda k: scale * jnp.asarray(
                nn.initializers.uniform(scale=1.0)(k, shape, jnp.float32)
            )
        )
        w_imag = self.param(
            "w_imag", lambda k: scale * jnp.asarray(
                nn.initializers.uniform(scale=1.0)(k, shape, jnp.float32)
            )
        )
        return truncated_spectral_conv3d(
            x, w_real, w_imag, compute_dtype=self.compute_dtype
        )


class FNOLayer(nn.Module):
    """One Fourier layer: spectral conv + pointwise mixing + BN (+GELU).

    Rematerialized by default: the rfftn/irfftn intermediates dominate
    activation memory (complex64 full spectra per layer); recomputing them in
    the backward pass keeps peak HBM ~one layer deep instead of n_layers."""

    width: int
    modes1: int
    modes2: int
    modes3: int
    apply_gelu: bool
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype
        x1 = SpectralConv3d(
            self.width, self.width, self.modes1, self.modes2, self.modes3,
            compute_dtype=dt, name="spectral",
        )(x)
        x2 = nn.Dense(self.width, name="pointwise", dtype=dt)(x)
        x = x1.astype(dt) + x2.astype(dt)
        # running stats stay f32; normalization math follows compute_dtype
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=dt, name="bn",
        )(x)
        if self.apply_gelu:
            x = act_gelu(x)
        return x


class FNO3d(nn.Module):
    modes1: int
    modes2: int
    modes3: int
    n_layers: int
    width: int
    shape_in: Sequence[int]  # (T_in, H, W, C_in)
    shape_out: Sequence[int]  # (T_out, H, W, C_out)
    padding: int = 6
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        T, H, W = x.shape[1], x.shape[2], x.shape[3]
        t_in, c_out, t_out = self.shape_in[0], self.shape_out[-1], self.shape_out[0]
        mult = t_out // t_in

        gt, gy, gx = grid_features((T, H, W))
        grid = jnp.broadcast_to(
            jnp.concatenate([gt, gy, gx], axis=-1)[None], (B, T, H, W, 3)
        )
        x = jnp.concatenate([x.astype(jnp.float32), grid], axis=-1)

        dt = self.compute_dtype
        x = nn.Dense(self.width, name="fc0", dtype=dt)(x)
        # end-pad (T, H, W) for non-periodic domains (fno.py:111)
        p = self.padding
        x = jnp.pad(x, ((0, 0), (0, p), (0, p), (0, p), (0, 0)))

        layer_cls = (
            nn.remat(FNOLayer, static_argnums=(2,)) if self.remat else FNOLayer
        )
        for i in range(self.n_layers):
            x = layer_cls(
                self.width, self.modes1, self.modes2, self.modes3,
                apply_gelu=i < self.n_layers - 1, compute_dtype=dt,
                name=f"layer_{i}",
            )(x, train)

        x = x[:, :-p, :-p, :-p, :]
        x = nn.Dense(128, name="fc1", dtype=dt)(x)
        x = act_gelu(x)
        x = nn.Dense(c_out * mult, name="fc2", dtype=dt)(x)
        x = x.astype(jnp.float32)

        # [B,T,H,W,c_out*mult] -> [B,T,H,W,c_out,mult] -> [B,T,mult,H,W,c_out]
        x = x.reshape(B, T, H, W, c_out, mult)
        x = jnp.transpose(x, (0, 1, 5, 2, 3, 4))
        return x.reshape(B, t_out, H, W, c_out)
