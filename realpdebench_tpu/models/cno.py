"""CNO3d — Convolutional Neural Operator.

Functional parity with the reference (`realpdebench/model/cno.py:28-528`):
lift/project LiftProjectBlocks, encoder (D) / decoder (U) CNOBlocks
(Conv3d k3 'same' + BN + activation), per-level ResidualBlocks + neck,
ED_expansion (I) skip-alignment blocks, optional decoder_inv blocks, and the
time-interleaving output reshape when out_dim_mult > 1 (cno.py:519-520).

Activation modes (cno.py:76-94):
  * 'LeakyReLU' — plain LeakyReLU(0.2); the shipped benchmark configs use
    this (`configs/*/cno.yaml` activation key), in which case no resampling
    happens anywhere and the network runs at constant resolution.
  * 'lrelu' — StyleGAN3-style filtered leaky ReLU with Kaiser-windowed
    up/down-sampling (vendored CUDA in the reference, `CNO_libs/`); the
    TPU-native equivalent lives in ops/filtered_lrelu.py.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class CNOActivation(nn.Module):
    """Dispatch between plain LeakyReLU and the filtered (anti-aliased)
    up/down-sampling activation."""

    activation: str
    in_size: int
    out_size: int
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    filter_size: int = 6
    lrelu_upsampling: int = 2

    @nn.compact
    def __call__(self, x):
        if self.activation == "LeakyReLU":
            return nn.leaky_relu(x, negative_slope=0.2)
        if self.activation == "lrelu":
            from realpdebench_tpu.ops.filtered_lrelu import filtered_lrelu_3d

            bias = self.param(
                "bias", nn.initializers.zeros, (x.shape[-1],)
            ).astype(x.dtype)  # learnable bias (filtered_networks.py:356)
            return filtered_lrelu_3d(
                x,
                in_size=self.in_size,
                out_size=self.out_size,
                in_cutoff=self.in_cutoff,
                out_cutoff=self.out_cutoff,
                in_half_width=self.in_half_width,
                out_half_width=self.out_half_width,
                filter_size=self.filter_size,
                lrelu_upsampling=self.lrelu_upsampling,
                bias=bias,
            )
        raise ValueError(f"Activation function {self.activation} not supported")


def _filter_props(size, cutoff_den, half_width_mult):
    cutoff = size / cutoff_den
    half_width = half_width_mult * size - size / cutoff_den
    return cutoff, half_width


class CNOBlock3d(nn.Module):
    out_channels: int
    in_size: int
    out_size: int
    cutoff_den: float = 2.0001
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    half_width_mult: float = 0.8
    batch_norm: bool = True
    activation: str = "cno_lrelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.conv_kernel,) * 3
        x = nn.Conv(self.out_channels, kernel_size=k, padding="SAME",
                    name="convolution", dtype=self.dtype)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn", dtype=self.dtype)(x)
        in_c, in_h = _filter_props(self.in_size, self.cutoff_den,
                                   self.half_width_mult)
        out_c, out_h = _filter_props(self.out_size, self.cutoff_den,
                                     self.half_width_mult)
        return CNOActivation(
            self.activation, self.in_size, self.out_size, in_c, out_c,
            in_h, out_h, self.filter_size, self.lrelu_upsampling,
            name="act",
        )(x)


class LiftProjectBlock3d(nn.Module):
    out_channels: int
    in_size: int
    out_size: int
    latent_dim: int = 64
    cutoff_den: float = 2.0001
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    half_width_mult: float = 0.8
    batch_norm: bool = True  # reference passes False for lift/project
    activation: str = "cno_lrelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = CNOBlock3d(
            self.latent_dim, self.in_size, self.out_size,
            cutoff_den=self.cutoff_den, conv_kernel=self.conv_kernel,
            filter_size=self.filter_size,
            lrelu_upsampling=self.lrelu_upsampling,
            half_width_mult=self.half_width_mult,
            batch_norm=self.batch_norm, activation=self.activation,
            dtype=self.dtype, name="inter",
        )(x, train=train)
        k = (self.conv_kernel,) * 3
        x = nn.Conv(self.out_channels, kernel_size=k, padding="SAME",
                    name="convolution", dtype=self.dtype)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn", dtype=self.dtype)(x)
        return x


class ResidualBlock3d(nn.Module):
    channels: int
    size: int
    cutoff_den: float = 2.0001
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    half_width_mult: float = 0.8
    batch_norm: bool = True
    activation: str = "cno_lrelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.conv_kernel,) * 3
        out = nn.Conv(self.channels, kernel_size=k, padding="SAME",
                      name="convolution1", dtype=self.dtype)(x)
        if self.batch_norm:
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name="bn1", dtype=self.dtype)(out)
        c, h = _filter_props(self.size, self.cutoff_den, self.half_width_mult)
        out = CNOActivation(
            self.activation, self.size, self.size, c, c, h, h,
            self.filter_size, self.lrelu_upsampling, name="act",
        )(out)
        out = nn.Conv(self.channels, kernel_size=k, padding="SAME",
                      name="convolution2", dtype=self.dtype)(out)
        if self.batch_norm:
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name="bn2", dtype=self.dtype)(out)
        return x + out.astype(x.dtype)


class CNO3d(nn.Module):
    in_dim: int
    in_size: int
    N_layers: int
    shape_in: Sequence[int]
    shape_out: Sequence[int]
    N_res: int = 1
    N_res_neck: int = 6
    channel_multiplier: int = 32
    conv_kernel: int = 3
    cutoff_den: float = 2.0001
    filter_size: int = 6
    lrelu_upsampling: int = 2
    half_width_mult: float = 0.8
    batch_norm: bool = True
    out_dim: int = 1
    out_dim_mult: int = 1
    out_size: int = 1
    latent_lift_proj_dim: int = 64
    add_inv: bool = True
    activation: str = "LeakyReLU"
    remat: bool = False  # rematerialize blocks: the filtered-lrelu path
    # holds 2x-upsampled intermediates; remat bounds activation memory to
    # ~one block so reference batch sizes fit a 16 GB chip
    compute_dtype: jnp.dtype = jnp.float32  # conv/BN math dtype; params and
    # running stats stay f32 (bf16 puts the 3x3x3 convs on the MXU)

    def _features(self):
        lift_dim = self.channel_multiplier // 2
        enc = [lift_dim] + [
            2**i * self.channel_multiplier for i in range(self.N_layers)
        ]
        dec_in = list(reversed(enc[1:]))
        dec_out = list(reversed(enc[:-1]))
        for i in range(1, self.N_layers):
            dec_in[i] = 2 * dec_in[i]
        inv = list(dec_in) + [enc[0] + dec_out[-1]]
        return enc, dec_in, dec_out, inv

    def _sizes(self):
        latent = self.in_size
        latent_out = latent if self.out_size == 1 else self.out_size
        enc_sizes = [latent // 2**i for i in range(self.N_layers + 1)]
        dec_sizes = [
            latent_out // 2 ** (self.N_layers - i)
            for i in range(self.N_layers + 1)
        ]
        return enc_sizes, dec_sizes

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T, H, W, C] channels-last (reference permutes; we stay native)
        enc_f, dec_in_f, dec_out_f, inv_f = self._features()
        enc_s, dec_s = self._sizes()
        if self.remat:
            # train is static arg 2 (module itself is arg 0 for nn.remat)
            RB = nn.remat(ResidualBlock3d, static_argnums=(2,))
            CB = nn.remat(CNOBlock3d, static_argnums=(2,))
            LP = nn.remat(LiftProjectBlock3d, static_argnums=(2,))
        else:
            RB, CB, LP = ResidualBlock3d, CNOBlock3d, LiftProjectBlock3d
        common = dict(
            cutoff_den=self.cutoff_den, conv_kernel=self.conv_kernel,
            filter_size=self.filter_size,
            lrelu_upsampling=self.lrelu_upsampling,
            half_width_mult=self.half_width_mult, activation=self.activation,
            dtype=self.compute_dtype,
        )

        x = LP(
            enc_f[0], self.in_size, enc_s[0],
            latent_dim=self.latent_lift_proj_dim, batch_norm=False,
            name="lift", **common,
        )(x, train)

        skip = []
        for i in range(self.N_layers):
            y = x
            for j in range(self.N_res):
                y = RB(
                    enc_f[i], enc_s[i], batch_norm=self.batch_norm,
                    name=f"res_{i}_{j}", **common,
                )(y, train)
            skip.append(y)
            x = CB(
                enc_f[i + 1], enc_s[i], enc_s[i + 1],
                batch_norm=self.batch_norm, name=f"encoder_{i}", **common,
            )(x, train)

        # bottleneck resnets applied in reference order res_nets[-j-1]
        # (cno.py:490-491): the LAST constructed block runs first
        for j in range(self.N_res_neck):
            x = RB(
                enc_f[self.N_layers], enc_s[self.N_layers],
                batch_norm=self.batch_norm,
                name=f"res_neck_{self.N_res_neck - 1 - j}", **common,
            )(x, train)

        for i in range(self.N_layers):
            if i == 0:
                x = CB(
                    enc_f[self.N_layers], enc_s[self.N_layers],
                    dec_s[0], batch_norm=self.batch_norm,
                    name=f"ed_expansion_{self.N_layers}", **common,
                )(x, train)
            else:
                aligned = CB(
                    enc_f[self.N_layers - i], enc_s[self.N_layers - i],
                    dec_s[i], batch_norm=self.batch_norm,
                    name=f"ed_expansion_{self.N_layers - i}", **common,
                )(skip[-i], train)
                x = jnp.concatenate([x, aligned], axis=-1)
            if self.add_inv:
                x = CB(
                    inv_f[i], dec_s[i], dec_s[i],
                    batch_norm=self.batch_norm, name=f"decoder_inv_{i}",
                    **common,
                )(x, train)
            x = CB(
                dec_out_f[i], dec_s[i], dec_s[i + 1],
                batch_norm=self.batch_norm, name=f"decoder_{i}", **common,
            )(x, train)

        aligned = CB(
            enc_f[0], enc_s[0], dec_s[self.N_layers],
            batch_norm=self.batch_norm, name="ed_expansion_0", **common,
        )(skip[0], train)
        x = jnp.concatenate([x, aligned], axis=-1)

        out_dim_total = self.out_dim * self.out_dim_mult
        _out_size = self.in_size if self.out_size == 1 else self.out_size
        x = LP(
            out_dim_total, dec_s[-1], _out_size,
            latent_dim=self.latent_lift_proj_dim, batch_norm=False,
            name="project", **common,
        )(x, train)

        x = x.astype(jnp.float32)
        if self.out_dim_mult > 1:
            # reference cno.py:519-520: flatten (T,H,W,C·M) → (T·M,H,W,C)
            B = x.shape[0]
            x = x.reshape(B, -1, x.shape[2], x.shape[3],
                          out_dim_total // self.out_dim_mult)
        return x
