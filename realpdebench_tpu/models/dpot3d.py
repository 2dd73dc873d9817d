"""DPOTNet3D / AFNO3D — the volumetric DPOT variant.

Functional parity with the reference (`realpdebench/model/dpot_libs/models/
dpot3d.py:22-461`): same architecture as the 2-D DPOTNet but with cubic
patches, rfftn over (X, Y, Z) with separate spatial/temporal mode budgets in
the AFNO mixer, and 4-component grid features. Selected via
``model_type: dpot3d`` in the wrapper config (reference model/dpot.py:119-124);
note the benchmark's 2-D data path always uses the 2-D variant — this one is
for volumetric (B, X, Y, Z, T, C) data.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from realpdebench_tpu.models.dpot import ACT, _uniform_init
from realpdebench_tpu.ops import spectral as SP


class AFNO3D(nn.Module):
    """x: [B, X, Y, Z, C] → same (internal residual); rfftn over (X, Y, Z)
    with kept modes (modes, modes, temporal_modes) — dpot3d.py:22-97."""

    width: int
    num_blocks: int = 8
    modes: int = 32
    temporal_modes: int = 8
    hidden_size_factor: int = 1
    act: str = "gelu"

    @nn.compact
    def __call__(self, x):
        B, H, W, L, C = x.shape
        bs = self.width // self.num_blocks
        hf = self.hidden_size_factor
        scale = 1.0 / (bs * bs * hf)
        w1 = self.param("w1", _uniform_init(scale),
                        (2, self.num_blocks, bs, bs * hf))
        b1 = self.param("b1", _uniform_init(scale),
                        (2, self.num_blocks, bs * hf))
        w2 = self.param("w2", _uniform_init(scale),
                        (2, self.num_blocks, bs * hf, bs))
        b2 = self.param("b2", _uniform_init(scale), (2, self.num_blocks, bs))
        act = ACT[self.act]

        x_orig = x
        if SP.use_dft_matmul():
            # dense-DFT planes: dp-shardable (jnp.fft all-gathers — GSPMD
            # cannot partition the FFT HLO) and real end to end
            xfr, xfi = SP.rfftn_planes(x, axes=(1, 2, 3), norm="ortho")
        else:
            xf = jnp.fft.rfftn(x.astype(jnp.float32), axes=(1, 2, 3),
                               norm="ortho")
            xfr, xfi = xf.real, xf.imag
        S1, S2, S3 = xfr.shape[1], xfr.shape[2], xfr.shape[3]
        # real/imag split before reshaping: complex reshapes do not lower on
        # some TPU runtimes — keep complex only at the FFT boundary
        bshape = (B, S1, S2, S3, self.num_blocks, bs)
        xr_full = xfr.reshape(bshape)
        xi_full = xfi.reshape(bshape)

        k1 = min(self.modes, S1)
        k2 = min(self.modes, S2)
        k3 = min(self.temporal_modes, S3)
        xr = xr_full[:, :k1, :k2, :k3]
        xi = xi_full[:, :k1, :k2, :k3]

        o1r = act(jnp.einsum("...bi,bio->...bo", xr, w1[0])
                  - jnp.einsum("...bi,bio->...bo", xi, w1[1]) + b1[0])
        o1i = act(jnp.einsum("...bi,bio->...bo", xi, w1[0])
                  + jnp.einsum("...bi,bio->...bo", xr, w1[1]) + b1[1])
        o2r = (jnp.einsum("...bi,bio->...bo", o1r, w2[0])
               - jnp.einsum("...bi,bio->...bo", o1i, w2[1]) + b2[0])
        o2i = (jnp.einsum("...bi,bio->...bo", o1i, w2[0])
               + jnp.einsum("...bi,bio->...bo", o1r, w2[1]) + b2[1])

        # Real/imag planes + lax.complex (complex scatters and literal-1j
        # arithmetic do not lower on some TPU runtimes).
        fr = jnp.zeros(bshape, jnp.float32).at[:, :k1, :k2, :k3].set(o2r)
        fi = jnp.zeros(bshape, jnp.float32).at[:, :k1, :k2, :k3].set(o2i)
        if SP.use_dft_matmul():
            out = SP.irfftn_planes(fr.reshape(B, S1, S2, S3, C),
                                   fi.reshape(B, S1, S2, S3, C),
                                   s=(H, W, L), axes=(1, 2, 3), norm="ortho")
        else:
            out_f = jax.lax.complex(fr.reshape(B, S1, S2, S3, C),
                                    fi.reshape(B, S1, S2, S3, C))
            out = jnp.fft.irfftn(out_f, s=(H, W, L), axes=(1, 2, 3),
                                 norm="ortho")
        return out + x_orig


class DPOT3DBlock(nn.Module):
    width: int
    n_blocks: int
    modes: int
    temporal_modes: int = 8
    mlp_ratio: float = 1.0
    act: str = "gelu"
    double_skip: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="norm1",
                         dtype=self.dtype)(x)
        h = AFNO3D(self.width, self.n_blocks, self.modes, self.temporal_modes,
                   act=self.act, name="filter")(h)
        if self.double_skip:
            h = h + residual
            residual = h
        h2 = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="norm2",
                          dtype=self.dtype)(h)
        hid = int(self.width * self.mlp_ratio)
        h2 = nn.Conv(hid, kernel_size=(1, 1, 1), name="mlp1",
                     dtype=self.dtype)(h2)
        h2 = ACT[self.act](h2)
        h2 = nn.Conv(self.width, kernel_size=(1, 1, 1), name="mlp2",
                     dtype=self.dtype)(h2)
        # residual stream stays f32 (same as the 2-D DPOTBlock, dpot.py:207):
        # re-quantizing the carry to bf16 every block compounds rounding
        return h2.astype(jnp.float32) + residual


class DPOTNet3D(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 1
    out_channels: int = 3
    in_timesteps: int = 1
    out_timesteps: int = 1
    n_blocks: int = 4
    embed_dim: int = 768
    out_layer_dim: int = 32
    depth: int = 12
    modes: int = 32
    temporal_modes: int = 8
    mlp_ratio: float = 1.0
    n_cls: int = 1
    normalize: bool = False
    act: str = "gelu"
    time_agg: str = "exp_mlp"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, X, Y, Z, T, C]
        B, X, Y, Z, T, C = x.shape
        act = ACT[self.act]
        if self.normalize:
            mu = x.mean(axis=(1, 2, 3, 4), keepdims=True)
            sigma = x.std(axis=(1, 2, 3, 4), keepdims=True) + 1e-6
            x = (x - mu) / sigma
            ms = jnp.concatenate([mu, sigma], axis=-1)
            scale_mu = nn.Dense(self.embed_dim, name="scale_feats_mu")(ms)
            scale_sigma = nn.Dense(self.embed_dim, name="scale_feats_sigma")(ms)
            scale_mu = scale_mu[:, 0, 0, 0, 0, :][:, None, None, None, :]
            scale_sigma = scale_sigma[:, 0, 0, 0, 0, :][:, None, None, None, :]

        axes = [jnp.linspace(0, 1, n) for n in (X, Y, Z, T)]
        grids = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
        x = jnp.concatenate(
            [x, jnp.broadcast_to(grids[None], (B, X, Y, Z, T, 4))], axis=-1
        )

        h = jnp.transpose(x, (0, 4, 1, 2, 3, 5)).reshape(B * T, X, Y, Z, C + 4)
        p = self.patch_size
        hidden = self.out_channels * p + 4
        h = nn.Conv(hidden, kernel_size=(p, p, p), strides=(p, p, p),
                    padding="VALID", name="patch_proj1",
                    dtype=self.compute_dtype)(h)
        h = act(h)
        h = nn.Conv(self.embed_dim, kernel_size=(1, 1, 1),
                    name="patch_proj2", dtype=self.compute_dtype)(h)
        h = h.astype(jnp.float32)

        hx, wy, lz = h.shape[1], h.shape[2], h.shape[3]
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02, lower=-2, upper=2),
            (1, hx, wy, lz, self.embed_dim),
        )
        h = h + pos
        h = h.reshape(B, T, hx, wy, lz, self.embed_dim).transpose(
            0, 2, 3, 4, 1, 5
        )

        w = self.param(
            "time_agg_w",
            lambda k: (1 / (self.in_timesteps * self.embed_dim**0.5))
            * jax.random.normal(k, (self.in_timesteps, self.embed_dim,
                                    self.embed_dim)),
        )
        if self.time_agg == "exp_mlp":
            gamma = self.param(
                "time_agg_gamma",
                lambda k: 2 ** jnp.linspace(-10, 10, self.embed_dim)[None, :],
            )
            t = jnp.linspace(0, 1, T)[:, None]
            t_embed = jnp.cos(t @ gamma)
            h = jnp.einsum("tij,...ti->...j", w, h * t_embed)
        elif self.time_agg == "mlp":
            h = jnp.einsum("tij,...ti->...j", w, h)
        else:
            raise ValueError(f"time_agg {self.time_agg} not supported")

        if self.normalize:
            h = scale_sigma * h + scale_mu

        for i in range(self.depth):
            h = DPOT3DBlock(
                self.embed_dim, self.n_blocks, self.modes, self.temporal_modes,
                self.mlp_ratio, self.act, dtype=self.compute_dtype,
                name=f"block_{i}",
            )(h)

        cls_tok = h.mean(axis=(1, 2, 3))
        cls = nn.Dense(self.embed_dim, name="cls1")(cls_tok)
        cls = act(cls)
        cls = nn.Dense(self.embed_dim, name="cls2")(cls)
        cls = act(cls)
        cls = nn.Dense(self.n_cls, name="cls3")(cls)

        out = nn.ConvTranspose(
            self.out_layer_dim, kernel_size=(p, p, p), strides=(p, p, p),
            padding="VALID", transpose_kernel=True, name="out_deconv",
            dtype=self.compute_dtype,
        )(h)
        out = act(out)
        out = nn.Conv(self.out_layer_dim, kernel_size=(1, 1, 1),
                      name="out_conv1", dtype=self.compute_dtype)(out)
        out = act(out)
        out = nn.Conv(self.out_channels * self.out_timesteps,
                      kernel_size=(1, 1, 1), name="out_conv2",
                      dtype=self.compute_dtype)(out)
        out = out.astype(jnp.float32)
        out = out.reshape(B, X, Y, Z, self.out_timesteps, self.out_channels)
        if self.normalize:
            out = out * sigma + mu
        return out, cls
