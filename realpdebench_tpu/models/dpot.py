"""DPOT — (pretrained) Denoising Pre-trained Operator Transformer.

Functional parity with the reference wrapper (`realpdebench/model/dpot.py:
22-309`) and backbone (`dpot_libs/models/dpot.py:22-403`):

  * FFT-based spectral resize of the input grid to the model's native
    resolution (`dpot_libs/utils/utilities.py:277-305`), channel-pad to 4
    (dpot.py:219-226);
  * DPOTNet: per-frame PatchEmbed conv (+grid channels) + learned pos embed →
    exp-MLP TimeAggregator over the input window → ``depth`` AFNO blocks
    (GroupNorm → AFNO2D spectral mixer with block-diagonal 2-layer real/imag
    MLP on kept modes → GroupNorm → 1×1-conv MLP → skip) → ConvTranspose
    out_layer emitting all ``out_timesteps`` at once;
  * sliding-window multi-step forward/loss when the data window exceeds the
    model window (dpot.py:150-179, 262-309);
  * interop with pretrained torch backbones via shape-matched partial load
    (interop/torch_convert.py).

TPU notes: channels-last; the AFNO block-diagonal einsum is a batched GEMM
over (modes² · blocks); rfft2 in f32.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from realpdebench_tpu.ops.activations import gelu as act_gelu
from realpdebench_tpu.ops import spectral as S
import numpy as np

ACT = {
    "gelu": lambda x: act_gelu(x),
    "tanh": jnp.tanh,
    "relu": nn.relu,
    "silu": nn.silu,
    "sigmoid": nn.sigmoid,
    "leaky_relu": lambda x: nn.leaky_relu(x, 0.1),
}


def fft_resize_2d(x, out_size):
    """Spectral resize over the leading two spatial axes of [..., H, W]-last
    layout: x [B, H, W, F] → [B, H', W', F]. Reference `resize`
    (utilities.py:277-305) — truncate/zero-pad the rfft2 spectrum with
    separate top/bottom row budgets, scale by the area ratio."""
    B = x.shape[0]
    H, W = x.shape[1], x.shape[2]
    Ho, Wo = out_size
    # to [..., H, W] minor for rfft2 semantics of the reference (channels first)
    xc = jnp.moveaxis(x, -1, 1)  # [B, F, H, W]
    if S.use_dft_matmul():
        # dense-DFT planes: shards over dp (jnp.fft would all-gather the
        # batch — GSPMD cannot partition the FFT HLO) and stays real
        fr, fi = S.rfftn_planes(xc, axes=(2, 3))
        Wr = fr.shape[-1]
    else:
        f = jnp.fft.rfft2(xc)
        fr, fi = f.real, f.imag
        Wr = f.shape[-1]
    top1 = min((H + 1) // 2, (Ho + 1) // 2)
    top2 = min(Wr, Wo // 2 + 1)
    bot1 = min(H // 2, Ho // 2)
    # scatter on real/imag planes (complex scatters do not lower on some TPU
    # runtimes); complex exists only at the FFT boundary
    zr = jnp.zeros((*xc.shape[:-2], Ho, Wo // 2 + 1), jnp.float32)
    zi = zr
    # skip the negative-frequency copy for degenerate axes (bot1 == 0:
    # slice(-0, None) would select the WHOLE axis, not nothing)
    slices = [(..., slice(None, top1), slice(None, top2))]
    if bot1:
        slices.append((..., slice(-bot1, None), slice(None, top2)))
    for sl in slices:
        zr = zr.at[sl].set(fr[sl])
        zi = zi.at[sl].set(fi[sl])
    if S.use_dft_matmul():
        out = S.irfftn_planes(zr, zi, s=(Ho, Wo), axes=(2, 3))
    else:
        out = jnp.fft.irfft2(jax.lax.complex(zr, zi), s=(Ho, Wo))
    out = out * (Ho / H) * (Wo / W)
    return jnp.moveaxis(out, 1, -1)


def fft_resize_3d(x, out_size):
    """3-D spectral resize: x [B, H, W, D, F] → [B, H', W', D', F].

    Volumetric analogue of :func:`fft_resize_2d` (reference ``resize``,
    utilities.py:277-305): rfftn over the three spatial axes, truncate or
    zero-pad each axis' spectrum (two-sided budgets on the full axes, a
    one-sided budget on the rfft axis), scale by the volume ratio."""
    B = x.shape[0]
    H, W, D = x.shape[1], x.shape[2], x.shape[3]
    Ho, Wo, Do = out_size
    xc = jnp.moveaxis(x, -1, 1)  # [B, F, H, W, D]
    if S.use_dft_matmul():
        fr, fi = S.rfftn_planes(xc, axes=(2, 3, 4))
        d_in = fr.shape[-1]
    else:
        f = jnp.fft.rfftn(xc.astype(jnp.float32), axes=(2, 3, 4))
        fr, fi = f.real, f.imag
        d_in = f.shape[-1]
    h1 = min((H + 1) // 2, (Ho + 1) // 2)
    h2 = min(H // 2, Ho // 2)
    w1 = min((W + 1) // 2, (Wo + 1) // 2)
    w2 = min(W // 2, Wo // 2)
    d1 = min(d_in, Do // 2 + 1)
    zr = jnp.zeros((*xc.shape[:2], Ho, Wo, Do // 2 + 1), jnp.float32)
    zi = zr
    # h2/w2 == 0 (axis size 1): slice(-0, None) selects the whole axis —
    # skip the negative-frequency copy for those degenerate axes
    h_slices = [slice(None, h1)] + ([slice(-h2, None)] if h2 else [])
    w_slices = [slice(None, w1)] + ([slice(-w2, None)] if w2 else [])
    for sh in h_slices:
        for sw in w_slices:
            sl = (..., sh, sw, slice(None, d1))
            zr = zr.at[sl].set(fr[sl])
            zi = zi.at[sl].set(fi[sl])
    if S.use_dft_matmul():
        out = S.irfftn_planes(zr, zi, s=(Ho, Wo, Do), axes=(2, 3, 4))
    else:
        out = jnp.fft.irfftn(jax.lax.complex(zr, zi), s=(Ho, Wo, Do),
                             axes=(2, 3, 4))
    out = out * (Ho / H) * (Wo / W) * (Do / D)
    return jnp.moveaxis(out, 1, -1)


def _uniform_init(scale):
    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.uniform(key, shape, dtype)

    return init


class AFNO2D(nn.Module):
    """Adaptive Fourier Neural Operator mixer (dpot_libs/models/dpot.py:22-110).

    x: [B, H, W, C] → same; includes its internal residual."""

    width: int
    num_blocks: int = 8
    modes: int = 32
    hidden_size_factor: int = 1
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
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
        if S.use_dft_matmul():
            # dense-DFT planes over the small token grid: dp-shardable
            # (jnp.fft all-gathers — GSPMD cannot partition the FFT HLO),
            # real arithmetic end to end, MXU-sized matmuls
            xfr, xfi = S.rfftn_planes(x, axes=(1, 2), norm="ortho")
            Wr = xfr.shape[2]
        else:
            xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2),
                               norm="ortho")
            xfr, xfi = xf.real, xf.imag
            Wr = xf.shape[2]
        # split into real/imag BEFORE any reshape: complex reshapes (like
        # complex dots) fail to lower on some TPU runtimes, so all shaping
        # happens on real planes and complex exists only at the FFT boundary
        xr_full = xfr.reshape(B, H, Wr, self.num_blocks, bs)
        xi_full = xfi.reshape(B, H, Wr, self.num_blocks, bs)

        km = self.modes
        k1 = min(km, H)
        k2 = min(km, Wr)
        xr = xr_full[:, :k1, :k2]
        xi = xi_full[:, :k1, :k2]

        dt = self.dtype
        f32 = jnp.float32
        # the CPU thunk runtime cannot lower BF16xBF16=F32 dots; there the
        # einsum runs plain-bf16 and upcasts after (TPU keeps f32 accum)
        pet = None if jax.default_backend() == "cpu" else f32

        def mm(a, w):
            out = jnp.einsum("...bi,bio->...bo", a.astype(dt), w.astype(dt),
                             preferred_element_type=pet)
            return out.astype(f32)

        o1r = act(mm(xr, w1[0]) - mm(xi, w1[1]) + b1[0])
        o1i = act(mm(xi, w1[0]) + mm(xr, w1[1]) + b1[1])
        o2r = mm(o1r, w2[0]) - mm(o1i, w2[1]) + b2[0]
        o2i = mm(o1i, w2[0]) + mm(o1r, w2[1]) + b2[1]

        # Assemble the spectrum from real/imag planes (complex scatters and
        # literal-1j arithmetic do not lower on some TPU runtimes).
        fr = jnp.zeros((B, H, Wr, self.num_blocks, bs), f32)
        fi = jnp.zeros((B, H, Wr, self.num_blocks, bs), f32)
        fr = fr.at[:, :k1, :k2].set(o2r.astype(f32))
        fi = fi.at[:, :k1, :k2].set(o2i.astype(f32))
        if S.use_dft_matmul():
            out = S.irfftn_planes(fr.reshape(B, H, Wr, C),
                                  fi.reshape(B, H, Wr, C),
                                  s=(H, W), axes=(1, 2), norm="ortho")
        else:
            out_f = jax.lax.complex(fr.reshape(B, H, Wr, C),
                                    fi.reshape(B, H, Wr, C))
            out = jnp.fft.irfft2(out_f, s=(H, W), axes=(1, 2), norm="ortho")
        return out + x_orig


class DPOTBlock(nn.Module):
    width: int
    n_blocks: int
    modes: int
    mlp_ratio: float = 1.0
    act: str = "gelu"
    double_skip: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C]
        residual = x
        h = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="norm1")(x)
        h = AFNO2D(self.width, self.n_blocks, self.modes, act=self.act,
                   dtype=self.dtype, name="filter")(h)
        if self.double_skip:
            h = h + residual
            residual = h
        h2 = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="norm2")(h)
        hid = int(self.width * self.mlp_ratio)
        h2 = nn.Conv(hid, kernel_size=(1, 1), name="mlp1",
                     dtype=self.dtype)(h2)
        h2 = ACT[self.act](h2)
        h2 = nn.Conv(self.width, kernel_size=(1, 1), name="mlp2",
                     dtype=self.dtype)(h2).astype(jnp.float32)
        return h2 + residual


class DPOTNet(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 1
    out_channels: int = 4
    in_timesteps: int = 1
    out_timesteps: int = 1
    n_blocks: int = 4
    embed_dim: int = 768
    out_layer_dim: int = 32
    depth: int = 12
    modes: int = 32
    mlp_ratio: float = 1.0
    n_cls: int = 12
    normalize: bool = False
    act: str = "gelu"
    time_agg: str = "exp_mlp"
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize blocks (activation memory ~1 block;
    # what lets the 673M-param DPOT-L config train on a 16 GB chip)

    @nn.compact
    def __call__(self, x):
        # x: [B, X, Y, T, C]
        B, X, Y, T, C = x.shape
        act = ACT[self.act]
        if self.normalize:
            mu = x.mean(axis=(1, 2, 3), keepdims=True)
            sigma = x.std(axis=(1, 2, 3), keepdims=True) + 1e-6
            x = (x - mu) / sigma
            ms = jnp.concatenate([mu, sigma], axis=-1)
            scale_mu = nn.Dense(self.embed_dim, name="scale_feats_mu")(ms)
            scale_sigma = nn.Dense(self.embed_dim, name="scale_feats_sigma")(ms)
            scale_mu = scale_mu[:, 0, 0, 0, :][:, None, None, :]
            scale_sigma = scale_sigma[:, 0, 0, 0, :][:, None, None, :]

        gx = jnp.linspace(0, 1, X)[:, None, None, None]
        gy = jnp.linspace(0, 1, Y)[None, :, None, None]
        gt = jnp.linspace(0, 1, T)[None, None, :, None]
        grid = jnp.concatenate(
            [jnp.broadcast_to(g, (X, Y, T, 1)) for g in (gx, gy, gt)], axis=-1
        )
        x = jnp.concatenate(
            [x, jnp.broadcast_to(grid[None], (B, X, Y, T, 3))], axis=-1
        )

        # per-frame patch embed: [B, X, Y, T, C+3] → [(B T), X, Y, C+3]
        h = jnp.transpose(x, (0, 3, 1, 2, 4)).reshape(B * T, X, Y, C + 3)
        p = self.patch_size
        hidden = self.out_channels * p + 3
        h = nn.Conv(hidden, kernel_size=(p, p), strides=(p, p),
                    padding="VALID", name="patch_proj1")(h)
        h = act(h)
        h = nn.Conv(self.embed_dim, kernel_size=(1, 1), name="patch_proj2")(h)

        hx, wx = h.shape[1], h.shape[2]
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02, lower=-2, upper=2),
            (1, hx, wx, self.embed_dim),
        )
        h = h + pos
        h = h.reshape(B, T, hx, wx, self.embed_dim).transpose(0, 2, 3, 1, 4)

        # time aggregation (dpot.py:213-234)
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
            h = scale_sigma[:, None] * h + scale_mu[:, None]

        block_cls = nn.remat(DPOTBlock) if self.remat else DPOTBlock
        for i in range(self.depth):
            h = block_cls(
                self.embed_dim, self.n_blocks, self.modes, self.mlp_ratio,
                self.act, dtype=self.compute_dtype, name=f"block_{i}",
            )(h)

        # classification head exists in pretrained checkpoints; computed and
        # discarded by the benchmark wrapper (dpot.py:229)
        cls_tok = h.mean(axis=(1, 2))
        cls = nn.Dense(self.embed_dim, name="cls1")(cls_tok)
        cls = act(cls)
        cls = nn.Dense(self.embed_dim, name="cls2")(cls)
        cls = act(cls)
        cls = nn.Dense(self.n_cls, name="cls3")(cls)

        out = nn.ConvTranspose(
            self.out_layer_dim, kernel_size=(p, p), strides=(p, p),
            padding="VALID", transpose_kernel=True, name="out_deconv",
        )(h)
        out = act(out)
        out = nn.Conv(self.out_layer_dim, kernel_size=(1, 1), name="out_conv1")(out)
        out = act(out)
        out = nn.Conv(self.out_channels * self.out_timesteps, kernel_size=(1, 1),
                      name="out_conv2")(out)
        out = out.reshape(B, X, Y, self.out_timesteps, self.out_channels)
        if self.normalize:
            out = out * sigma + mu
        return out, cls


class DPOT(nn.Module):
    """Benchmark wrapper (reference model/dpot.py:22-309).

    ``model_type`` selects the backbone (reference model/dpot.py:119-124):
    ``dpot`` (2-D AFNO, planar [B,T,H,W,C] data) or ``dpot3d`` (volumetric
    AFNO3D). The reference wrapper dispatches ``dpot3d`` from config but then
    feeds it planar 5-D tensors, which its 6-D backbone cannot consume; here
    the ``dpot3d`` contract is defined properly for volumetric data
    [B, T, H, W, D, C] (e.g. full-volume foil trajectories)."""

    shape_in: Sequence[int]
    shape_out: Sequence[int]
    model_type: str = "dpot"
    img_size: int = 128
    in_channels: int = 4
    out_channels: int = 4
    in_timesteps: int = 1
    out_timesteps: int = 1
    patch_size: int = 8
    embed_dim: int = 512
    depth: int = 12
    n_blocks: int = 8
    modes: int = 32
    mlp_ratio: float = 4
    out_layer_dim: int = 32
    normalize: bool = False
    act: str = "gelu"
    time_agg: str = "exp_mlp"
    n_cls: int = 1
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        common = dict(
            img_size=self.img_size, patch_size=self.patch_size,
            in_channels=self.in_channels, out_channels=self.out_channels,
            in_timesteps=self.in_timesteps, out_timesteps=self.out_timesteps,
            n_blocks=self.n_blocks, embed_dim=self.embed_dim,
            out_layer_dim=self.out_layer_dim, depth=self.depth,
            modes=self.modes, mlp_ratio=self.mlp_ratio, n_cls=self.n_cls,
            normalize=self.normalize, act=self.act, time_agg=self.time_agg,
        )
        if self.model_type == "dpot3d":
            from realpdebench_tpu.models.dpot3d import DPOTNet3D

            self.dpot_model = DPOTNet3D(
                **common, compute_dtype=self.compute_dtype
            )
        elif self.model_type == "dpot":
            self.dpot_model = DPOTNet(
                **common, compute_dtype=self.compute_dtype,
                remat=self.remat,
            )
        else:
            raise ValueError(f"Unknown model type: {self.model_type}")

    def _single_window(self, x):
        """[B, T_in, H, W, C] → [B, out_timesteps, H, W, C_out]
        (reference dpot.py:181-240)."""
        B, T, H, W, C = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1, 4))  # [B, H, W, T, C]
        model_res = (self.img_size, self.img_size)
        if (H, W) != model_res:
            flat = x.reshape(B, H, W, T * C)
            flat = fft_resize_2d(flat, model_res)
            x = flat.reshape(B, *model_res, T, C)
        if C < 4:
            pad = jnp.ones((B, *x.shape[1:-1], 4 - C), x.dtype)
            x = jnp.concatenate([x, pad], axis=-1)
        out, _ = self.dpot_model(x)
        out = out[..., : self.shape_out[-1]]
        if (H, W) != model_res:
            To, Co = out.shape[3], out.shape[4]
            flat = out.reshape(B, *model_res, To * Co)
            flat = fft_resize_2d(flat, (H, W))
            out = flat.reshape(B, H, W, To, Co)
        return jnp.transpose(out, (0, 3, 1, 2, 4))

    def _single_window_3d(self, x):
        """Volumetric window: [B, T_in, H, W, D, C] →
        [B, out_timesteps, H, W, D, C_out]."""
        B, T, H, W, D, C = x.shape
        x = jnp.transpose(x, (0, 2, 3, 4, 1, 5))  # [B, H, W, D, T, C]
        model_res = (self.img_size,) * 3
        if (H, W, D) != model_res:
            flat = x.reshape(B, H, W, D, T * C)
            flat = fft_resize_3d(flat, model_res)
            x = flat.reshape(B, *model_res, T, C)
        if C < 4:
            pad = jnp.ones((B, *x.shape[1:-1], 4 - C), x.dtype)
            x = jnp.concatenate([x, pad], axis=-1)
        out, _ = self.dpot_model(x)
        out = out[..., : self.shape_out[-1]]
        if (H, W, D) != model_res:
            To, Co = out.shape[4], out.shape[5]
            flat = out.reshape(B, *model_res, To * Co)
            flat = fft_resize_3d(flat, (H, W, D))
            out = flat.reshape(B, H, W, D, To, Co)
        return jnp.transpose(out, (0, 4, 1, 2, 3, 5))

    def __call__(self, x, train: bool = False):
        T_out = self.shape_out[0]
        if self.model_type == "dpot3d":
            single = self._single_window_3d
        else:
            single = self._single_window
        if self.out_timesteps == T_out:
            return single(x)
        # sliding window (static Python loop; dpot.py:150-179)
        current = x
        outputs = []
        for t in range(0, T_out, self.out_timesteps):
            window = current[:, -self.in_timesteps:]
            pred = single(window)
            if t + self.out_timesteps > T_out:
                remaining = T_out - t
                if remaining < self.out_timesteps // 2:
                    break
                outputs.append(pred[:, :remaining])
            else:
                current = jnp.concatenate([current, pred], axis=1)
                outputs.append(pred)
        return jnp.concatenate(outputs, axis=1)
