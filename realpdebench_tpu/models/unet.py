"""Unet3d — video-diffusion-style 3-D U-Net baseline.

Functional parity with the reference (`realpdebench/model/unet.py:360-567`):
init Conv k7 → temporal attention (rotary + T5-style relative position bias)
→ down path of [2× ResnetBlock(GroupNorm+SiLU, time-conditioned scale/shift) +
spatial linear attention + temporal attention + (1,4,4)/(1,2,2) spatial-only
down/upsampling] → mid blocks with full spatial attention → symmetric up path
with skip concats → final block + 1×1 conv. The conditioning time embedding is
always zeros in this benchmark (unet.py:513) but still flows through the MLP
(its biases produce a constant scale/shift — kept for checkpoint parity).
Input repeated along T when out_time > in_time (unet.py:520).

TPU design: channels-last [B,T,H,W,C] throughout (reference is channels-
first); attention shapes put the contraction on the lane dim; the temporal
attention sequence length is T ≤ 40 so full softmax attention is trivially
MXU-bound; spatial linear attention is two batched GEMMs (the K^T V trick).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from realpdebench_tpu.ops.activations import gelu as act_gelu
import numpy as np


def relative_position_bucket(rel_pos, num_buckets=32, max_distance=128):
    """T5 relative-position bucketing (reference unet.py:90-108)."""
    ret = 0
    n = -rel_pos
    num_buckets //= 2
    ret += (n < 0).astype(np.int64) * num_buckets
    n = np.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    ret += np.where(is_small, n, val_if_large)
    return ret


class RelativePositionBias(nn.Module):
    heads: int = 8
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, n: int):
        q_pos = np.arange(n)
        rel = q_pos[None, :] - q_pos[:, None]  # k - q
        buckets = relative_position_bucket(
            rel, self.num_buckets, self.max_distance
        )  # [n, n] host-side constant
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.num_buckets, self.heads),
        )
        values = table[jnp.asarray(buckets)]  # [n, n, h]
        return jnp.transpose(values, (2, 0, 1))  # [h, n, n]


def rotary_freqs(n: int, dim: int, theta: float = 10000.0):
    """Interleaved rotary frequencies, rotary_embedding_torch semantics:
    freqs[i] duplicated per pair, rotate_half pairs (x0,x1)→(-x1,x0)."""
    inv = 1.0 / (theta ** (np.arange(0, dim, 2) / dim))
    t = np.arange(n)
    f = np.einsum("i,j->ij", t, inv)  # [n, dim/2]
    return jnp.asarray(np.repeat(f, 2, axis=-1), jnp.float32)  # [n, dim]


def apply_rotary(x, freqs):
    """x: [..., n, d] with d >= freqs.shape[-1]; rotate the first rot_dim."""
    rot_dim = freqs.shape[-1]
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    x1 = x_rot[..., 0::2]
    x2 = x_rot[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(x_rot.shape)
    out = x_rot * jnp.cos(freqs) + rotated * jnp.sin(freqs)
    return jnp.concatenate([out, x_pass], axis=-1)


class ChannelLayerNorm(nn.Module):
    """Gamma-only channel LayerNorm, biased variance, eps 1e-5
    (reference unet.py:169-178), channels-last."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        # stats in f32; output back in input dtype so bf16 flow stays bf16
        xf = x.astype(jnp.float32)
        var = jnp.var(xf, axis=-1, keepdims=True)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        out = (xf - mean) / jnp.sqrt(var + self.eps) * gamma
        return out.astype(x.dtype)


class TemporalAttention(nn.Module):
    """Full attention over the T axis per spatial site, with rotary q/k and
    relative-position bias (reference unet.py:280-356, 390).

    ``use_pallas``: None → auto (site-lane fused kernel on TPU when H*W is
    a multiple of 128; ops/pallas/temporal_attention.py); True/False
    forces. XLA's batched [T,d]@[d,T] matmuls at batch B*H*W*h pad both
    tiny dims to MXU tiles (~100x FLOP waste); the kernel runs them on the
    VPU with sites riding the lanes."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool | None = None
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x, pos_bias=None):
        # x: [B, T, H, W, C] → tokens [B, H*W, T, C]
        B, T, H, W, C = x.shape
        t = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, H * W, T, C)

        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, name="to_qkv",
                       dtype=self.dtype)(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        fused = self.use_pallas
        if fused is None:
            from realpdebench_tpu.ops.pallas.temporal_attention import (
                supported,
            )

            fused = supported(H * W) and not self.is_initializing()
        if fused:
            out = self._sites_attention(q, k, v, pos_bias, B, T, H, W)
        else:
            out = self._einsum_attention(q, k, v, pos_bias, B, T, H, W)
        out = nn.Dense(C, use_bias=False, name="to_out",
                       dtype=self.dtype)(out)
        return out.reshape(B, H, W, T, C).transpose(0, 3, 1, 2, 4)

    def _einsum_attention(self, q, k, v, pos_bias, B, T, H, W):
        hidden = self.heads * self.dim_head

        def heads(z):  # [B, S, T, hidden] → [B, S, h, T, d]
            return z.reshape(B, H * W, T, self.heads, self.dim_head).transpose(
                0, 1, 3, 2, 4
            )

        q, k, v = heads(q), heads(k), heads(v)
        q = q * (self.dim_head ** -0.5)
        freqs = rotary_freqs(T, min(32, self.dim_head))
        q = apply_rotary(q, freqs)
        k = apply_rotary(k, freqs)

        sim = jnp.einsum("bshid,bshjd->bshij", q, k)
        if pos_bias is not None:
            sim = sim + pos_bias  # [h, T, T] broadcasts over B, S
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bshij,bshjd->bshid", attn, v)
        return out.transpose(0, 1, 3, 2, 4).reshape(B, H * W, T, hidden)

    def _sites_attention(self, q, k, v, pos_bias, B, T, H, W):
        from realpdebench_tpu.ops.pallas.temporal_attention import (
            temporal_attention_tokens,
        )

        S, h, d = H * W, self.heads, self.dim_head
        hidden = h * d

        q5 = q.reshape(B, S, T, h, d) * (self.dim_head ** -0.5)
        k5 = k.reshape(B, S, T, h, d)
        # freqs index the T axis (dim 2 here), not the penultimate one
        freqs = rotary_freqs(T, min(32, d))[None, None, :, None, :]
        # rotary promotes to f32; keep the kernel IO in compute dtype
        q = apply_rotary(q5, freqs).reshape(B, S, T, hidden).astype(self.dtype)
        k = apply_rotary(k5, freqs).reshape(B, S, T, hidden).astype(self.dtype)

        pb = (jnp.zeros((h, T, T), jnp.float32) if pos_bias is None
              else pos_bias)
        # fence the kernel so its (default-layout) operand constraints do
        # not leak into XLA's layout/algorithm choices for the surrounding
        # convolutions (observed: conv wgrads fall off the MXU path)
        q, k, v2 = jax.lax.optimization_barrier((q, k, v.astype(self.dtype)))
        out = temporal_attention_tokens(
            q, k, v2, pb, h, interpret=self.pallas_interpret,
        )
        (out,) = jax.lax.optimization_barrier((out,))
        return out


class SpatialAttention(nn.Module):
    """Full attention over H*W tokens per frame (mid block; unet.py:460)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        t = x.reshape(B, T, H * W, C)
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, name="to_qkv",
                       dtype=self.dtype)(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(B, T, H * W, self.heads, self.dim_head).transpose(
                0, 1, 3, 2, 4
            )

        q, k, v = heads(q), heads(k), heads(v)
        q = q * (self.dim_head ** -0.5)
        sim = jnp.einsum("bthid,bthjd->bthij", q, k)
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bthij,bthjd->bthid", attn, v)
        out = out.transpose(0, 1, 3, 2, 4).reshape(B, T, H * W, hidden)
        out = nn.Dense(C, use_bias=False, name="to_out",
                       dtype=self.dtype)(out)
        return out.reshape(B, T, H, W, C)


class SpatialLinearAttention(nn.Module):
    """Softmax-kernel linear attention per frame (reference unet.py:236-261):
    softmax(q over d) · [softmax(k over n) Kᵀ V] — O(N·d²)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, kernel_size=(1, 1), use_bias=False,
                      name="to_qkv", dtype=self.dtype)(
            x.reshape(B * T, H, W, C))
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):  # [BT, H, W, hidden] → [BT, h, N, d]; d stays minor
            # (lane axis) so no d-major relayout is needed around the GEMMs
            return z.reshape(B * T, H * W, self.heads, self.dim_head).transpose(
                0, 2, 1, 3
            )

        q, k, v = heads(q), heads(k), heads(v)
        q = jax.nn.softmax(q, axis=-1)  # over d (reference q.softmax(dim=-2))
        k = jax.nn.softmax(k, axis=-2)  # over n
        q = q * (self.dim_head ** -0.5)
        context = jnp.einsum("bhnd,bhne->bhde", k, v)
        out = jnp.einsum("bhde,bhnd->bhne", context, q)  # [BT, h, N, e]
        out = out.transpose(0, 2, 1, 3).reshape(B * T, H, W, hidden)
        out = nn.Conv(C, kernel_size=(1, 1), name="to_out",
                      dtype=self.dtype)(out)
        return out.reshape(B, T, H, W, C)


class Block(nn.Module):
    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = nn.Conv(self.dim_out, kernel_size=(3, 3, 3), padding="SAME",
                    name="proj", dtype=self.dtype)(x)
        # dtype keeps the normalized activations in compute dtype — without
        # it the f32 gamma/beta promote every full-res tensor to f32
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm",
                         dtype=self.dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return nn.silu(x)


class ResnetBlock(nn.Module):
    dim_out: int
    time_emb_dim: Optional[int] = None
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if self.time_emb_dim is not None:
            h = nn.Dense(self.dim_out * 2, name="mlp")(nn.silu(time_emb))
            h = h[:, None, None, None, :].astype(self.dtype)
            scale_shift = jnp.split(h, 2, axis=-1)
        h = Block(self.dim_out, self.groups, dtype=self.dtype,
                  name="block1")(x, scale_shift)
        h = Block(self.dim_out, self.groups, dtype=self.dtype,
                  name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, kernel_size=(1, 1, 1), name="res_conv",
                        dtype=self.dtype)(x)
        return (h + x.astype(self.dtype))


def sinusoidal_pos_emb(t, dim):
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    emb = jnp.exp(jnp.arange(half) * -emb)
    emb = t[:, None] * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class Unet3d(nn.Module):
    dim: int
    out_channels: int
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 6
    attn_heads: int = 4
    attn_dim_head: int = 32
    init_kernel_size: int = 7
    resnet_groups: int = 8
    in_time: int = 10
    out_time: int = 10
    use_sparse_linear_attn: bool = True
    remat: bool = True  # rematerialize blocks: activation memory ~one block
    remat_attention: bool = False  # attention replay is the dominant bwd
    # cost on TPU (batched tiny T=20 matmuls + layout churn); saving its
    # activations costs ~2G at microbatch 3 and avoids the replay
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.remat:
            RB = nn.remat(ResnetBlock)
            if self.remat_attention:
                TA = nn.remat(TemporalAttention)
                SA = nn.remat(SpatialAttention)
                SLA = nn.remat(SpatialLinearAttention)
            else:
                TA, SA, SLA = (TemporalAttention, SpatialAttention,
                               SpatialLinearAttention)
        else:
            RB, TA, SA, SLA = (ResnetBlock, TemporalAttention,
                               SpatialAttention, SpatialLinearAttention)
        # x: [B, T_in, H, W, C]
        B = x.shape[0]
        if self.out_time > x.shape[1]:
            x = jnp.tile(x, (1, self.out_time // x.shape[1], 1, 1, 1))

        time = jnp.zeros((B,), jnp.float32)  # constant conditioning (unet.py:513)
        pos_bias = RelativePositionBias(
            heads=self.attn_heads, max_distance=32, name="time_rel_pos_bias"
        )(self.out_time)

        ks = self.init_kernel_size
        # NOTE: a Cin 3->8 zero-pad of this conv was tried (round 4) on the
        # theory that the f32[7,7,7,3,64] weight-gradient's select+add VPU
        # lowering was the hot op; the full-model A/B measured 0.498 vs
        # 0.499 steps/s (null) and an isolated grad-of-conv probe showed
        # all formulations equal (tools/conv_wgrad_probe.py), so the lever
        # was removed.
        x = nn.Conv(self.dim, kernel_size=(ks, ks, ks), padding="SAME",
                    name="init_conv", dtype=self.compute_dtype)(x)
        x = x + TA(
            self.dim, self.attn_heads, self.attn_dim_head, dtype=self.compute_dtype,
            name="init_temporal_attn",
        )(ChannelLayerNorm(self.dim, name="init_attn_norm")(x), pos_bias)

        r = x

        time_dim = self.dim * 4
        t = sinusoidal_pos_emb(time, self.dim)
        t = nn.Dense(time_dim, name="time_mlp_1")(t)
        t = act_gelu(t)
        t = nn.Dense(time_dim, name="time_mlp_2")(t)

        dims = [self.dim, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_res = len(in_out)

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= n_res - 1
            x = RB(dim_out, time_dim, self.resnet_groups, dtype=self.compute_dtype,
                            name=f"down_{ind}_block1")(x, t)
            x = RB(dim_out, time_dim, self.resnet_groups, dtype=self.compute_dtype,
                            name=f"down_{ind}_block2")(x, t)
            if self.use_sparse_linear_attn:
                x = x + SLA(
                    dim_out, self.attn_heads, dtype=self.compute_dtype,
                    name=f"down_{ind}_spatial_attn"
                )(ChannelLayerNorm(dim_out, name=f"down_{ind}_spatial_norm")(x))
            x = x + TA(
                dim_out, self.attn_heads, self.attn_dim_head, dtype=self.compute_dtype,
                name=f"down_{ind}_temporal_attn",
            )(ChannelLayerNorm(dim_out, name=f"down_{ind}_temporal_norm")(x),
              pos_bias)
            hs.append(x)
            if not is_last:
                x = nn.Conv(dim_out, kernel_size=(1, 4, 4),
                            strides=(1, 2, 2),
                            padding=((0, 0), (1, 1), (1, 1)),
                            name=f"down_{ind}_downsample",
                            dtype=self.compute_dtype)(x)

        mid_dim = dims[-1]
        x = RB(mid_dim, time_dim, self.resnet_groups, dtype=self.compute_dtype,
                        name="mid_block1")(x, t)
        x = x + SA(
            mid_dim, self.attn_heads, dtype=self.compute_dtype,
            name="mid_spatial_attn"
        )(ChannelLayerNorm(mid_dim, name="mid_spatial_norm")(x))
        x = x + TA(
            mid_dim, self.attn_heads, self.attn_dim_head, dtype=self.compute_dtype,
            name="mid_temporal_attn",
        )(ChannelLayerNorm(mid_dim, name="mid_temporal_norm")(x), pos_bias)
        x = RB(mid_dim, time_dim, self.resnet_groups, dtype=self.compute_dtype,
                        name="mid_block2")(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind >= n_res - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = RB(dim_in, time_dim, self.resnet_groups, dtype=self.compute_dtype,
                            name=f"up_{ind}_block1")(x, t)
            x = RB(dim_in, time_dim, self.resnet_groups, dtype=self.compute_dtype,
                            name=f"up_{ind}_block2")(x, t)
            if self.use_sparse_linear_attn:
                x = x + SLA(
                    dim_in, self.attn_heads, dtype=self.compute_dtype,
                    name=f"up_{ind}_spatial_attn"
                )(ChannelLayerNorm(dim_in, name=f"up_{ind}_spatial_norm")(x))
            x = x + TA(
                dim_in, self.attn_heads, self.attn_dim_head, dtype=self.compute_dtype,
                name=f"up_{ind}_temporal_attn",
            )(ChannelLayerNorm(dim_in, name=f"up_{ind}_temporal_norm")(x),
              pos_bias)
            if not is_last:
                # torch ConvTranspose3d(k=(1,4,4), s=(1,2,2), p=(0,1,1)):
                # flax effective padding = kernel-1-torch_pad per side
                x = nn.ConvTranspose(
                    dim_in, kernel_size=(1, 4, 4), strides=(1, 2, 2),
                    padding=((0, 0), (2, 2), (2, 2)), transpose_kernel=True,
                    name=f"up_{ind}_upsample", dtype=self.compute_dtype,
                )(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = RB(self.dim, None, self.resnet_groups, dtype=self.compute_dtype,
                        name="final_block")(x)
        out = nn.Conv(self.out_channels, kernel_size=(1, 1, 1),
                       name="final_conv", dtype=self.compute_dtype)(x)
        return out.astype(jnp.float32)
