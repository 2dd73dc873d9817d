"""Transolver — physics-attention transformer on structured 3-D meshes.

Functional parity with the reference
(`realpdebench/model/TRANSOLVER_libs/Transolver_Structured_Mesh_3D.py:80-201`
and `Physics_Attention.py:120-176`): the (T,H,W) grid is flattened to N
tokens, lifted by an MLP (+ learned placeholder when fun_dim=0), then
``n_layers`` pre-LN blocks of Physics-Attention + MLP. Physics attention:
k3 'same' 3-D conv projections → per-head soft assignment of N grid points to
``slice_num`` physical tokens (temperature-clamped softmax) → full softmax
attention among the G slice tokens → de-slice back to the grid.

TPU notes: slice/de-slice are two dense einsums (N×G weight matrix against
head-dim features) — pure MXU work with N contiguous in the lane-friendly
layout; the G×G attention is tiny (G ≤ 64). The benchmark wrapper semantics
(model treats time as the third mesh dim, config H·W·D = T·H·W of the data;
reference `configs/cylinder/trainsolver.yaml:19-22`) are preserved.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax.sharding import Mesh

from realpdebench_tpu.ops.activations import gelu as act_gelu

trunc_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


class TransolverMLP(nn.Module):
    """linear_pre(act) → n_layers×[linear(act)(+res)] → linear_post
    (reference Transolver_Structured_Mesh_3D.py:14-39)."""

    n_hidden: int
    n_output: int
    n_layers: int = 0
    res: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = act_gelu(nn.Dense(self.n_hidden, kernel_init=trunc_init,
                              dtype=self.dtype)(x))
        for _ in range(self.n_layers):
            h = act_gelu(nn.Dense(self.n_hidden, kernel_init=trunc_init,
                                  dtype=self.dtype)(x))
            x = h + x if self.res else h
        return nn.Dense(self.n_output, kernel_init=trunc_init,
                        dtype=self.dtype)(x)


class PhysicsAttention3d(nn.Module):
    dim: int
    heads: int
    dim_head: int
    slice_num: int
    H: int
    W: int
    D: int
    dropout: float = 0.0
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32
    seq_mesh: Optional[Mesh] = None  # sequence parallelism: tokens over mp

    @nn.compact
    def __call__(self, x, train: bool = False):
        from realpdebench_tpu.core.partitioning import token_constraint

        B, N, C = x.shape
        inner = self.dim_head * self.heads
        x = token_constraint(x, self.seq_mesh)
        # the k3 conv projections see the grid view; GSPMD picks their
        # partitioning from the surrounding token constraints (an explicit
        # H-axis constraint here made spatially-partitioned conv wgrads
        # double-count halo contributions on the CPU SPMD backend)
        xg = x.reshape(B, self.H, self.W, self.D, C)

        k = (self.kernel,) * 3
        fx_mid = nn.Conv(inner, kernel_size=k, padding="SAME",
                         name="in_project_fx", dtype=self.dtype)(xg)
        x_mid = nn.Conv(inner, kernel_size=k, padding="SAME",
                        name="in_project_x", dtype=self.dtype)(xg)
        # [B, N, heads, dim_head] → [B, heads, N, dim_head]
        fx_mid = token_constraint(
            fx_mid.reshape(B, N, self.heads, self.dim_head).transpose(
                0, 2, 1, 3), self.seq_mesh, token_axis=2)
        x_mid = token_constraint(
            x_mid.reshape(B, N, self.heads, self.dim_head).transpose(
                0, 2, 1, 3), self.seq_mesh, token_axis=2)

        temperature = self.param(
            "temperature",
            lambda key: 0.5 * jnp.ones((1, self.heads, 1, 1), jnp.float32),
        )
        logits = nn.Dense(self.slice_num, kernel_init=trunc_init,
                          name="in_project_slice", dtype=self.dtype)(x_mid)
        slice_weights = nn.softmax(
            logits / jnp.clip(temperature, 0.1, 5.0), axis=-1
        ).astype(self.dtype)  # [B, h, N, G]; softmax itself in f32
        slice_weights = token_constraint(slice_weights, self.seq_mesh,
                                         token_axis=2)
        # N-contractions below are the only cross-token coupling: GSPMD
        # turns them into per-shard partials + an ICI psum; the G-token
        # attention itself is tiny and replicated
        # f32 accumulator: at reference scale this sums ~160k bf16 values
        # of ~1/G each — bf16 partial sums would lose the small increments
        # once the total passes a few hundred (ulp > increment)
        slice_norm = slice_weights.sum(axis=2, dtype=jnp.float32)  # [B, h, G]
        slice_token = jnp.einsum("bhnc,bhng->bhgc", fx_mid, slice_weights)
        slice_token = (slice_token / (slice_norm + 1e-5)[..., None]).astype(
            self.dtype)

        q = nn.Dense(self.dim_head, use_bias=False, kernel_init=trunc_init,
                     name="to_q", dtype=self.dtype)(slice_token)
        kk = nn.Dense(self.dim_head, use_bias=False, kernel_init=trunc_init,
                      name="to_k", dtype=self.dtype)(slice_token)
        v = nn.Dense(self.dim_head, use_bias=False, kernel_init=trunc_init,
                     name="to_v", dtype=self.dtype)(slice_token)
        dots = jnp.einsum("bhgd,bhkd->bhgk", q, kk) * (self.dim_head ** -0.5)
        attn = nn.softmax(dots.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out_token = jnp.einsum("bhgk,bhkd->bhgd", attn, v)

        out_x = jnp.einsum("bhgc,bhng->bhnc", out_token, slice_weights)
        out_x = token_constraint(
            out_x.transpose(0, 2, 1, 3).reshape(B, N, inner),
            self.seq_mesh)
        out = nn.Dense(self.dim, kernel_init=trunc_init, name="to_out",
                       dtype=self.dtype)(out_x)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class TransolverBlock(nn.Module):
    num_heads: int
    hidden_dim: int
    dropout: float
    mlp_ratio: int
    slice_num: int
    H: int
    W: int
    D: int
    last_layer: bool = False
    out_dim: int = 1
    dtype: jnp.dtype = jnp.float32
    seq_mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, fx, train: bool = False):
        fx = PhysicsAttention3d(
            self.hidden_dim, heads=self.num_heads,
            dim_head=self.hidden_dim // self.num_heads,
            slice_num=self.slice_num, H=self.H, W=self.W, D=self.D,
            dropout=self.dropout, dtype=self.dtype, seq_mesh=self.seq_mesh,
            name="attn",
        )(nn.LayerNorm(epsilon=1e-5, name="ln_1", dtype=self.dtype)(fx),
          train=train) + fx
        fx = TransolverMLP(
            self.hidden_dim * self.mlp_ratio, self.hidden_dim,
            n_layers=0, res=False, dtype=self.dtype, name="mlp",
        )(nn.LayerNorm(epsilon=1e-5, name="ln_2", dtype=self.dtype)(fx)) + fx
        if self.last_layer:
            return nn.Dense(self.out_dim, kernel_init=trunc_init,
                            name="mlp2")(
                nn.LayerNorm(epsilon=1e-5, name="ln_3",
                             dtype=self.dtype)(fx)).astype(jnp.float32)
        return fx


class Transolver3d(nn.Module):
    space_dim: int
    n_layers: int
    n_hidden: int
    n_head: int
    H: int
    W: int
    D: int
    fun_dim: int
    out_dim: int
    shape_in: Sequence[int]
    shape_out: Sequence[int]
    ref: int = 8
    mlp_ratio: int = 1
    slice_num: int = 32
    dropout: float = 0.0
    unified_pos: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    seq_mesh: Optional[Mesh] = None  # sequence parallelism: tokens over mp

    @nn.compact
    def __call__(self, x, train: bool = False):
        from realpdebench_tpu.core.partitioning import token_constraint

        B = x.shape[0]
        in_shape = x.shape
        x = token_constraint(x.reshape(B, -1, in_shape[-1]), self.seq_mesh)

        if self.unified_pos:
            pos = self._unified_pos()
            x = jnp.broadcast_to(
                pos[None], (B, self.H * self.W * self.D, self.ref ** 3)
            )

        fx = TransolverMLP(
            self.n_hidden * 2, self.n_hidden, n_layers=0, res=False,
            dtype=self.compute_dtype, name="preprocess",
        )(x)
        placeholder = self.param(
            "placeholder",
            lambda key: (1.0 / self.n_hidden)
            * jnp.asarray(
                nn.initializers.uniform(scale=1.0)(key, (self.n_hidden,),
                                                   jnp.float32)
            ),
        )
        fx = fx + placeholder[None, None, :].astype(fx.dtype)

        for i in range(self.n_layers):
            fx = TransolverBlock(
                num_heads=self.n_head, hidden_dim=self.n_hidden,
                dropout=self.dropout, mlp_ratio=self.mlp_ratio,
                slice_num=self.slice_num, H=self.H, W=self.W, D=self.D,
                last_layer=(i == self.n_layers - 1), out_dim=self.out_dim,
                dtype=self.compute_dtype, seq_mesh=self.seq_mesh,
                name=f"block_{i}",
            )(fx, train=train)

        return fx.reshape(*in_shape[:-1], self.out_dim)

    def _unified_pos(self):
        import numpy as np

        gx = np.linspace(0, 1, self.H)
        gy = np.linspace(0, 1, self.W)
        gz = np.linspace(0, 1, self.D)
        grid = np.stack(np.meshgrid(gx, gy, gz, indexing="ij"), axis=-1)
        rr = np.linspace(0, 1, self.ref)
        grid_ref = np.stack(np.meshgrid(rr, rr, rr, indexing="ij"), axis=-1)
        pos = np.sqrt(
            ((grid[:, :, :, None, None, None, :]
              - grid_ref[None, None, None, :, :, :, :]) ** 2).sum(-1)
        ).reshape(self.H * self.W * self.D, self.ref ** 3)
        return jnp.asarray(pos, jnp.float32)
