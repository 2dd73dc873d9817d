"""Fused Galerkin-attention Pallas kernel.

Galerkin attention (models/galerkin_transformer.py) is
``out = Q · (LN(K)ᵀ · LN(V)) / N`` with per-head affine LayerNorms on K and V.
At benchmark scale N = T·H·W ≈ 164k tokens per head, so the unfused XLA
program writes two normalized [N, d] tensors back to HBM and re-reads them
for the contraction — pure HBM-bandwidth waste on arrays ~40 MB each.

This kernel streams K/V tiles HBM→VMEM once: each grid step normalizes a
[TILE, d] block in registers and accumulates ``LN(K)ᵀ LN(V)`` into a [d, d]
VMEM scratch (MXU matmul); the final grid step scales by 1/N and emits the
tiny score matrix. The Q·scores product stays in XLA (it is a single clean
GEMM already). Backward is provided via `jax.custom_vjp` in plain jnp —
the recompute there is the same matmuls XLA fuses well.

Falls back to pure-jnp on non-TPU platforms (and under `interpret=True` in
tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, scale, bias, eps):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _scores_ref(k, v, k_scale, k_bias, v_scale, v_bias, eps):
    """jnp reference: [N, d] × [N, d] → [d, d] (per head handled by vmap)."""
    kn = _ln(k, k_scale, k_bias, eps)
    vn = _ln(v, v_scale, v_bias, eps)
    return kn.T @ vn / k.shape[0]


def _scores_kernel(k_ref, v_ref, ks_ref, kb_ref, vs_ref, vb_ref, o_ref,
                   acc_ref, *, eps, n_total):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k = k_ref[:]
    v = v_ref[:]
    kn = _ln(k, ks_ref[:], kb_ref[:], eps)
    vn = _ln(v, vs_ref[:], vb_ref[:], eps)
    acc_ref[:] += jnp.dot(kn.T, vn, preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc_ref[:] / n_total


def _scores_pallas(k, v, k_scale, k_bias, v_scale, v_bias, eps,
                   tile=2048, interpret=False):
    """k, v: [N, d] (single head) → [d, d]."""
    n, d = k.shape
    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        # zero rows contribute LN(0)=bias-ish garbage — mask instead: pad with
        # replicated last row and correct by weighting is messy; simplest is
        # tile sized to divide N (we pick tile accordingly at the wrapper)
        raise ValueError(f"N={n} must be divisible by tile={tile}")
    grid = (n // tile,)
    kernel = functools.partial(_scores_kernel, eps=eps, n_total=float(n))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((d, d), jnp.float32)],
        interpret=interpret,
    )(k, v, k_scale[None], k_bias[None], v_scale[None], v_bias[None])


def _pick_tile(n: int, d: int, budget_bytes: int = 4 * 1024 * 1024) -> int:
    """Largest power-of-two-ish tile dividing n that fits the VMEM budget."""
    max_rows = max(budget_bytes // (2 * 4 * max(d, 128)), 128)
    tile = 1
    for cand in (8192, 4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if cand <= max_rows and n % cand == 0:
            tile = cand
            break
    return tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def galerkin_scores(k, v, k_scale, k_bias, v_scale, v_bias, eps=1e-5,
                    force_ref=False):
    """Batched-head fused scores: k, v [B, h, N, d] → [B, h, d, d].

    scores = LN(k)ᵀ LN(v) / N with per-head affine params [h, d].
    """
    return _scores_fwd_impl(k, v, k_scale, k_bias, v_scale, v_bias, eps,
                            force_ref)


def _scores_fwd_impl(k, v, k_scale, k_bias, v_scale, v_bias, eps, force_ref):
    B, h, n, d = k.shape
    platform = jax.devices()[0].platform
    # Measured on v5e (B2·h4·N8192·d64): the XLA-fused einsum path runs this
    # at 6.4 ms vs 128 ms for the Pallas kernel — XLA's batched-GEMM + LN
    # fusion is already near-optimal for this shape, and the per-(B,h)
    # pallas_call fan-out serializes. The kernel therefore stays OPT-IN
    # (REALPDEBENCH_GALERKIN=pallas) as the scaffold for a future
    # head-batched revision.
    import os

    want_pallas = os.environ.get("REALPDEBENCH_GALERKIN") == "pallas"
    use_pallas = (not force_ref) and want_pallas and platform not in ("cpu",)
    interpret = False
    if not use_pallas:
        fn = jax.vmap(jax.vmap(_scores_ref, in_axes=(0, 0, 0, 0, 0, 0, None)),
                      in_axes=(0, 0, None, None, None, None, None))
        return fn(k, v, k_scale, k_bias, v_scale, v_bias, eps)
    tile = _pick_tile(n, d)

    def one(kh, vh, ks, kb, vs, vb):
        return _scores_pallas(kh, vh, ks, kb, vs, vb, eps, tile=tile,
                              interpret=interpret)

    return jax.vmap(jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0)),
                    in_axes=(0, 0, None, None, None, None))(
        k, v, k_scale, k_bias, v_scale, v_bias
    )


def _scores_fwd(k, v, k_scale, k_bias, v_scale, v_bias, eps, force_ref):
    out = _scores_fwd_impl(k, v, k_scale, k_bias, v_scale, v_bias, eps,
                           force_ref)
    return out, (k, v, k_scale, k_bias, v_scale, v_bias)


def _scores_bwd(eps, force_ref, res, g):
    """Backward in plain jnp (XLA): recompute the normalized tensors."""
    k, v, k_scale, k_bias, v_scale, v_bias = res
    n = k.shape[2]

    def fwd(k, v, ks, kb, vs, vb):
        kn = _ln(k, ks[None, :, None, :], kb[None, :, None, :], eps)
        vn = _ln(v, vs[None, :, None, :], vb[None, :, None, :], eps)
        return jnp.einsum("bhnd,bhne->bhde", kn, vn) / n

    _, vjp = jax.vjp(fwd, k, v, k_scale, k_bias, v_scale, v_bias)
    return vjp(g)


galerkin_scores.defvjp(_scores_fwd, _scores_bwd)
