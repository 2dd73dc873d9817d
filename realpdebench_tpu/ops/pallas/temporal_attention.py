"""Fused temporal attention Pallas kernel (TPU) for the video U-Net.

The reference U-Net attends over the T axis independently at every spatial
site (`realpdebench/model/unet.py:280-356`): sequence length T <= 40 with
head dim 32 and S = H*W sites as pure batch. As XLA batched matmuls these
are [T, d] @ [d, T] with batch B*S*h ~ 10^5 — the MXU pads both T=20 and
d=32 to 128-tiles, sustaining <0.3 TFLOP/s (~20 ms per full-res attention
on a v5e for 2.5 GFLOP of math).

TPU-native design:

  * kernel IO stays in the network's native token layout [B, S, T, h*d]
    (the qkv Dense output) — an earlier variant with XLA-side transposes
    to a site-minor layout made the kernel fast but poisoned XLA's layout
    assignment for every neighboring convolution (conv wgrad 58 ms →
    1.3 s/step); with native IO the custom call's required layout IS the
    natural one and the rest of the graph is unaffected;
  * each [128-site, T, h*d] block is re-oriented in-kernel via ONE free
    reshape + 2-D transpose of the flattened view ([R, T*F] → [T*F, R]),
    putting sites on the 128 lanes;
  * per head, the tiny-T attention runs on the VPU: scores are a
    broadcast multiply + sublane reduction over d, softmax runs on the
    [T_i, T_j, 128] block in VMEM, and the value mix is a broadcast
    multiply + major-axis reduction — no MXU, no tile padding;
  * the backward kernel recomputes the attention weights (cheaper than
    round-tripping [*, T, T, S] probabilities through HBM) and emits dq,
    dk, dv in the same native layout plus a position-bias cotangent
    accumulated over the whole grid (single resident [h, T, T] block).

The Python loops over T and heads unroll at trace time, so the kernel is
straight-line VPU code. Parity is locked against a pure-jnp oracle in
interpret mode (tests/test_pallas_temporal_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 128  # sites per block (= lane width)
_CP = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _to_site_heads(z_ref, T, h, d):
    """[1, R, T, F] block → list of per-head [T, d, R] f32 tensors via one
    free reshape + one 2-D transpose of the flattened view."""
    z = z_ref[0]
    zt = z.reshape(_R, T * h * d).T            # [T*F, R]
    z4 = zt.reshape(T, h, d, _R)
    return [z4[:, hh].astype(jnp.float32) for hh in range(h)]


def _attn_weights(q, k, pb_h, T):
    """Scores + softmax for one head; q/k [T, d, R], pb_h [T, T]."""
    sims = []
    for i in range(T):
        sim_i = jnp.sum(q[i][None] * k, axis=1)     # [T_j, R]
        sims.append(sim_i + pb_h[i][:, None])       # lane-broadcast bias
    sim = jnp.stack(sims, axis=0)                   # [T_i, T_j, R]
    m = jnp.max(sim, axis=1, keepdims=True)
    e = jnp.exp(sim - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _ta_fwd_kernel(q_ref, k_ref, v_ref, pb_ref, o_ref, *, T, h, d):
    qs = _to_site_heads(q_ref, T, h, d)
    ks = _to_site_heads(k_ref, T, h, d)
    vs = _to_site_heads(v_ref, T, h, d)
    pb = pb_ref[...]                                # [h, T, T] f32
    outs_h = []
    for hh in range(h):
        a = _attn_weights(qs[hh], ks[hh], pb[hh], T)
        outs = [jnp.sum(a[i][:, None, :] * vs[hh], axis=0) for i in range(T)]
        outs_h.append(jnp.stack(outs, axis=0))      # [T, d, R]
    o = jnp.stack(outs_h, axis=1)                   # [T, h, d, R]
    o_ref[0] = o.reshape(T * h * d, _R).T.reshape(
        _R, T, h * d).astype(o_ref.dtype)


def _ta_bwd_kernel(q_ref, k_ref, v_ref, pb_ref, do_ref,
                   dq_ref, dk_ref, dv_ref, dpb_ref, *, T, h, d):
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    qs = _to_site_heads(q_ref, T, h, d)
    ks = _to_site_heads(k_ref, T, h, d)
    vs = _to_site_heads(v_ref, T, h, d)
    dos = _to_site_heads(do_ref, T, h, d)
    pb = pb_ref[...]

    dq_h, dk_h, dv_h, dpb_rows = [], [], [], []
    for hh in range(h):
        q, k, v, do = qs[hh], ks[hh], vs[hh], dos[hh]
        a = _attn_weights(q, k, pb[hh], T)          # recomputed
        dq_rows, dpb_i = [], []
        dk_acc = jnp.zeros_like(k)
        dv_acc = jnp.zeros_like(v)
        for i in range(T):
            a_i = a[i]                              # [T_j, R]
            da_i = jnp.sum(do[i][None] * v, axis=1)
            dot_i = jnp.sum(a_i * da_i, axis=0, keepdims=True)
            dsim_i = a_i * (da_i - dot_i)
            dq_rows.append(jnp.sum(dsim_i[:, None, :] * k, axis=0))
            dk_acc = dk_acc + dsim_i[:, None, :] * q[i][None]
            dv_acc = dv_acc + a_i[:, None, :] * do[i][None]
            dpb_i.append(jnp.sum(dsim_i, axis=-1))  # [T_j] lane reduce
        dq_h.append(jnp.stack(dq_rows, axis=0))
        dk_h.append(dk_acc)
        dv_h.append(dv_acc)
        dpb_rows.append(jnp.stack(dpb_i, axis=0))   # [T_i, T_j]

    def pack(parts):
        z = jnp.stack(parts, axis=1)                # [T, h, d, R]
        return z.reshape(T * h * d, _R).T.reshape(_R, T, h * d)

    dq_ref[0] = pack(dq_h).astype(dq_ref.dtype)
    dk_ref[0] = pack(dk_h).astype(dk_ref.dtype)
    dv_ref[0] = pack(dv_h).astype(dv_ref.dtype)
    dpb = jnp.stack(dpb_rows, axis=0)               # [h, T, T]

    @pl.when(first)
    def _():
        dpb_ref[...] = jnp.zeros_like(dpb_ref)

    dpb_ref[...] = dpb_ref[...] + dpb


@functools.lru_cache(maxsize=64)
def _ta_calls(B: int, S: int, T: int, h: int, d: int, interpret: bool,
              dtype_str: str):
    dt = jnp.dtype(dtype_str)
    F = h * d
    kw = dict(T=T, h=h, d=d)
    blk = pl.BlockSpec((1, _R, T, F), lambda b, s: (b, s, 0, 0),
                       memory_space=pltpu.VMEM)
    pbs = pl.BlockSpec(memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((h, T, T), lambda b, s: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    fwd = pl.pallas_call(
        functools.partial(_ta_fwd_kernel, **kw),
        grid=(B, S // _R),
        in_specs=[blk, blk, blk, pbs],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, S, T, F), dt),
        interpret=interpret, compiler_params=_CP,
    )
    bwd = pl.pallas_call(
        functools.partial(_ta_bwd_kernel, **kw),
        grid=(B, S // _R),
        in_specs=[blk, blk, blk, pbs, blk],
        out_specs=(blk, blk, blk, acc),
        out_shape=(jax.ShapeDtypeStruct((B, S, T, F), dt),
                   jax.ShapeDtypeStruct((B, S, T, F), dt),
                   jax.ShapeDtypeStruct((B, S, T, F), dt),
                   jax.ShapeDtypeStruct((h, T, T), jnp.float32)),
        interpret=interpret, compiler_params=_CP,
    )
    return fwd, bwd


@functools.lru_cache(maxsize=64)
def _make_op(B: int, S: int, T: int, h: int, d: int, interpret: bool,
             dtype_str: str):
    fwd_call, bwd_call = _ta_calls(B, S, T, h, d, interpret, dtype_str)

    @jax.custom_vjp
    def op(q, k, v, pb):
        return fwd_call(q, k, v, pb)

    def op_f(q, k, v, pb):
        return fwd_call(q, k, v, pb), (q, k, v, pb)

    def op_b(res, do):
        q, k, v, pb = res
        return bwd_call(q, k, v, pb, do)
    op.defvjp(op_f, op_b)
    return op


def temporal_attention_tokens(q, k, v, pos_bias, heads, *, interpret=False):
    """Softmax attention over T per spatial site, native token layout.

    Args:
      q, k, v: [B, S, T, h*d] (the qkv Dense layout); S % 128 == 0.
        q arrives pre-scaled and rotary-embedded.
      pos_bias: [h, T, T] f32 relative-position bias.
      heads: number of heads h.
    Returns: [B, S, T, h*d] attention output.
    """
    B, S, T, F = q.shape
    h = heads
    assert F % h == 0 and S % _R == 0
    op = _make_op(B, S, T, h, F // h, interpret, str(q.dtype))
    return op(q, k, v, pos_bias.astype(jnp.float32))


def supported(S: int) -> bool:
    """The kernel requires the site count to tile the 128 lanes and a TPU.

    ``REALPDEBENCH_TEMPORAL_ATTN=off`` forces the einsum path (A/B perf
    comparisons on hardware)."""
    import os

    raw = os.environ.get("REALPDEBENCH_TEMPORAL_ATTN")
    if raw is not None and raw.lower() in ("off", "0", "false", "no"):
        return False
    if S % _R != 0:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def reference_temporal_attention_tokens(q, k, v, pos_bias, heads):
    """Pure-jnp oracle with identical semantics (tests + fallback)."""
    B, S, T, F = q.shape
    h, d = heads, F // heads
    spl = lambda z: z.reshape(B, S, T, h, d).astype(jnp.float32)
    qf, kf, vf = spl(q), spl(k), spl(v)
    sim = jnp.einsum("bsihd,bsjhd->bshij", qf, kf) + pos_bias
    sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bshij,bsjhd->bsihd", attn, vf)
    return out.reshape(B, S, T, F).astype(q.dtype)
