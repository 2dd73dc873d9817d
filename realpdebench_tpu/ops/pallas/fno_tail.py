"""Fused FNO tail + loss Pallas kernel (TPU).

The reference head/tail (`realpdebench/model/fno.py:121-133` + the MSE train
loss in `realpdebench/train.py:321-343`) is ``pred = fc2(gelu(fc1(crop(z))));
loss = mse(pred, y)``. In XLA that region is HBM-glue at headline scale: the
fc1 activation ([BT, H·J, 256] ≈ 1.3 GB bf16 at bs32) makes a full round
trip, and the 6-lane prediction tensor tile-pads its minor dim to 128 lanes
in HBM (≈21× write amplification) before the loss reduces it — the round-4
trace attributed ~22 ms/step to this family.

TPU-native design (round-4 NOTES "Fused-tail kernel considered and
deferred", now landed):

  * ONE forward kernel (K3F) per grid block reads the last fused layer's
    pre-BN activations ``s`` ([B·Tp, Hr·Jr, 2C], the aligned packed-lane
    layout of ops/pallas/fno_layer.py), applies the folded final-BN-affine
    fc1 ``k1bd`` + GELU + fc2 ``k2bd`` entirely in VMEM, and accumulates the
    sum of squared errors against the target — the fc1 activation and the
    prediction tensor never exist in HBM;
  * the target ``y`` is stored LANE-MAJOR ([B·Tp, F2p, Hr·Jr], F2p = the
    2·out_features packed lanes rounded up to 8 sublanes) so its HBM
    footprint is ~1× instead of the 21× a [*, 6]-minor layout pays; the
    in-kernel transpose back to row-major is an MXU dim0-contraction against
    an identity (a "selection GEMM", ~0.7 MFLOP — Mosaic relayouts of
    non-8-multiple shapes are the slow path, dots are not);
  * invalid rows (alignment padding h >= H, j >= J0, and end-padding
    t >= T) are masked out of the loss and of every gradient;
  * backward (K3B) recomputes the forward from ``s`` (one extra GEMM pass —
    cheap next to the saved HBM round trips) and emits the ``ds`` cotangent
    plus k1/b1/k2/b2 gradient accumulators in one pass; the whole tail+loss
    is a single ``custom_vjp`` returning the raw SSE scalar.

BN-affine, block-diagonal packing, and the bias folds happen in XLA outside
the custom_vjp boundary, so autodiff produces the BN scale/bias and raw
fc1/fc2 parameter gradients from the kernel's dk1bd/db1/dk2/db2.

Math parity: identical contractions to the unfused tail (models/fno.py
_fused_forward), with f32 accumulation on the MXU (the unfused bf16 einsum
path accumulates in bf16 — the kernel is slightly *more* accurate).
Golden-tested against the unfused path in tests/test_pallas_fno_tail.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realpdebench_tpu.ops.pallas.fno_layer import (
    _COMPILER_PARAMS,
    _acc,
    _act,
    _act_grad,
    _blk,
    _dot,
    _full,
)


def _valid_masks(i, kk, T, Tp, rowmask_ref):
    """Per-row-image validity [kk, R, 1]: (h < H, j < J0) rows × (t < T)."""
    bt0 = i * kk
    tidx = jax.lax.rem(
        bt0 + jax.lax.broadcasted_iota(jnp.int32, (kk, 1, 1), 0), Tp)
    tfac = (tidx < T).astype(jnp.float32)
    return rowmask_ref[:][None] * tfac


def _k3f_kernel(s_ref, y_ref, k1_ref, b1_ref, k2_ref, b2_ref,
                rowmask, eyeF, sse_ref, *, T, Tp, act, mxu, kk):
    dot = lambda a, b, c: _dot(a, b, c, mxu)
    i = pl.program_id(0)
    R, C2 = s_ref.shape[1], s_ref.shape[2]
    F2p = y_ref.shape[1]
    mask3 = _valid_masks(i, kk, T, Tp, rowmask)
    # mask s on read: alignment-padding rows carry pointwise-branch garbage
    # (finite, but a bf16 inf there would turn masked diffs into NaN)
    zm = (s_ref[...].astype(jnp.float32) * mask3).reshape(kk * R, C2)
    h1 = _act(dot(zm, k1_ref[:], (((1,), (0,)))) + b1_ref[:], act)
    o = dot(h1, k2_ref[:], (((1,), (0,)))) + b2_ref[:]     # [kk*R, F2p]
    # lane-major y block → row-major via MXU dim0-contraction (per row-image;
    # kk is a small unrolled loop — Mosaic relayouts of (F2p, R) shapes with
    # R not a multiple of 128 are the slow path, dots are not)
    o3 = o.reshape(kk, R, F2p)
    part = jnp.zeros((1, F2p), jnp.float32)
    for k in range(kk):
        yT = _dot(y_ref[k], eyeF[:], (((0,), (0,))))        # [R, F2p]
        diff = (o3[k] - yT) * mask3[k]
        part = part + jnp.sum(diff * diff, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        sse_ref[...] = jnp.zeros_like(sse_ref)

    sse_ref[...] = sse_ref[...] + part


def _k3b_kernel(s_ref, y_ref, k1_ref, b1_ref, k2_ref, b2_ref, k1t_ref,
                k2t_ref, g_ref, rowmask, eyeF,
                ds_ref, dk1_ref, db1_ref, dk2_ref, db2_ref,
                *, T, Tp, act, mxu, kk):
    dot = lambda a, b, c: _dot(a, b, c, mxu)
    i = pl.program_id(0)
    R, C2 = s_ref.shape[1], s_ref.shape[2]
    F2p = y_ref.shape[1]
    mask3 = _valid_masks(i, kk, T, Tp, rowmask)
    zm = (s_ref[...].astype(jnp.float32) * mask3).reshape(kk * R, C2)
    u1 = dot(zm, k1_ref[:], (((1,), (0,)))) + b1_ref[:]
    h1 = _act(u1, act)
    o3 = (dot(h1, k2_ref[:], (((1,), (0,)))) + b2_ref[:]).reshape(kk, R, F2p)
    g = g_ref[0, 0]                                        # scalar dL/dSSE
    rows = []
    for k in range(kk):
        yT = _dot(y_ref[k], eyeF[:], (((0,), (0,))))
        rows.append(((o3[k] - yT) * mask3[k])[None])
    do = (2.0 * g) * jnp.concatenate(rows, axis=0).reshape(kk * R, F2p)
    dh1 = dot(do, k2t_ref[:], (((1,), (0,))))              # [kk*R, 256]
    du = dh1 * _act_grad(u1, act)
    dz = dot(du, k1t_ref[:], (((1,), (0,))))               # [kk*R, C2]
    # do/du are zero at invalid rows (mask3 via diff), so dz needs no mask
    ds_ref[...] = dz.reshape(kk, R, C2).astype(ds_ref.dtype)
    dk1 = dot(zm, du, (((0,), (0,))))                      # [C2, 256]
    dk2 = dot(h1, do, (((0,), (0,))))                      # [256, F2p]
    db1 = jnp.sum(du, axis=0, keepdims=True)
    db2 = jnp.sum(do, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dk1_ref[...] = jnp.zeros_like(dk1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dk2_ref[...] = jnp.zeros_like(dk2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dk1_ref[...] = dk1_ref[...] + dk1
    db1_ref[...] = db1_ref[...] + db1
    dk2_ref[...] = dk2_ref[...] + dk2
    db2_ref[...] = db2_ref[...] + db2


def _tail_kk(BT: int) -> int:
    """BT row-images per grid block. VMEM-conservative default 2 (the
    backward's scoped stack is ~27 MB per row-image); env-tunable."""
    import os

    want = 2
    env = os.environ.get("REALPDEBENCH_FNO_TAILBLK")
    if env:
        try:
            want = max(1, int(env))
        except ValueError:
            import warnings

            warnings.warn(
                f"REALPDEBENCH_FNO_TAILBLK={env!r} is not an int; using 2")
    # K3B's scoped stack is ~27 MB per row-image vs the 100 MB vmem cap
    # (_COMPILER_PARAMS); kk>=4 fails at compile with a Mosaic error far
    # from this env var, so clamp here with a visible warning.
    if want > 3:
        import warnings

        warnings.warn(
            f"REALPDEBENCH_FNO_TAILBLK={want} exceeds the ~3 row-image "
            "scoped-VMEM budget (27 MB each vs the 100 MB cap); clamping to 3")
        want = 3
    k = min(want, BT)
    while BT % k:
        k -= 1
    return k


@functools.lru_cache(maxsize=16)
def _make_tail(B: int, Tp: int, T: int, R: int, C2: int, F2p: int, H1: int,
               act: str, interpret: bool, s_dtype_str: str, kk: int,
               Hr: int, Jr: int, H: int, J0: int):
    """One fused tail+loss as a single custom_vjp: SSE = K3F(s, y, weights);
    backward = K3B. ``H1`` = fc1 width on packed lanes (2·128)."""
    BT = B * Tp
    s_dtype = jnp.dtype(s_dtype_str)
    mxu = jnp.bfloat16 if s_dtype == jnp.bfloat16 else None
    rows = np.arange(R)
    rowmask = (((rows // Jr) < H) & ((rows % Jr) < J0)).astype(
        np.float32)[:, None]
    eyeF = np.eye(F2p, dtype=np.float32)
    kw = dict(T=T, Tp=Tp, act=act, mxu=mxu, kk=kk)
    cp = dict(interpret=interpret, compiler_params=_COMPILER_PARAMS)
    k3f = pl.pallas_call(
        functools.partial(_k3f_kernel, **kw),
        grid=(BT // kk,),
        in_specs=[_blk(kk, R, C2), _blk(kk, F2p, R)] + [_full()] * 6,
        out_specs=_acc(1, F2p),
        out_shape=jax.ShapeDtypeStruct((1, F2p), jnp.float32),
        **cp,
    )
    k3b = pl.pallas_call(
        functools.partial(_k3b_kernel, **kw),
        grid=(BT // kk,),
        in_specs=[_blk(kk, R, C2), _blk(kk, F2p, R)] + [_full()] * 9,
        out_specs=(_blk(kk, R, C2), _acc(C2, H1), _acc(1, H1),
                   _acc(H1, F2p), _acc(1, F2p)),
        out_shape=(jax.ShapeDtypeStruct((BT, R, C2), s_dtype),
                   jax.ShapeDtypeStruct((C2, H1), jnp.float32),
                   jax.ShapeDtypeStruct((1, H1), jnp.float32),
                   jax.ShapeDtypeStruct((H1, F2p), jnp.float32),
                   jax.ShapeDtypeStruct((1, F2p), jnp.float32)),
        **cp,
    )

    def _cast(w):
        return w.astype(jnp.float32)

    @jax.custom_vjp
    def tail_loss(s, y_lm, k1bd, b1t, k2p, b2p):
        sse = k3f(s, y_lm, _cast(k1bd), _cast(b1t), _cast(k2p), _cast(b2p),
                  rowmask, eyeF)
        return jnp.sum(sse)

    def tail_f(s, y_lm, k1bd, b1t, k2p, b2p):
        return tail_loss(s, y_lm, k1bd, b1t, k2p, b2p), (
            s, y_lm, k1bd, b1t, k2p, b2p)

    def tail_b(res, g):
        s, y_lm, k1bd, b1t, k2p, b2p = res
        g2 = jnp.asarray(g, jnp.float32).reshape(1, 1)
        ds, dk1, db1, dk2, db2 = k3b(
            s, y_lm, _cast(k1bd), _cast(b1t), _cast(k2p), _cast(b2p),
            _cast(k1bd).T, _cast(k2p).T, g2, rowmask, eyeF)
        # y is data, not a parameter: its zero cotangent is dead code the
        # moment the caller doesn't differentiate w.r.t. targets (XLA DCEs)
        return (ds, jnp.zeros_like(y_lm), dk1.astype(k1bd.dtype),
                db1.astype(b1t.dtype), dk2.astype(k2p.dtype),
                db2.astype(b2p.dtype))

    tail_loss.defvjp(tail_f, tail_b)
    return tail_loss


def fused_tail_loss(s, y_lm, k1bd, b1t, k2p, b2p, *, dims, tail_dims, act,
                    interpret=False):
    """Fused crop+fc1+GELU+fc2+SSE on packed flat activations.

    Args:
      s: [B·Tp, Hr·Jr, 2C] pre-BN output of the last fused layer (the final
        BN affine must already be folded into ``k1bd``/``b1t``).
      y_lm: [B·Tp, F2p, Hr·Jr] lane-major packed target, ZERO at invalid
        rows (t >= T, h >= H, j >= J0). F2p = 2·out_features rounded up
        to a multiple of 8.
      k1bd: [2C, 256] block-diagonal fc1 kernel (BN affine folded).
      b1t: [1, 256] tiled fc1 bias (BN shift folded).
      k2p: [256, F2p] block-diagonal fc2 kernel, zero-padded to F2p lanes.
      b2p: [1, F2p] tiled fc2 bias, zero-padded.
      dims: (B, Tp, Hr, Jr, C) of the aligned activation layout.
      tail_dims: (T, H, J0) true data extent (crop target).
      act: GELU variant for fc1 ('tanh' | 'exact').
    Returns: scalar SSE over the valid region, f32. Divide by the element
      count for the reference MSE.
    """
    B, Tp, Hr, Jr, C = dims
    T, H, J0 = tail_dims
    R, C2 = Hr * Jr, 2 * C
    F2p, H1 = y_lm.shape[1], k1bd.shape[1]
    kk = _tail_kk(B * Tp)
    tail = _make_tail(B, Tp, T, R, C2, F2p, H1, act, interpret,
                      str(s.dtype), kk, Hr, Jr, H, J0)
    return tail(s, y_lm, k1bd, b1t, k2p, b2p)


def pack_target_lane_major(y, *, B, T, H, W, c_out, mult, Tp, Hr, Jr):
    """[B, T·mult, H, W, c_out] target → [B·Tp, F2p, Hr·Jr] lane-major packed
    layout matching the kernel's s rows, zero at invalid rows.

    Inverse of FNO3d's time-interleaved output permutation (reference
    fno.py:131-133), then the (w-parity, channel) lane packing of
    ops/pallas/fno_layer.flatten_cw."""
    J0, F = W // 2, c_out * mult
    F2 = 2 * F
    F2p = -(-F2 // 8) * 8
    y6 = y.reshape(B, T, mult, H, W, c_out)
    yx = jnp.transpose(y6, (0, 1, 3, 4, 5, 2)).reshape(B, T, H, J0, F2)
    y4p = jnp.pad(
        yx, ((0, 0), (0, Tp - T), (0, Hr - H), (0, Jr - J0), (0, 0)))
    y_lm = jnp.transpose(y4p, (0, 1, 4, 2, 3)).reshape(
        B * Tp, F2, Hr * Jr)
    return jnp.pad(y_lm, ((0, 0), (0, F2p - F2), (0, 0)))
