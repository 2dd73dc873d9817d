"""Fused FNO-layer Pallas kernels (TPU), Cooley–Tukey packed-lane design.

One reference FNO layer (`realpdebench/model/fno.py:105-133`) is
``s = SpectralConv3d(z) + Conv1x1(z); z' = GELU(BN(s))``. The round-1
profile showed XLA's lowering is HBM-bound: no dimension of the
(B,T,H,W,C) activations is (8,128)-tile-friendly (C=64, W=134, H=70), so
every materialized tensor tile-pads ~2x, and BatchNorm forces full-size
elementwise round-trips.

TPU-native design (v2 — shaped by empirical Mosaic-support probing on this
toolchain: tile-aligned lane splits/merges and sublane reshapes are free,
arbitrary lane reshapes are unsupported, dots may contract dim1-of-3D /
minormost / dim0-of-2D only, and 3-D rhs operands are unsupported):

  * activations live flat as ``[B*T_pad, H_pad*67, 128]`` with lanes packed
    as (w-parity, channel): element (h, w=2j+p, c) ↦ [bt, h*67+j, p*64+c].
    For the cylinder benchmark this layout has ~zero tile padding;
  * the W-axis DFT is computed Cooley–Tukey style: ONE dot over the
    w-pair axis j against the half-length DFT matrix (the 128 packed lanes
    ride through as a free dimension), then a cheap twiddle combine of the
    two parities on the small truncated spectrum — no big-tensor slices;
  * the BN affine + GELU of the *previous* layer is folded into this
    layer's kernels: the stored tensor is always the pre-BN ``s`` and both
    consumers recompute ``z = gelu(a*s + b)`` on the fly — normalized
    activations are never written to HBM;
  * the pointwise 1x1 conv runs as ONE dot against a block-diagonal
    ``[[Wp,0],[0,Wp]]`` 128x128 matrix, so the packed lanes never split;
  * kernel K1 = affine+gelu + truncated forward (W, H) DFT; the tiny
    T-DFT + 4-corner weight mixing + inverse T runs in plain XLA between
    the kernels (autodiff covers the spectral-weight gradients); kernel
    K2 = inverse (H, W) DFT + pointwise + add + BN statistics;
  * both kernels carry hand-written ``custom_vjp`` backward kernels with
    the same single-pass structure (BN-statistic cotangents fold into the
    K2 backward's elementwise chain).

The math is identical to ops/spectral.py's truncated-DFT path (exact to
float rounding); golden tests compare against it in interpret mode.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realpdebench_tpu.ops.spectral import _dft_factors

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
_GELU_C = 0.044715


def _act(u, variant: str):
    """GELU forward. `tanh` matches jax.nn.gelu(approximate=True) (the TPU
    default in ops/activations.py); `exact` is the erf form; `none` is
    identity (the first layer has no preceding BN/GELU)."""
    if variant == "none":
        return u
    if variant == "tanh":
        inner = _SQRT_2_OVER_PI * (u + _GELU_C * u * u * u)
        return 0.5 * u * (1.0 + jnp.tanh(inner))
    if variant == "exact":
        return 0.5 * u * (1.0 + jax.lax.erf(u / math.sqrt(2.0)))
    raise ValueError(variant)


def _act_grad(u, variant: str):
    """d GELU / du, analytically."""
    if variant == "none":
        return jnp.ones_like(u)
    if variant == "tanh":
        inner = _SQRT_2_OVER_PI * (u + _GELU_C * u * u * u)
        t = jnp.tanh(inner)
        dinner = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * u * u)
        return 0.5 * (1.0 + t) + 0.5 * u * (1.0 - t * t) * dinner
    if variant == "exact":
        phi = jnp.exp(-0.5 * u * u) / math.sqrt(2.0 * math.pi)
        Phi = 0.5 * (1.0 + jax.lax.erf(u / math.sqrt(2.0)))
        return Phi + u * phi
    raise ValueError(variant)


@functools.lru_cache(maxsize=32)
def _ct_consts(Hp: int, Wp: int, m2: int, m3: int):
    """Cooley–Tukey factor matrices (f32 numpy), all kernel-ready:

      E67  [J, 2m3]   half-length forward DFT over w-pairs, [cos | -sin]
      twR/twI [1, m3] forward twiddles e^{-2πi m / Wp}
      EhR/EhI [Hp, 2m2]   forward H DFT
      EhRT/EhIT [2m2, Hp] their transposes (K1 backward)
      IhR/IhI [2m2, Hp]   inverse H
      IhRT/IhIT [Hp, 2m2] their transposes (K2 backward)
      IwRE/IwRO/IwIE/IwIO [m3, J]  inverse rfft-axis matrices split by
                                   output-column parity (Hermitian-doubled)
      and their transposes [J, m3] for the K2 backward.
    """
    assert Wp % 2 == 0, "packed-lane kernels require an even padded W"
    J = Wp // 2
    assert m3 <= J, "kept W modes must fit the half-length DFT"
    _Ew, Eh, _Et, _It, Ih, Iw_re, Iw_im = _dft_factors(8, Hp, Wp, 2, m2, m3)

    jj = np.arange(J)[:, None]
    mm = np.arange(m3)[None, :]
    theta = 2 * np.pi * jj * mm / J
    E67 = np.concatenate([np.cos(theta), -np.sin(theta)], axis=1)
    tw = np.exp(-2j * np.pi * np.arange(m3) / Wp)

    c = dict(
        E67=E67.astype(np.float32),
        twR=tw.real.astype(np.float32)[None],
        twI=tw.imag.astype(np.float32)[None],
        EhR=np.ascontiguousarray(Eh.real.astype(np.float32)),
        EhI=np.ascontiguousarray(Eh.imag.astype(np.float32)),
        EhRT=np.ascontiguousarray(Eh.real.T.astype(np.float32)),
        EhIT=np.ascontiguousarray(Eh.imag.T.astype(np.float32)),
        IhR=np.ascontiguousarray(Ih.real.astype(np.float32)),
        IhI=np.ascontiguousarray(Ih.imag.astype(np.float32)),
        IhRT=np.ascontiguousarray(Ih.real.T.astype(np.float32)),
        IhIT=np.ascontiguousarray(Ih.imag.T.astype(np.float32)),
        IwRE=np.ascontiguousarray(Iw_re[:, 0::2]),
        IwRO=np.ascontiguousarray(Iw_re[:, 1::2]),
        IwIE=np.ascontiguousarray(Iw_im[:, 0::2]),
        IwIO=np.ascontiguousarray(Iw_im[:, 1::2]),
    )
    c.update(
        IwRET=np.ascontiguousarray(c["IwRE"].T),
        IwROT=np.ascontiguousarray(c["IwRO"].T),
        IwIET=np.ascontiguousarray(c["IwIE"].T),
        IwIOT=np.ascontiguousarray(c["IwIO"].T),
    )
    return c


def _dot(a, b, contract, lowp=False):
    """MXU dot with f32 accumulation. ``lowp`` casts operands to bf16
    (native MXU speed; the unfused bf16 DFT path validated the accuracy in
    round 1) — used when the layer stores bf16 activations."""
    if lowp:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _row_bcast(x3, row, op):
    """Apply per-lane row vectors to a 3-D value via a flat 2-D view
    (Mosaic rejects [1,1,L] broadcasts onto 3-D; sublane merges are free)."""
    A, B, L = x3.shape
    flat = op(x3.reshape(A * B, L), row)
    return flat.reshape(A, B, L)


# ---------------------------------------------------------------------------
# K1: affine + gelu + truncated forward (W, H) DFT
# ---------------------------------------------------------------------------


def _k1_kernel(x_ref, a2_ref, b2_ref, e67, twr, twi, ehr, ehi,
               y_ref, *, Hp, J, C2, m3, act, lowp):
    dot = functools.partial(_dot, lowp=lowp)
    xm = x_ref[0].astype(jnp.float32)              # [R, 128]
    um = xm * a2_ref[:] + b2_ref[:]
    zm = _act(um, act)
    z3 = zm.reshape(Hp, J, C2)                     # sublane split (free)
    # Cooley–Tukey W stage: one dot over the pair axis j; packed (p, c)
    # lanes ride through as a free dimension
    S = dot(z3, e67[:], (((1,), (0,))))           # [Hp, C2, 2m3]
    C = C2 // 2
    SEr, SEi = S[:, :C, :m3], S[:, :C, m3:]
    SOr, SOi = S[:, C:, :m3], S[:, C:, m3:]
    twr_ = twr[:]
    twi_ = twi[:]
    Xr = SEr + _row_bcast(SOr, twr_, jnp.multiply) - _row_bcast(
        SOi, twi_, jnp.multiply)
    Xi = SEi + _row_bcast(SOi, twr_, jnp.multiply) + _row_bcast(
        SOr, twi_, jnp.multiply)
    # H stage (contract Hp): transpose the small spectrum to put Hp minor
    XrT = Xr.transpose(1, 2, 0)                    # [C, m3, Hp]
    XiT = Xi.transpose(1, 2, 0)
    yR = dot(XrT, ehr[:], (((2,), (0,)))) - dot(XiT, ehi[:], (((2,), (0,))))
    yI = dot(XrT, ehi[:], (((2,), (0,)))) + dot(XiT, ehr[:], (((2,), (0,))))
    # pack [C, m3, 2m2] → sublanes (j2, m), lanes (ri, c)
    m2x2 = yR.shape[2]
    yRp = yR.transpose(2, 1, 0).reshape(m2x2 * m3, C)
    yIp = yI.transpose(2, 1, 0).reshape(m2x2 * m3, C)
    y_ref[0] = jnp.concatenate([yRp, yIp], axis=1)  # [2m2*m3, 2C]


def _k1_bwd_kernel(x_ref, a2_ref, b2_ref, dy_ref,
                   e67, twr, twi, ehrt, ehit,
                   dx_ref, dab_ref, *, Hp, J, C2, m3, act, lowp):
    dot = functools.partial(_dot, lowp=lowp)
    i = pl.program_id(0)
    C = C2 // 2
    dy = dy_ref[0]                                 # [2m2*m3, 2C]
    m2x2 = dy.shape[0] // m3
    dyR = dy[:, :C].reshape(m2x2, m3, C).transpose(2, 1, 0)  # [C, m3, 2m2]
    dyI = dy[:, C:].reshape(m2x2, m3, C).transpose(2, 1, 0)
    # adjoint H stage
    dXrT = dot(dyR, ehrt[:], (((2,), (0,)))) + dot(dyI, ehit[:],
                                                     (((2,), (0,))))
    dXiT = dot(dyI, ehrt[:], (((2,), (0,)))) - dot(dyR, ehit[:],
                                                     (((2,), (0,))))
    dXr = dXrT.transpose(2, 0, 1)                  # [Hp, C, m3]
    dXi = dXiT.transpose(2, 0, 1)
    # adjoint twiddle combine
    twr_ = twr[:]
    twi_ = twi[:]
    dSOr = _row_bcast(dXr, twr_, jnp.multiply) + _row_bcast(
        dXi, twi_, jnp.multiply)
    dSOi = _row_bcast(dXi, twr_, jnp.multiply) - _row_bcast(
        dXr, twi_, jnp.multiply)
    dSE = jnp.concatenate([dXr, dXi], axis=2)      # [Hp, C, 2m3]
    dSO = jnp.concatenate([dSOr, dSOi], axis=2)
    dS = jnp.concatenate([dSE, dSO], axis=1)       # [Hp, C2, 2m3]
    # adjoint W stage: dz3[h, j, l] = Σ_m dS[h, l, m] E67[j, m]
    dz3 = dot(dS, e67[:], (((2,), (1,))))         # [Hp, C2, J]
    dz3 = dz3.transpose(0, 2, 1)                   # [Hp, J, C2] (big)
    dz = dz3.reshape(Hp * J, C2)
    xm = x_ref[0].astype(jnp.float32)
    um = xm * a2_ref[:] + b2_ref[:]
    du = dz * _act_grad(um, act)
    dx_ref[0] = (du * a2_ref[:]).astype(dx_ref.dtype)
    part = jnp.concatenate(
        [jnp.sum(du * xm, axis=0, keepdims=True),
         jnp.sum(du, axis=0, keepdims=True)], axis=0)   # [2, 128]

    @pl.when(i == 0)
    def _():
        dab_ref[...] = jnp.zeros_like(dab_ref)

    dab_ref[...] = dab_ref[...] + part


# ---------------------------------------------------------------------------
# K2: inverse (H, W) DFT + pointwise mixing + add + BN statistics
# ---------------------------------------------------------------------------


def _k2_kernel(g_ref, x_ref, a2_ref, b2_ref, wp2_ref, bp2_ref,
               ihr, ihi, iwre, iwro, iwie, iwio, selET, selOT,
               s_ref, stats_ref, *, Hp, J, C2, m3, act, lowp):
    dot = functools.partial(_dot, lowp=lowp)
    i = pl.program_id(0)
    C = C2 // 2
    g = g_ref[0]                                   # [2m2*m3, 2C]
    m2x2 = g.shape[0] // m3
    gRT = g[:, :C].reshape(m2x2, m3, C).transpose(1, 2, 0)  # [m3, C, 2m2]
    gIT = g[:, C:].reshape(m2x2, m3, C).transpose(1, 2, 0)
    # inverse H (contract 2m2)
    ihR = dot(gRT, ihr[:], (((2,), (0,)))) - dot(gIT, ihi[:],
                                                   (((2,), (0,))))
    ihI = dot(gIT, ihr[:], (((2,), (0,)))) + dot(gRT, ihi[:],
                                                   (((2,), (0,))))
    ihRT = ihR.transpose(2, 1, 0)                  # [Hp, C, m3]
    ihIT = ihI.transpose(2, 1, 0)
    # inverse W per output parity (Hermitian-doubled real projection)
    yE = dot(ihRT, iwre[:], (((2,), (0,)))) + dot(ihIT, iwie[:],
                                                    (((2,), (0,))))
    yO = dot(ihRT, iwro[:], (((2,), (0,)))) + dot(ihIT, iwio[:],
                                                    (((2,), (0,))))
    yEt = yE.transpose(0, 2, 1)                    # [Hp, J, C] (cheap)
    yOt = yO.transpose(0, 2, 1)
    # big lane concats cost ~8 us/block on this Mosaic (measured); selection
    # GEMMs against [I|0]/[0|I] run on the MXU at ~0.3 us instead. These stay
    # f32: Mosaic can't bf16-cast [Hp, J, C] (2nd-minor 67 unaligned, lanes
    # 64 < 128 — probed on this toolchain)
    y3 = _dot(yEt, selET[:], (((2,), (0,)))) + _dot(
        yOt, selOT[:], (((2,), (0,))))             # [Hp, J, C2]
    # pointwise via the block-diagonal [[Wp,0],[0,Wp]] matrix: packed lanes
    # never split
    xm = x_ref[0].astype(jnp.float32)
    um = xm * a2_ref[:] + b2_ref[:]
    zm = _act(um, act)
    z3 = zm.reshape(Hp, J, C2)
    zp3 = dot(z3, wp2_ref[:], (((2,), (0,))))     # [Hp, J, C2]
    s = y3.reshape(Hp * J, C2) + zp3.reshape(Hp * J, C2) + bp2_ref[:]
    s_ref[0] = s.astype(s_ref.dtype)
    part = jnp.concatenate(
        [jnp.sum(s, axis=0, keepdims=True),
         jnp.sum(s * s, axis=0, keepdims=True)], axis=0)  # [2, 128]

    @pl.when(i == 0)
    def _():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    stats_ref[...] = stats_ref[...] + part


def _k2_bwd_kernel(x_ref, a2_ref, b2_ref, wp2t_ref, s_ref, ds_ref,
                   ds1_ref, ds2_ref,
                   ihrt, ihit, iwret, iwrot, iwiet, iwiot, selE, selO,
                   dg_ref, dx_ref, dwp2_ref, dvec_ref,
                   *, Hp, J, C2, m3, act, lowp):
    dot = functools.partial(_dot, lowp=lowp)
    i = pl.program_id(0)
    C = C2 // 2
    sm = s_ref[0].astype(jnp.float32)              # [R, 128]
    dsm = ds_ref[0].astype(jnp.float32)
    ds_eff = dsm + ds1_ref[:] + 2.0 * sm * ds2_ref[:]
    dse3 = ds_eff.reshape(Hp, J, C2)
    # adjoint of the output packing: parity selection via GEMMs (big lane
    # slices cost ~8 us/block on this Mosaic; MXU selection is ~0.3 us)
    dyEt = dot(dse3, selE[:], (((2,), (0,))))     # [Hp, J, C]
    dyOt = dot(dse3, selO[:], (((2,), (0,))))
    dyE = dyEt.transpose(0, 2, 1)                  # [Hp, C, J] (cheap)
    dyO = dyOt.transpose(0, 2, 1)
    # adjoint inverse W
    dihRT = dot(dyE, iwret[:], (((2,), (0,)))) + dot(dyO, iwrot[:],
                                                       (((2,), (0,))))
    dihIT = dot(dyE, iwiet[:], (((2,), (0,)))) + dot(dyO, iwiot[:],
                                                       (((2,), (0,))))
    dihR = dihRT.transpose(2, 1, 0)                # [m3, C, Hp]
    dihI = dihIT.transpose(2, 1, 0)
    # adjoint inverse H
    dgRT = dot(dihR, ihrt[:], (((2,), (0,)))) + dot(dihI, ihit[:],
                                                      (((2,), (0,))))
    dgIT = dot(dihI, ihrt[:], (((2,), (0,)))) - dot(dihR, ihit[:],
                                                      (((2,), (0,))))
    m2x2 = dgRT.shape[2]
    dgR = dgRT.transpose(2, 0, 1).reshape(m2x2 * m3, C)
    dgI = dgIT.transpose(2, 0, 1).reshape(m2x2 * m3, C)
    dg_ref[0] = jnp.concatenate([dgR, dgI], axis=1)
    # pointwise adjoint through the block-diagonal matrix
    dz = dot(ds_eff, wp2t_ref[:], (((1,), (0,))))  # [R, 128]
    xm = x_ref[0].astype(jnp.float32)
    um = xm * a2_ref[:] + b2_ref[:]
    zm = _act(um, act)
    du = dz * _act_grad(um, act)
    dx_ref[0] = (du * a2_ref[:]).astype(dx_ref.dtype)
    dwp2 = dot(zm, ds_eff, (((0,), (0,))))        # [128, 128]
    dvec = jnp.concatenate(
        [jnp.sum(ds_eff, axis=0, keepdims=True),       # dbp2
         jnp.sum(du * xm, axis=0, keepdims=True),      # da2
         jnp.sum(du, axis=0, keepdims=True)], axis=0)  # db2

    @pl.when(i == 0)
    def _():
        dwp2_ref[...] = jnp.zeros_like(dwp2_ref)
        dvec_ref[...] = jnp.zeros_like(dvec_ref)

    dwp2_ref[...] = dwp2_ref[...] + dwp2
    dvec_ref[...] = dvec_ref[...] + dvec


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJPs
# ---------------------------------------------------------------------------


# the K2 backward's scoped stack peaks ~18.4MB (R=4690-row blocks), above
# the 16MB default scoped-vmem limit; v5e has 128MB VMEM, so raise it
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _full():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _blk(*shape):
    n = len(shape)
    return pl.BlockSpec((1, *shape), lambda i: tuple([i] + [0] * n),
                        memory_space=pltpu.VMEM)


def _acc(r, c):
    return pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _pack_affine(a, b, C):
    """[1, C] per-channel affine → [1, 2C] per-(parity, channel) lane rows."""
    return (jnp.concatenate([a, a], axis=1).astype(jnp.float32),
            jnp.concatenate([b, b], axis=1).astype(jnp.float32))


def _block_diag2(w):
    """[C, C] → [[w, 0], [0, w]] (2C x 2C)."""
    C = w.shape[0]
    z = jnp.zeros((C, C), w.dtype)
    return jnp.concatenate(
        [jnp.concatenate([w, z], axis=1), jnp.concatenate([z, w], axis=1)],
        axis=0)


@functools.lru_cache(maxsize=32)
def _k1_calls(BT: int, Hp: int, J: int, C2: int, m2: int, m3: int,
              act: str, interpret: bool, x_dtype_str: str):
    x_dtype = jnp.dtype(x_dtype_str)
    R, Y = Hp * J, 2 * m2 * m3
    # lowp bf16 dots measured SLOWER end-to-end on this Mosaic (cotangent
    # relayout costs exceed the MXU gain on these K=67/N=32 dots); keep f32
    kw = dict(Hp=Hp, J=J, C2=C2, m3=m3, act=act, lowp=False)
    fwd = pl.pallas_call(
        functools.partial(_k1_kernel, **kw),
        grid=(BT,),
        in_specs=[_blk(R, C2), _full(), _full()] + [_full()] * 5,
        out_specs=_blk(Y, C2),
        out_shape=jax.ShapeDtypeStruct((BT, Y, C2), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )
    bwd = pl.pallas_call(
        functools.partial(_k1_bwd_kernel, **kw),
        grid=(BT,),
        in_specs=[_blk(R, C2), _full(), _full(), _blk(Y, C2)]
        + [_full()] * 5,
        out_specs=(_blk(R, C2), _acc(2, C2)),
        out_shape=(jax.ShapeDtypeStruct((BT, R, C2), x_dtype),
                   jax.ShapeDtypeStruct((2, C2), jnp.float32)),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )
    return fwd, bwd


@functools.lru_cache(maxsize=32)
def _k2_calls(BT: int, Hp: int, J: int, C2: int, m2: int, m3: int,
              act: str, interpret: bool, x_dtype_str: str):
    x_dtype = jnp.dtype(x_dtype_str)
    R, Y = Hp * J, 2 * m2 * m3
    # lowp bf16 dots measured SLOWER end-to-end on this Mosaic (cotangent
    # relayout costs exceed the MXU gain on these K=67/N=32 dots); keep f32
    kw = dict(Hp=Hp, J=J, C2=C2, m3=m3, act=act, lowp=False)
    fwd = pl.pallas_call(
        functools.partial(_k2_kernel, **kw),
        grid=(BT,),
        in_specs=[_blk(Y, C2), _blk(R, C2), _full(), _full(), _full(),
                  _full()] + [_full()] * 8,
        out_specs=(_blk(R, C2), _acc(2, C2)),
        out_shape=(jax.ShapeDtypeStruct((BT, R, C2), x_dtype),
                   jax.ShapeDtypeStruct((2, C2), jnp.float32)),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )
    bwd = pl.pallas_call(
        functools.partial(_k2_bwd_kernel, **kw),
        grid=(BT,),
        in_specs=[_blk(R, C2), _full(), _full(), _full(),
                  _blk(R, C2), _blk(R, C2), _full(), _full()]
        + [_full()] * 8,
        out_specs=(_blk(Y, C2), _blk(R, C2), _acc(C2, C2), _acc(3, C2)),
        out_shape=(jax.ShapeDtypeStruct((BT, Y, C2), jnp.float32),
                   jax.ShapeDtypeStruct((BT, R, C2), x_dtype),
                   jax.ShapeDtypeStruct((C2, C2), jnp.float32),
                   jax.ShapeDtypeStruct((3, C2), jnp.float32)),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )
    return fwd, bwd


@functools.lru_cache(maxsize=32)
def _make_layer_ops(BT: int, Hp: int, J: int, C: int, m2: int, m3: int,
                    act: str, interpret: bool, x_dtype_str: str):
    """custom_vjp'd (k1, k2) closures for one static configuration."""
    C2 = 2 * C
    cst = _ct_consts(Hp, 2 * J, m2, m3)
    # closure constants stay NUMPY: this factory is lru_cached, so any
    # jnp.asarray here would capture a tracer from whichever jit trace ran
    # first and leak it into later traces
    as_j = lambda *names: tuple(cst[n] for n in names)
    k1_fwd_call, k1_bwd_call = _k1_calls(BT, Hp, J, C2, m2, m3, act,
                                         interpret, x_dtype_str)
    k2_fwd_call, k2_bwd_call = _k2_calls(BT, Hp, J, C2, m2, m3, act,
                                         interpret, x_dtype_str)
    k1_consts = as_j("E67", "twR", "twI", "EhR", "EhI")
    k1_bwd_consts = as_j("E67", "twR", "twI", "EhRT", "EhIT")
    eyeC = np.eye(C, dtype=np.float32)
    zC = np.zeros((C, C), np.float32)
    selE = np.concatenate([eyeC, zC], axis=0)   # [2C, C]
    selO = np.concatenate([zC, eyeC], axis=0)
    selET = np.concatenate([eyeC, zC], axis=1)  # [C, 2C]
    selOT = np.concatenate([zC, eyeC], axis=1)
    k2_consts = as_j("IhR", "IhI", "IwRE", "IwRO", "IwIE", "IwIO") + (
        selET, selOT)
    k2_bwd_consts = as_j("IhRT", "IhIT", "IwRET", "IwROT", "IwIET",
                         "IwIOT") + (selE, selO)

    def _k1_impl(x, a, b):
        a2, b2 = _pack_affine(a, b, C)
        return k1_fwd_call(x, a2, b2, *k1_consts)

    @jax.custom_vjp
    def k1(x, a, b):
        return _k1_impl(x, a, b)

    def k1_f(x, a, b):
        return _k1_impl(x, a, b), (x, a, b)

    def k1_b(res, dy):
        x, a, b = res
        a2, b2 = _pack_affine(a, b, C)
        dx, dab2 = k1_bwd_call(x, a2, b2, dy, *k1_bwd_consts)
        da2, db2 = dab2[0:1], dab2[1:2]
        return (dx, da2[:, :C] + da2[:, C:], db2[:, :C] + db2[:, C:])

    k1.defvjp(k1_f, k1_b)

    def _k2_impl(g, x, a, b, wp, bp):
        a2, b2 = _pack_affine(a, b, C)
        wp2 = _block_diag2(wp.astype(jnp.float32))
        bp2 = jnp.concatenate([bp, bp], axis=1).astype(jnp.float32)
        return k2_fwd_call(g, x, a2, b2, wp2, bp2, *k2_consts)

    @jax.custom_vjp
    def k2(g, x, a, b, wp, bp):
        return _k2_impl(g, x, a, b, wp, bp)

    def k2_f(g, x, a, b, wp, bp):
        s, stats = _k2_impl(g, x, a, b, wp, bp)
        return (s, stats), (x, a, b, wp, s)

    def k2_b(res, cot):
        x, a, b, wp, s = res
        ds, dstats = cot
        a2, b2 = _pack_affine(a, b, C)
        wp2t = _block_diag2(wp.astype(jnp.float32)).T
        dg, dx, dwp2, dvec = k2_bwd_call(
            x, a2, b2, wp2t, s, ds, dstats[0:1], dstats[1:2],
            *k2_bwd_consts)
        dwp = dwp2[:C, :C] + dwp2[C:, C:]
        fold = lambda r: r[:, :C] + r[:, C:]
        return (dg, dx, fold(dvec[1:2]), fold(dvec[2:3]), dwp,
                fold(dvec[0:1]))

    k2.defvjp(k2_f, k2_b)
    return k1, k2


# ---------------------------------------------------------------------------
# XLA mid-section: T-DFT + 4-corner weight mixing + inverse T (small tensors)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _t_consts(Tp: int, m1: int):
    _Ew, _Eh, Et, It, _Ih, _IwR, _IwI = _dft_factors(Tp, 8, 8, m1, 2, 2)
    return (np.ascontiguousarray(Et.real.astype(np.float32)),
            np.ascontiguousarray(Et.imag.astype(np.float32)),
            np.ascontiguousarray(It.real.astype(np.float32)),
            np.ascontiguousarray(It.imag.astype(np.float32)))


def mid_spectral(y, w_real, w_imag, B, Tp):
    """Packed spectra [BT, 2m2*m3, 2C] → T-DFT → corner-block channel mixing
    (fno.py:53-60 order) → inverse T → same packed shape.

    All tensors here are O(B·T·m2·m3·C) — a few MB; runs in plain XLA so
    autodiff produces the w_real/w_imag gradients."""
    _, Cin, Cout, m1, m2, m3 = w_real.shape
    BT, Y, C2 = y.shape
    C = C2 // 2
    EtR, EtI, ItR, ItI = (jnp.asarray(t) for t in _t_consts(Tp, m1))

    y6 = y.reshape(B, Tp, 2 * m2, m3, 2, C)
    yr = y6[..., 0, :]
    yi = y6[..., 1, :]                             # [B, Tp, 2m2, m3, C]
    zr = jnp.einsum("btjmc,tk->bkjmc", yr, EtR) - jnp.einsum(
        "btjmc,tk->bkjmc", yi, EtI)
    zi = jnp.einsum("btjmc,tk->bkjmc", yr, EtI) + jnp.einsum(
        "btjmc,tk->bkjmc", yi, EtR)

    def corners(z):
        return jnp.stack(
            [z[:, :m1, :m2], z[:, m1:, :m2], z[:, :m1, m2:], z[:, m1:, m2:]],
            axis=1)  # [B, 4, m1, m2, m3, C]

    cr, ci = corners(zr), corners(zi)
    # corner dims (b, 4, m1, m2, m3, cin) match the reference contraction
    # order directly (weights [4, Cin, Cout, m1, m2, m3], fno.py:53-60)
    eq = "bkxyzi,kioxyz->bkxyzo"
    outr = jnp.einsum(eq, cr, w_real) - jnp.einsum(eq, ci, w_imag)
    outi = jnp.einsum(eq, cr, w_imag) + jnp.einsum(eq, ci, w_real)

    def regrid(o):
        top = jnp.concatenate([o[:, 0], o[:, 2]], axis=2)
        bot = jnp.concatenate([o[:, 1], o[:, 3]], axis=2)
        return jnp.concatenate([top, bot], axis=1)  # [B, 2m1, 2m2, m3, Cout]

    gr_, gi_ = regrid(outr), regrid(outi)
    tr = jnp.einsum("bkjmc,kt->btjmc", gr_, ItR) - jnp.einsum(
        "bkjmc,kt->btjmc", gi_, ItI)
    ti = jnp.einsum("bkjmc,kt->btjmc", gr_, ItI) + jnp.einsum(
        "bkjmc,kt->btjmc", gi_, ItR)
    g = jnp.stack([tr, ti], axis=4)                # [B, Tp, 2m2, m3, 2, C]
    return g.reshape(BT, Y, C2)


# ---------------------------------------------------------------------------
# Whole-layer convenience + layout helpers
# ---------------------------------------------------------------------------


def flatten_cw(x5):
    """[B, T, H, W, C] → [B*T, H*(W//2), 2C] packed lanes (w-parity, c):
    element (h, w=2j+p, c) ↦ row h*(W//2)+j, lane p*C+c. Pure reshapes —
    free in XLA."""
    B, T, H, W, C = x5.shape
    return x5.reshape(B * T, H * (W // 2), 2 * C)


def unflatten_cw(x2, B, T, H, W, C):
    """Inverse of flatten_cw."""
    return x2.reshape(B, T, H, W, C)


def fused_fno_layer(x, a, b, w_real, w_imag, wp, bp, *, dims, act,
                    interpret=False):
    """One fused FNO layer on packed flat activations.

    Args:
      x: [B*Tp, Hp*(Wp//2), 2C] pre-BN activations of the previous layer
        (flatten_cw layout).
      a, b: [1, C] BN affine folded from the previous layer (a=1, b=0 and
        act='none' for the first layer).
      w_real/w_imag: [4, C, C, m1, m2, m3] spectral corner weights.
      wp: [C, C] pointwise mixing kernel; bp: [1, C] its bias.
      dims: (B, Tp, Hp, Wp, C).
      act: 'none' | 'tanh' | 'exact' — the activation folded at input.
    Returns: (s, stats128) — s like x (this layer's pre-BN output);
      stats128 [2, 2C] per-(parity, channel) (sum, sumsq) of s; fold the
      parity halves ([:, :C] + [:, C:]) for per-channel BN statistics.
    """
    B, Tp, Hp, Wp, C = dims
    m1, m2, m3 = w_real.shape[3], w_real.shape[4], w_real.shape[5]
    BT, J = B * Tp, Wp // 2
    k1, k2 = _make_layer_ops(BT, Hp, J, C, m2, m3, act, interpret,
                             str(x.dtype))
    y = k1(x, a, b)
    g = mid_spectral(y, w_real, w_imag, B, Tp)
    return k2(g, x, a, b, wp, bp)


def reference_fused_fno_layer(x, a, b, w_real, w_imag, wp, bp, *, dims, act):
    """Pure-jnp oracle for the fused layer (tests + non-TPU fallback):
    identical math via ops/spectral.truncated_spectral_conv3d_dft on the
    unflattened layout."""
    from realpdebench_tpu.ops.spectral import truncated_spectral_conv3d_dft

    B, Tp, Hp, Wp, C = dims
    x5 = unflatten_cw(x, B, Tp, Hp, Wp, C)
    z5 = _act(x5.astype(jnp.float32) * a[0] + b[0], act)
    spec = truncated_spectral_conv3d_dft(z5, w_real, w_imag)
    s5 = spec + jnp.einsum("bthwc,cd->bthwd", z5, wp) + bp[0]
    s5 = s5.astype(jnp.float32)
    # per-(parity, channel) statistics in the packed convention
    sE = s5[:, :, :, 0::2, :]
    sO = s5[:, :, :, 1::2, :]
    stats = jnp.stack([
        jnp.concatenate([jnp.sum(sE, axis=(0, 1, 2, 3)),
                         jnp.sum(sO, axis=(0, 1, 2, 3))]),
        jnp.concatenate([jnp.sum(sE * sE, axis=(0, 1, 2, 3)),
                         jnp.sum(sO * sO, axis=(0, 1, 2, 3))]),
    ])
    return flatten_cw(s5).astype(x.dtype), stats
