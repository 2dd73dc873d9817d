"""Fused FNO-layer Pallas kernels (TPU), Cooley–Tukey packed-lane design.

One reference FNO layer (`realpdebench/model/fno.py:105-133`) is
``s = SpectralConv3d(z) + Conv1x1(z); z' = GELU(BN(s))``. The round-1
profile showed XLA's lowering is HBM-bound: no dimension of the
(B,T,H,W,C) activations is (8,128)-tile-friendly (C=64, W=134, H=70), so
every materialized tensor tile-pads ~2x, and BatchNorm forces full-size
elementwise round-trips.

TPU-native design (v3 — shaped by empirical Mosaic-support probing on this
toolchain: tile-aligned lane splits/merges and sublane reshapes are free,
arbitrary lane reshapes are unsupported, dots may contract dim1-of-3D /
minormost / dim0-of-2D only, and 3-D rhs operands are unsupported):

  * activations live flat as ``[B*T_pad, H_pad*67, 128]`` with lanes packed
    as (w-parity, channel): element (h, w=2j+p, c) ↦ [bt, h*67+j, p*64+c].
    For the cylinder benchmark this layout has ~zero tile padding;
  * the W-axis DFT is computed Cooley–Tukey style: ONE dot over the
    w-pair axis j against [E67 | E67·tw] (the parity twiddle is folded
    into the matrix), so combining parities is slices+adds only;
  * every complex matrix pair is packed [re | im] into ONE wider dot, and
    every shared-RHS batched dot is flattened to a single 2-D dot (the
    batch dim merges into the matmul M dim) — both cut the MXU pass
    count, the per-block cost driver at K<=70/N<=48;
  * the BN affine + GELU of the *previous* layer is folded into this
    layer's kernels: the stored tensor is always the pre-BN ``s`` and both
    consumers recompute ``z = gelu(a*s + b)`` on the fly — normalized
    activations are never written to HBM;
  * the pointwise 1x1 conv runs as ONE dot against a block-diagonal
    ``[[Wp,0],[0,Wp]]`` 128x128 matrix, so the packed lanes never split;
  * forward: kernel K1 = affine+gelu + truncated forward (W, H) DFT; the
    tiny T-DFT + 4-corner weight mixing + inverse T runs in plain XLA
    between the kernels; kernel K2 = inverse (H, W) DFT + pointwise + add
    + BN statistics;
  * backward: the WHOLE layer is one ``custom_vjp``. Kernel K2A computes
    the spectral cotangent dg from (s, ds, BN-stat cotangents); the XLA
    mid-section vjp maps dg → (dy, dw); kernel K12B then produces a
    SINGLE combined dx through both the spectral and pointwise consumers
    of z (plus dwp/daffine/dbias accumulators) in one pass — the input
    activation is read once and the two dx contributions are summed
    in-register instead of through an HBM-level add.

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
        # u*sigmoid(2i) == 0.5*u*(1+tanh(i)) — same polynomial-tanh GELU,
        # one transcendental on the sigmoid fast path
        inner = _SQRT_2_OVER_PI * (u + _GELU_C * u * u * u)
        return u * jax.nn.sigmoid(2.0 * inner)
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
    """Cooley–Tukey factor matrices (f32 numpy), all kernel-ready. Complex
    pairs are packed [re | im] column-wise so each consumer is ONE dot:

      E67X  [J, 4m3]    half-length forward DFT over w-pairs with the
                        parity twiddle folded in: [E67 | E67·tw], each
                        half packed [cos | -sin]
      E67T/E67twT [2m3, J]  their transposes (K12B adjoint W)
      EhP   [Hp, 4m2]   forward H DFT packed [EhR | EhI]
      EhPT  [2m2, 2Hp]  its transpose pair [EhR.T | EhI.T] (K12B adjoint H)
      IhP   [2m2, 2Hp]  inverse H packed [IhR | IhI]
      IhPT  [Hp, 4m2]   [IhR.T | IhI.T] (K2A adjoint inverse H)
      IwE2/IwO2 [2m3, J]   inverse rfft-axis matrices for even/odd output
                           columns, stacked [re; im] row-wise so the
                           (ihR‖ihI) lane-concat contracts in one dot
      IwET/IwOT [J, 2m3]   their transposes packed [re.T | im.T] (K2A)
    """
    assert Wp % 2 == 0, "packed-lane kernels require an even padded W"
    J = Wp // 2
    assert m3 <= J, "kept W modes must fit the half-length DFT"
    _Ew, Eh, _Et, _It, Ih, Iw_re, Iw_im = _dft_factors(8, Hp, Wp, 2, m2, m3)

    jj = np.arange(J)[:, None]
    mm = np.arange(m3)[None, :]
    theta = 2 * np.pi * jj * mm / J
    # twiddles folded into the odd-parity DFT matrix: phase 2*pi*m/Wp
    theta_tw = theta + 2 * np.pi * mm / Wp
    E67 = np.concatenate([np.cos(theta), -np.sin(theta)], axis=1)
    E67tw = np.concatenate([np.cos(theta_tw), -np.sin(theta_tw)], axis=1)

    f32 = lambda a: np.ascontiguousarray(np.asarray(a, np.float32))
    EhR, EhI = f32(Eh.real), f32(Eh.imag)
    IhR, IhI = f32(Ih.real), f32(Ih.imag)
    IwRE, IwRO = f32(Iw_re[:, 0::2]), f32(Iw_re[:, 1::2])
    IwIE, IwIO = f32(Iw_im[:, 0::2]), f32(Iw_im[:, 1::2])
    # 8-aligned padded dims: Mosaic relayouts (transposes) on sublane dims
    # that are not multiples of 8 fall off the fast path (measured ~1.3 ms
    # per 600K-element transpose at (70, 67) vs ~0 at (72, 72)). All
    # constants are padded with ZEROS at the aligned boundaries, and the
    # kernels pad activation rows with zeros, so every padded contraction
    # is exact.
    Hp8, J8 = -(-Hp // 8) * 8, -(-J // 8) * 8
    pr = lambda a, n: np.pad(a, ((0, n - a.shape[0]), (0, 0)))  # pad rows
    pc = lambda a, n: np.pad(a, ((0, 0), (0, n - a.shape[1])))  # pad cols
    return dict(
        E67X=pr(f32(np.concatenate([E67, E67tw], axis=1)), J8),
        E67T=pc(f32(E67.T), J8),
        E67twT=pc(f32(E67tw.T), J8),
        EhP=pr(f32(np.concatenate([EhR, EhI], axis=1)), Hp8),
        EhPT=f32(np.concatenate(
            [pc(f32(EhR.T), Hp8), pc(f32(EhI.T), Hp8)], axis=1)),
        IhP=f32(np.concatenate(
            [pc(f32(IhR), Hp8), pc(f32(IhI), Hp8)], axis=1)),
        IhPT=pr(f32(np.concatenate([IhR.T, IhI.T], axis=1)), Hp8),
        IwE2=pc(f32(np.concatenate([IwRE, IwIE], axis=0)), J8),
        IwO2=pc(f32(np.concatenate([IwRO, IwIO], axis=0)), J8),
        IwET=pr(f32(np.concatenate([IwRE.T, IwIE.T], axis=1)), J8),
        IwOT=pr(f32(np.concatenate([IwRO.T, IwIO.T], axis=1)), J8),
    )


def _np_mirrors(Hp: int, Wp: int, m2: int, m3: int):
    """Numpy mirrors of the three kernel-side spatial<->mode transforms,
    batched over a trailing channel axis (the operators are channel-wise,
    so the channel axis doubles as a basis batch). Shapes: spatial fields
    [Hp8, J8, P=2, c] (rows (h, j), parity P), mode fields [Y, ri=2, c]
    with Y = 2*m2*m3 rows (j2, m).

      F — K1's truncated forward (W, H) DFT dots (post-activation part)
      V — K2's inverse (H, W) DFT dots (selfuse form; same linear map)
      A — K2A's adjoint dots (the vjp of V; A == V.T, see
          tools/k2a_lite_derivation.py)

    Used only at trace time to extract the K2A-lite statics (_lite_consts);
    the tool above validates the identities against these same mirrors.
    """
    cst = _ct_consts(Hp, Wp, m2, m3)
    J = Wp // 2
    Hp8, J8 = -(-Hp // 8) * 8, -(-J // 8) * 8
    m2x2 = 2 * m2
    Y = m2x2 * m3
    E67X, EhP = cst["E67X"], cst["EhP"]
    IhP, IwE2, IwO2 = cst["IhP"], cst["IwE2"], cst["IwO2"]
    IhPT, IwET, IwOT = cst["IhPT"], cst["IwET"], cst["IwOT"]

    def F(z):
        S = np.einsum("hjpc,jq->hpcq", z, E67X)
        Xr = S[:, 0, :, 0:m3] + S[:, 1, :, 2 * m3:3 * m3]
        Xi = S[:, 0, :, m3:2 * m3] + S[:, 1, :, 3 * m3:]
        A_ = np.einsum("hcm,hq->cmq", Xr, EhP)
        B_ = np.einsum("hcm,hq->cmq", Xi, EhP)
        yR = A_[..., :m2x2] - B_[..., m2x2:]
        yI = A_[..., m2x2:] + B_[..., :m2x2]
        y = np.stack([yR.transpose(2, 1, 0), yI.transpose(2, 1, 0)], axis=1)
        return y.transpose(0, 2, 1, 3).reshape(Y, 2, -1)

    def V(g):
        gR = g[:, 0].reshape(m2x2, m3, -1).transpose(1, 2, 0)
        gI = g[:, 1].reshape(m2x2, m3, -1).transpose(1, 2, 0)
        A_ = np.einsum("mcq,qx->mcx", gR, IhP)
        B_ = np.einsum("mcq,qx->mcx", gI, IhP)
        ihR = A_[..., :Hp8] - B_[..., Hp8:]
        ihI = B_[..., :Hp8] + A_[..., Hp8:]
        ihC = np.concatenate([ihR, ihI], axis=0)
        yE = np.einsum("mch,mj->hjc", ihC, IwE2)
        yO = np.einsum("mch,mj->hjc", ihC, IwO2)
        return np.stack([yE, yO], axis=2)

    def A(d):
        QE = np.einsum("hjpc,jq->hpcq", d, IwET)
        QO = np.einsum("hjpc,jq->hpcq", d, IwOT)
        dihR = QE[:, 0, :, :m3] + QO[:, 1, :, :m3]
        dihI = QE[:, 0, :, m3:] + QO[:, 1, :, m3:]
        A_ = np.einsum("hcm,hq->mcq", dihR, IhPT)
        B_ = np.einsum("hcm,hq->mcq", dihI, IhPT)
        dgR = A_[..., :m2x2] + B_[..., m2x2:]
        dgI = B_[..., :m2x2] - A_[..., m2x2:]
        dg = np.stack([dgR.transpose(2, 0, 1), dgI.transpose(2, 0, 1)],
                      axis=1)
        return dg.transpose(0, 2, 1, 3).reshape(Y, 2, -1)

    return F, V, A, (Hp8, J8, Y)


@functools.lru_cache(maxsize=32)
def _lite_consts(Hp: int, Wp: int, m2: int, m3: int):
    """K2A-lite statics (f32 numpy): with s = V g + z @ Wp + bp and A the
    channel-wise adjoint of V,

        A(s) = M g + D * (F z) @ Wp + bp * A1
             = M g + D * y @ Wp + bp * A1        (y is K1's saved output)

    so the backward spectral cotangent dg = A(ds + ds1 + 2 ds2 s) becomes
    A(ds) + ds1*A1 + 2 ds2 * A(s) with NO full-size s read. Returns
      M  [Y, 2, Y, 2]  (out-(row, ri), in-(row, ri)) mode-space Gram A V
      D  [Y, 2]        diagonal with A == diag(D) F (residual-asserted)
      A1 [Y, 2]        A applied to the all-ones field
    Derivation + validation: tools/k2a_lite_derivation.py.
    """
    F, V, A, (Hp8, J8, Y) = _np_mirrors(Hp, Wp, m2, m3)
    # D from two random probes (least squares per mode), residual-checked
    # on a third: A and F rows are proportional (same truncated DFT basis;
    # V carries the irfft doubling/normalization weights, so D is the
    # per-mode c_k/(H*W)-style diagonal).
    rng = np.random.default_rng(12345)
    p = rng.normal(size=(Hp8, J8, 2, 3))
    u, v = A(p), F(p)
    den = v[..., 0] ** 2 + v[..., 1] ** 2
    num = u[..., 0] * v[..., 0] + u[..., 1] * v[..., 1]
    D = np.where(den > 1e-20, num / np.maximum(den, 1e-20), 0.0)
    resid = np.abs(u[..., 2] - D * v[..., 2]).max() / (
        np.abs(u[..., 2]).max() + 1e-30)
    if resid > 1e-4:
        raise AssertionError(
            f"K2A-lite: A != diag(D) F at (Hp={Hp}, Wp={Wp}, m2={m2}, "
            f"m3={m3}); residual {resid:.2e} "
            "(caller falls back to the full-read K2A)")
    eyeY = np.eye(2 * Y, dtype=np.float64).reshape(Y, 2, 2 * Y)
    M4 = A(V(eyeY)).reshape(Y, 2, Y, 2)   # [(row,ri)_out, (row,ri)_in]
    A1 = A(np.ones((Hp8, J8, 2, 1)))[:, :, 0]
    # M couples only +-kh conjugate mirror pairs at the SAME (m, ri): the
    # irfft real projection aliases kh with -kh = H-kh and nothing else, so
    # M g == alpha * g + beta * mirror_kh(g) with static [Y, 2] scales and
    # a static j2-block row mirror (verified by exact reconstruction below;
    # turns the per-block M GEMM into two VPU multiplies + a row shuffle).
    m2x2 = 2 * m2
    m3_ = Y // m2x2
    mir = np.concatenate([[0], np.arange(m2x2 - 1, 0, -1)])  # j2 mirror
    alpha = np.zeros((Y, 2))
    beta = np.zeros((Y, 2))
    for Yo in range(Y):
        j2, m = divmod(Yo, m3_)
        Ym = int(mir[j2]) * m3_ + m
        for r in range(2):
            alpha[Yo, r] = M4[Yo, r, Yo, r]
            if Ym != Yo:
                beta[Yo, r] = M4[Yo, r, Ym, r]
    M_rec = np.zeros_like(M4)
    for Yo in range(Y):
        j2, m = divmod(Yo, m3_)
        Ym = int(mir[j2]) * m3_ + m
        for r in range(2):
            M_rec[Yo, r, Yo, r] += alpha[Yo, r]
            if Ym != Yo:
                M_rec[Yo, r, Ym, r] = beta[Yo, r]
    mres = np.abs(M_rec - M4).max() / (np.abs(M4).max() + 1e-30)
    if mres > 1e-5:
        raise AssertionError(
            f"K2A-lite: M is not (alpha, beta, kh-mirror)-structured at "
            f"(Hp={Hp}, Wp={Wp}, m2={m2}, m3={m3}); residual {mres:.2e} "
            "(caller falls back to the full-read K2A)")
    f32 = lambda a: np.ascontiguousarray(a.astype(np.float32))
    return f32(alpha), f32(beta), f32(D), f32(A1)


def _dot(a, b, contract, mxu=None):
    """MXU dot with f32 accumulation. ``mxu=bfloat16`` casts both operands
    (bf16 multiplies run ~4x the f32 rate on the v5e MXU); selected only
    when the model already opted into compute_dtype=bfloat16, so the f32
    default path stays bit-stable for parity tests."""
    if mxu is not None:
        a = a.astype(mxu)
        b = b.astype(mxu)
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# K1: affine + gelu + truncated forward (W, H) DFT
# ---------------------------------------------------------------------------


def _read_x(x_ref, xmask_ref, kk, tdims):
    """Read a [kk, R, C2] activation block as f32 rows [kk*R, C2].

    ``tdims=(T, Tp)`` enables input masking (the pad-early head, see
    FNO3d._fused_forward): rows with h >= H or j >= J0 (the xmask const)
    and whole bt-images with t >= T are zeroed, reproducing exactly the
    zeros that ``jnp.pad`` after fc0 used to provide — fc0's bias in the
    padded region must not reach the spectral math or the BN statistics."""
    R, C2 = x_ref.shape[1], x_ref.shape[2]
    if tdims is None:
        return x_ref[...].reshape(kk * R, C2).astype(jnp.float32)
    T, Tp = tdims
    bt0 = pl.program_id(0) * kk
    tidx = jax.lax.rem(
        bt0 + jax.lax.broadcasted_iota(jnp.int32, (kk, 1, 1), 0), Tp)
    tfac = (tidx < T).astype(jnp.float32)
    x3 = x_ref[...].astype(jnp.float32) * (xmask_ref[:][None] * tfac)
    return x3.reshape(kk * R, C2)


def _k1_kernel(x_ref, a2_ref, b2_ref, e67x, ehp, xmask,
               y_ref, *, Hp, J, C2, m3, act, mxu, aligned, kk=1,
               tdims=None, selfuse=True):
    # selfuse is accepted for kwarg uniformity; K1's repacks are all
    # mode-space (~4x smaller than the K2-family ones the fold targets)
    """``kk`` = BT rows folded per grid block (aligned layout only): the
    per-block fixed cost (~6 µs on v5e, from the round-4 DMA probe's k-sweep)
    amortizes over kk row-images; every dot keeps its contraction and simply
    flattens (kk, M) into the matmul M dim."""
    dot = lambda a, b, c: _dot(a, b, c, mxu)
    Hp8, J8 = -(-Hp // 8) * 8, -(-J // 8) * 8
    R = x_ref.shape[1]
    xm = _read_x(x_ref, xmask, kk, tdims)
    um = xm * a2_ref[:] + b2_ref[:]
    zm = _act(um, act)
    if aligned:
        # activations live pre-padded at [Hp8*J8, C2] in HBM: the reshape is
        # tile-aligned and free. Padded rows hold garbage (act(b2) etc.) but
        # every contraction below kills them: the W dot contracts j against
        # E67X whose rows >= J are zero, and the H dot contracts h against
        # EhP whose rows >= Hp are zero.
        z3 = zm.reshape(kk * Hp8, J8, C2)
    else:
        # 8-aligned zero-padding before every relayout/dot: misaligned
        # sublane shapes (70, 67) fall off the Mosaic fast path (~1.3 ms per
        # 600K-elem transpose); padded rows are zeros and the padded DFT
        # matrices carry zero rows, so all contractions stay exact
        # (kk == 1 on this path — see fused_fno_layer)
        z3 = jnp.pad(zm.reshape(Hp, J, C2),
                     ((0, Hp8 - Hp), (0, J8 - J), (0, 0)))
    # Cooley–Tukey W stage: one dot over the pair axis j against
    # [E67 | E67·tw] — the parity twiddle is folded into the matrix, so
    # combining parities is slices+adds only (no VPU multiplies)
    S = dot(z3, e67x[:], (((1,), (0,))))          # [kk*Hp8, C2, 4m3]
    C = C2 // 2
    Xr = S[:, :C, 0:m3] + S[:, C:, 2 * m3:3 * m3]  # [kk*Hp8, C, m3]
    Xi = S[:, :C, m3:2 * m3] + S[:, C:, 3 * m3:]
    # H stage (contract Hp8): put Hp8 minor, then flatten (kk, C, m3) into
    # the matmul M dim — shared-RHS batched dots become ONE 2-D dot
    XrT = Xr.reshape(kk, Hp8, C, m3).transpose(0, 2, 3, 1).reshape(
        kk * C * m3, Hp8)
    XiT = Xi.reshape(kk, Hp8, C, m3).transpose(0, 2, 3, 1).reshape(
        kk * C * m3, Hp8)
    A = dot(XrT, ehp[:], (((1,), (0,))))          # [kk*C*m3, 4m2]
    Bm = dot(XiT, ehp[:], (((1,), (0,))))
    m2x2 = A.shape[1] // 2
    yR = A[:, :m2x2] - Bm[:, m2x2:]                # [kk*C*m3, 2m2]
    yI = A[:, m2x2:] + Bm[:, :m2x2]
    # pack → sublanes (j2, m), lanes (ri, c)
    yRp = yR.reshape(kk, C, m3, m2x2).transpose(0, 3, 2, 1).reshape(
        kk * m2x2 * m3, C)
    yIp = yI.reshape(kk, C, m3, m2x2).transpose(0, 3, 2, 1).reshape(
        kk * m2x2 * m3, C)
    y_ref[...] = jnp.concatenate([yRp, yIp], axis=1).reshape(
        kk, m2x2 * m3, C2).astype(y_ref.dtype)      # [kk, 2m2*m3, 2C]


# ---------------------------------------------------------------------------
# K2: inverse (H, W) DFT + pointwise mixing + add + BN statistics
# ---------------------------------------------------------------------------


def _k2_kernel(g_ref, x_ref, a2_ref, b2_ref, wp2_ref, bp2_ref,
               ihp, iwe2, iwo2, selET, selOT, mask, xmask,
               s_ref, stats_ref, *, Hp, J, C2, m3, act, mxu, aligned, kk=1,
               tdims=None, selfuse=True):
    dot = lambda a, b, c: _dot(a, b, c, mxu)
    i = pl.program_id(0)
    C = C2 // 2
    R = x_ref.shape[1]
    Y = g_ref.shape[1]                             # 2m2*m3
    m2x2 = Y // m3
    # flatten (kk, m3, C) into M: shared-RHS batched dots become 2-D dots
    g = g_ref[...]                                 # [kk, 2m2*m3, 2C]
    gRT = g[:, :, :C].reshape(kk, m2x2, m3, C).transpose(0, 2, 3, 1).reshape(
        kk * m3 * C, m2x2)
    gIT = g[:, :, C:].reshape(kk, m2x2, m3, C).transpose(0, 2, 3, 1).reshape(
        kk * m3 * C, m2x2)
    Hp8, J8 = -(-Hp // 8) * 8, -(-J // 8) * 8
    # inverse H (contract 2m2), [IhR | IhI] packed at Hp8 boundaries
    A = dot(gRT, ihp[:], (((1,), (0,))))          # [kk*m3*C, 2Hp8]
    Bm = dot(gIT, ihp[:], (((1,), (0,))))
    ihR = A[:, :Hp8] - Bm[:, Hp8:]
    ihI = Bm[:, :Hp8] + A[:, Hp8:]
    ihRT = ihR.reshape(kk, m3, C, Hp8).transpose(0, 3, 2, 1)  # [kk,Hp8,C,m3]
    ihIT = ihI.reshape(kk, m3, C, Hp8).transpose(0, 3, 2, 1)
    # inverse W per output parity (Hermitian-doubled real projection):
    # lane-concat (re ‖ im) once, contract against the row-stacked [re; im]
    # inverse matrices
    if aligned and selfuse:
        # fold the output repack into the stage dots: contract 2m3 on the
        # 3-D view (minormost), then contract C against the [C, 2C] parity
        # selectors (dim1) — the full-size yEt/yOt VPU transposes of the
        # original form never happen, at the SAME dot count (round-4 final
        # session; REALPDEBENCH_FNO_SELFUSE=0 restores the transposes)
        ihC3 = jnp.concatenate([ihRT, ihIT], axis=3).reshape(
            kk * Hp8, C, 2 * m3)
        yE3 = dot(ihC3, iwe2[:], (((2,), (0,))))   # [kk*Hp8, C, J8]
        yO3 = dot(ihC3, iwo2[:], (((2,), (0,))))
        y2 = (dot(yE3, selET[:], (((1,), (0,))))
              + dot(yO3, selOT[:], (((1,), (0,))))).reshape(kk * R, C2)
    else:
        ihC = jnp.concatenate([ihRT, ihIT], axis=3).reshape(
            kk * Hp8 * C, 2 * m3)
        yE = dot(ihC, iwe2[:], (((1,), (0,))))     # [kk*Hp8*C, J8]
        yO = dot(ihC, iwo2[:], (((1,), (0,))))
        if aligned:
            # keep the aligned layout end-to-end: no slice, padded rows of
            # the inverse DFTs are exactly zero (IhP/IwE2/IwO2 carry zero
            # pad rows/cols), so only the pointwise branch writes garbage
            yEt = yE.reshape(kk, Hp8, C, J8).transpose(0, 1, 3, 2).reshape(
                kk * Hp8 * J8, C)
            yOt = yO.reshape(kk, Hp8, C, J8).transpose(0, 1, 3, 2).reshape(
                kk * Hp8 * J8, C)
        else:
            yEt = yE.reshape(Hp8, C, J8).transpose(0, 2, 1)[:Hp, :J].reshape(
                Hp * J, C)
            yOt = yO.reshape(Hp8, C, J8).transpose(0, 2, 1)[:Hp, :J].reshape(
                Hp * J, C)
        # big lane concats cost ~8 us/block on this Mosaic (measured);
        # selection GEMMs against [I|0]/[0|I] run on the MXU at ~0.3 us
        y2 = dot(yEt, selET[:], (((1,), (0,)))) + dot(
            yOt, selOT[:], (((1,), (0,))))         # [kk*R, C2]
    # pointwise via the block-diagonal [[Wp,0],[0,Wp]] matrix: packed lanes
    # never split
    xm = _read_x(x_ref, xmask, kk, tdims)
    um = xm * a2_ref[:] + b2_ref[:]
    zm = _act(um, act)
    zp = dot(zm, wp2_ref[:], (((1,), (0,))))      # [kk*R, C2]
    s = y2 + zp + bp2_ref[:]
    s_ref[...] = s.reshape(kk, R, C2).astype(s_ref.dtype)
    if aligned:
        # padded rows carry pointwise-branch garbage — mask them out of the
        # BN statistics (one [R8,1]-broadcast multiply per row-image)
        s3 = s.reshape(kk, R, C2)
        sm_ = s3 * mask[:][None]
        part = jnp.stack(
            [jnp.sum(sm_, axis=(0, 1)),
             jnp.sum(sm_ * s3, axis=(0, 1))], axis=0)
    else:
        part = jnp.concatenate(
            [jnp.sum(s, axis=0, keepdims=True),
             jnp.sum(s * s, axis=0, keepdims=True)], axis=0)  # [2, 128]

    @pl.when(i == 0)
    def _():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    stats_ref[...] = stats_ref[...] + part


# ---------------------------------------------------------------------------
# K2A: spectral cotangent dg from (s, ds, BN-stat cotangents)
# ---------------------------------------------------------------------------


def _k2a_kernel(s_ref, ds_ref, ds1_ref, ds2_ref,
                ihpt, iwet, iwot, selE, selO,
                dg_ref, *, Hp, J, C2, m3, act, mxu, aligned, kk=1,
                tdims=None, selfuse=True):
    # tdims is accepted for kwarg uniformity with the other kernels but
    # unused: K2A never reads x (pad-early masking is an x-read concern)
    dot = lambda a, b, c: _dot(a, b, c, mxu)
    C = C2 // 2
    R = s_ref.shape[1]
    sm = s_ref[...].reshape(kk * R, C2).astype(jnp.float32)
    dsm = ds_ref[...].reshape(kk * R, C2).astype(jnp.float32)
    ds_eff = dsm + ds1_ref[:] + 2.0 * sm * ds2_ref[:]
    _k2a_adjoint_write(ds_eff, ihpt, iwet, iwot, selE, selO, dg_ref, dot,
                       Hp=Hp, J=J, C2=C2, m3=m3, aligned=aligned, kk=kk,
                       selfuse=selfuse)


def _k2a_lite_kernel(ds_ref, g_ref, y_ref, dsc_ref, wp2s_ref,
                     ihpt, iwet, iwot, selE, selO,
                     alf, bef, a1f, df, dg_ref, *, Hp, J, C2, m3, act, mxu,
                     aligned, kk=1, tdims=None, selfuse=True):
    """K2A without the s read. dg = A(ds) + ds1*A1 + 2 ds2 * A(s), with
    A(s) reconstructed from the SMALL mode-space residuals instead of
    re-streaming s:  A(s) = M g + D*(y @ Wp2) + bp*A1  (static identities,
    residual-checked in _lite_consts; derivation in
    tools/k2a_lite_derivation.py).

    Cost history: an XLA-side correction streamed ~1.3 GB/step of f32
    temporaries (chip 4.626); an in-kernel M GEMM added ~150 GFLOP/step of
    small-N dots (4.783) — both gave the read saving back. This version
    exploits M's exact (alpha, beta, kh-mirror) structure (the irfft real
    projection aliases only +-kh pairs) and folds 2*ds2 into the wp2s
    matrix and ds1/bp into dsc outside, leaving per block: three VPU
    multiplies, one m3-block row mirror, and ONE [Y, C2]x[C2, C2] dot.

    Inputs: dsc = ds1 + 2*ds2*bp2 (per-lane), wp2s = wp2 * 2*ds2 (columns
    scaled); g is pre-scaled by 2*ds2 OUTSIDE? No — g arrives raw; the
    2*ds2 fold happens here via wp2s for y and via dsc/alpha-beta applied
    to gs = 2*ds2*g (one multiply)."""
    dot = lambda a, b, c: _dot(a, b, c, mxu)
    R = ds_ref.shape[1]
    Y = g_ref.shape[1]
    m2x2 = Y // m3
    dsm = ds_ref[...].reshape(kk * R, C2).astype(jnp.float32)
    # --- the A(s) correction on [kk, Y, C2] mode blocks -------------------
    # 2*ds2 is folded into wp2s' columns; for the g path scale g once
    # (per-lane broadcast) — the row mirror commutes with per-lane scales
    g3 = g_ref[...].astype(jnp.float32)
    y3 = y_ref[...].astype(jnp.float32)
    # dsc_ref rows: [0] = ds1 + 2*ds2*bp2, [1] = 2*ds2
    dsc = dsc_ref[:]
    gs = g3 * dsc[1:2][None]                       # [kk, Y, C2]
    g4 = gs.reshape(kk, m2x2, m3, C2)
    # kh-mirror j2 -> (2m2 - j2) % 2m2 as unrolled static slices (Mosaic
    # has no `rev` lowering; 2m2 compile-time slices of m3 rows each)
    gmir = jnp.concatenate(
        [g4[:, 0:1]] + [g4[:, i:i + 1] for i in range(m2x2 - 1, 0, -1)],
        axis=1).reshape(kk, Y, C2)
    Mg = alf[:][None] * gs + bef[:][None] * gmir
    Dy = (y3 * df[:][None]).reshape(kk * Y, C2)
    Dyw = dot(Dy, wp2s_ref[:], (((1,), (0,)))).reshape(kk, Y, C2)
    corr = Mg + Dyw + (dsc[0:1] * a1f[:])[None]
    _k2a_adjoint_write(dsm, ihpt, iwet, iwot, selE, selO, dg_ref, dot,
                       Hp=Hp, J=J, C2=C2, m3=m3, aligned=aligned, kk=kk,
                       selfuse=selfuse, extra=corr)


def _k2a_adjoint_write(ds_eff, ihpt, iwet, iwot, selE, selO, dg_ref, dot,
                       *, Hp, J, C2, m3, aligned, kk, selfuse,
                       extra=0.0):
    C = C2 // 2
    R = ds_eff.shape[0] // kk
    Hp8, J8 = -(-Hp // 8) * 8, -(-J // 8) * 8
    if aligned and selfuse:
        # adjoint inverse W straight off the row layout: contract J8 on the
        # 3-D view (dim1) for BOTH parity lane-halves at once — the parity
        # selection becomes a SUBLANE slice of the result (64 = 8-aligned),
        # at HALF the MXU work of the selection-GEMM form, and the
        # full-size dyE/dyO transposes never happen
        ds4 = ds_eff.reshape(kk * Hp8, J8, C2)
        QE = dot(ds4, iwet[:], (((1,), (0,))))    # [kk*Hp8, C2, 2m3]
        QO = dot(ds4, iwot[:], (((1,), (0,))))
        dihRT3 = QE[:, :C, :m3] + QO[:, C:, :m3]  # [kk*Hp8, C, m3]
        dihIT3 = QE[:, :C, m3:] + QO[:, C:, m3:]
        dihR = dihRT3.reshape(kk, Hp8, C, m3).transpose(0, 3, 2, 1).reshape(
            kk * m3 * C, Hp8)
        dihI = dihIT3.reshape(kk, Hp8, C, m3).transpose(0, 3, 2, 1).reshape(
            kk * m3 * C, Hp8)
    else:
        # adjoint of the output packing: parity selection via GEMMs (big
        # lane slices cost ~8 us/block on this Mosaic; MXU selection ~0.3)
        dyEf = dot(ds_eff, selE[:], (((1,), (0,))))   # [kk*R, C]
        dyOf = dot(ds_eff, selO[:], (((1,), (0,))))
        if aligned:
            # no mask needed: padded-row garbage in ds_eff (the ds1/ds2
            # broadcasts are nonzero everywhere) is annihilated downstream —
            # j >= J rows contract against IwET/IwOT zero rows, h >= Hp
            # columns against IhPT zero rows
            pad = lambda a: a.reshape(kk, Hp8, J8, C)
        else:
            pad = lambda a: jnp.pad(a.reshape(Hp, J, C),
                                    ((0, Hp8 - Hp), (0, J8 - J),
                                     (0, 0)))[None]
        dyE = pad(dyEf).transpose(0, 1, 3, 2).reshape(kk * Hp8 * C, J8)
        dyO = pad(dyOf).transpose(0, 1, 3, 2).reshape(kk * Hp8 * C, J8)
        # adjoint inverse W: [re.T | im.T] packed, (kk, Hp8, C) into M
        AE = dot(dyE, iwet[:], (((1,), (0,))))        # [kk*Hp8*C, 2m3]
        AO = dot(dyO, iwot[:], (((1,), (0,))))
        dihRT = AE[:, :m3] + AO[:, :m3]
        dihIT = AE[:, m3:] + AO[:, m3:]
        dihR = dihRT.reshape(kk, Hp8, C, m3).transpose(0, 3, 2, 1).reshape(
            kk * m3 * C, Hp8)
        dihI = dihIT.reshape(kk, Hp8, C, m3).transpose(0, 3, 2, 1).reshape(
            kk * m3 * C, Hp8)
    # adjoint inverse H: [IhR.T | IhI.T] packed, (kk, m3, C) flattened into M
    A = dot(dihR, ihpt[:], (((1,), (0,))))        # [kk*m3*C, 4m2]
    Bm = dot(dihI, ihpt[:], (((1,), (0,))))
    m2x2 = A.shape[1] // 2
    dgR3 = (A[:, :m2x2] + Bm[:, m2x2:]).reshape(kk, m3, C, m2x2)
    dgI3 = (Bm[:, :m2x2] - A[:, m2x2:]).reshape(kk, m3, C, m2x2)
    dgR = dgR3.transpose(0, 3, 1, 2).reshape(kk * m2x2 * m3, C)
    dgI = dgI3.transpose(0, 3, 1, 2).reshape(kk * m2x2 * m3, C)
    dg_ref[...] = (jnp.concatenate([dgR, dgI], axis=1).reshape(
        kk, m2x2 * m3, C2) + extra).astype(dg_ref.dtype)


# ---------------------------------------------------------------------------
# K12B: combined dx through both consumers of z (+ weight accumulators)
# ---------------------------------------------------------------------------


def _k12b_kernel(x_ref, a2_ref, b2_ref, wp2t_ref, s_ref, ds_ref,
                 ds1_ref, ds2_ref, dy_ref,
                 ehpt, e67t, e67twt, selET, selOT, mask, xmask,
                 dx_ref, dwp2_ref, dvec_ref, *, Hp, J, C2, m3, act, mxu,
                 aligned, kk=1, tdims=None, selfuse=True):
    dot = lambda a, b, c: _dot(a, b, c, mxu)
    i = pl.program_id(0)
    C = C2 // 2
    R = x_ref.shape[1]
    # --- spectral branch: dy → adjoint (H, W·tw) → dzW
    dy = dy_ref[...]                               # [kk, 2m2*m3, 2C]
    m2x2 = dy.shape[1] // m3
    dyR = dy[:, :, :C].reshape(kk, m2x2, m3, C).transpose(0, 3, 2, 1).reshape(
        kk * C * m3, m2x2)
    dyI = dy[:, :, C:].reshape(kk, m2x2, m3, C).transpose(0, 3, 2, 1).reshape(
        kk * C * m3, m2x2)
    Hp8, J8 = -(-Hp // 8) * 8, -(-J // 8) * 8
    A = dot(dyR, ehpt[:], (((1,), (0,))))         # [kk*C*m3, 2Hp8]
    Bm = dot(dyI, ehpt[:], (((1,), (0,))))
    dXr = (A[:, :Hp8] + Bm[:, Hp8:]).reshape(kk, C, m3, Hp8).transpose(
        0, 3, 1, 2)                                # [kk, Hp8, C, m3]
    dXi = (Bm[:, :Hp8] - A[:, Hp8:]).reshape(kk, C, m3, Hp8).transpose(
        0, 3, 1, 2)
    # adjoint of the twiddle-folded W stage: even-parity channels see
    # E67.T, odd-parity see (E67·tw).T; lanes re-merged via selection GEMMs
    # (mirrors K2's inverse-W structure)
    if aligned and selfuse:
        # same repack fold as K2: contract 2m3 on the 3-D view (minormost),
        # then contract C against the parity selectors (dim1) — no
        # full-size dzEt/dzOt transposes
        dXY3 = jnp.concatenate([dXr, dXi], axis=3).reshape(
            kk * Hp8, C, 2 * m3)
        dzE3 = dot(dXY3, e67t[:], (((2,), (0,))))  # [kk*Hp8, C, J8]
        dzO3 = dot(dXY3, e67twt[:], (((2,), (0,))))
        dzW = (dot(dzE3, selET[:], (((1,), (0,))))
               + dot(dzO3, selOT[:], (((1,), (0,))))).reshape(kk * R, C2)
    else:
        dXY = jnp.concatenate([dXr, dXi], axis=3).reshape(
            kk * Hp8 * C, 2 * m3)
        dzE = dot(dXY, e67t[:], (((1,), (0,))))    # [kk*Hp8*C, J8]
        dzO = dot(dXY, e67twt[:], (((1,), (0,))))
        if aligned:
            # padded rows of dzE/dzO are exactly zero (EhPT/E67T/E67twT
            # carry zero pad rows/cols) — keep the aligned layout, no slice
            dzEt = dzE.reshape(kk, Hp8, C, J8).transpose(0, 1, 3, 2).reshape(
                kk * Hp8 * J8, C)
            dzOt = dzO.reshape(kk, Hp8, C, J8).transpose(0, 1, 3, 2).reshape(
                kk * Hp8 * J8, C)
        else:
            dzEt = dzE.reshape(Hp8, C, J8).transpose(
                0, 2, 1)[:Hp, :J].reshape(Hp * J, C)
            dzOt = dzO.reshape(Hp8, C, J8).transpose(
                0, 2, 1)[:Hp, :J].reshape(Hp * J, C)
        dzW = dot(dzEt, selET[:], (((1,), (0,)))) + dot(
            dzOt, selOT[:], (((1,), (0,))))        # [kk*R, C2]
    # --- pointwise branch: ds_eff (BN-stat chain) → dzP
    sm = s_ref[...].reshape(kk * R, C2).astype(jnp.float32)
    dsm = ds_ref[...].reshape(kk * R, C2).astype(jnp.float32)
    ds_eff = dsm + ds1_ref[:] + 2.0 * sm * ds2_ref[:]
    if aligned:
        # mask padded rows once: dzP, dwp2, and the dvec reductions below
        # must not see the ds1/ds2 broadcast terms in alignment padding
        ds_eff = (ds_eff.reshape(kk, R, C2) * mask[:][None]).reshape(
            kk * R, C2)
    dzP = dot(ds_eff, wp2t_ref[:], (((1,), (0,))))  # [kk*R, 128]
    # --- one combined activation-chain pass for BOTH consumers of z
    dz = dzW + dzP
    xm = _read_x(x_ref, xmask, kk, tdims)
    um = xm * a2_ref[:] + b2_ref[:]
    zm = _act(um, act)
    du = dz * _act_grad(um, act)
    dx3 = (du * a2_ref[:]).reshape(kk, R, C2)
    if tdims is not None:
        # the pad-early head's fc0 bias gradient must not see cotangent at
        # padded rows (the reference's pad-bwd slices them away); zero dx
        # exactly where _read_x zeroed x
        T_, Tp_ = tdims
        bt0 = pl.program_id(0) * kk
        tidx = jax.lax.rem(
            bt0 + jax.lax.broadcasted_iota(jnp.int32, (kk, 1, 1), 0), Tp_)
        dx3 = dx3 * (xmask[:][None] * (tidx < T_).astype(jnp.float32))
    dx_ref[...] = dx3.astype(dx_ref.dtype)
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
# pallas_call wrappers + the single-layer custom VJP
# ---------------------------------------------------------------------------


# the K12B backward's scoped stack peaks >16MB (R=4690-row blocks), above
# the default scoped-vmem limit; v5e has 128MB VMEM, so raise it (kk-row
# blocks multiply the scoped stack by kk)
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _full():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _blk(kk, *shape):
    n = len(shape)
    return pl.BlockSpec((kk, *shape), lambda i: tuple([i] + [0] * n),
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


def _bt_blocks(BT: int, aligned: bool):
    """Per-kernel BT rows per grid block (kk). The round-4 DMA probe showed
    a ~6 µs fixed cost per grid block; folding rows amortizes it. Defaults
    are VMEM-conservative per kernel (the scoped stack scales with kk; K12B
    carries the deepest stack and stays at 1). ``REALPDEBENCH_FNO_BTBLK`` =
    "k1,k2,k2a,k12b" overrides for chip tuning; the unaligned legacy layout
    always runs kk=1 (its in-kernel pads assume single-row blocks)."""
    import os

    def fit(want):
        k = want
        while BT % k:
            k -= 1
        return k

    env = os.environ.get("REALPDEBENCH_FNO_BTBLK")
    if env:
        try:
            vals = [int(v) for v in env.split(",")]
            if len(vals) == 4 and all(v >= 1 for v in vals):
                return tuple(fit(v) for v in vals) if aligned else (1, 1, 1, 1)
        except ValueError:
            pass
        import warnings

        warnings.warn(
            f"REALPDEBENCH_FNO_BTBLK={env!r} is not 4 comma-separated "
            "positive ints; using defaults")
    if not aligned:
        return (1, 1, 1, 1)
    # Chip A/B (bench_results/r5/ab_experiments_r5.jsonl, chipwork14/15):
    # (4,2,2,1) = 4.836 steps/s, (8,4,4,1) = 4.918, (4,4,4,1) = 4.981,
    # (2,4,4,1) = 5.004, (4,4,4,2) = 5.086; full bench.py with (4,4,4,2)
    # = 5.093 in a 10-minute wall (bench_full_r5_k12b2.json).
    return (fit(4), fit(4), fit(4), fit(2))


@functools.lru_cache(maxsize=32)
def _layer_calls(BT: int, Hp: int, J: int, C2: int, m2: int, m3: int,
                 act: str, interpret: bool, x_dtype_str: str,
                 aligned: bool = False,
                 kks: tuple = (1, 1, 1, 1), tdims=None, selfuse=True,
                 k2alite: bool = False, spec=None):
    """The four pallas_calls of one layer (K1, K2 forward; K2A, K12B
    backward) for one static configuration. With ``aligned`` the
    activation blocks are the pre-padded 8-aligned [Hp8*J8, C2] layout
    (Strategy B from the mosaic relayout probe). ``kks`` = BT rows per
    grid block for (K1, K2, K2A, K12B). ``tdims=(T, Tp)`` enables the
    pad-early input masking (layer 1 only, see _read_x)."""
    x_dtype = jnp.dtype(x_dtype_str)
    Hp8, J8 = -(-Hp // 8) * 8, -(-J // 8) * 8
    R = Hp8 * J8 if aligned else Hp * J
    Y = 2 * m2 * m3
    # bf16 MXU multiplies iff the layer IO is already bf16 (compute_dtype)
    mxu = jnp.bfloat16 if x_dtype == jnp.bfloat16 else None
    # packed spectra (y, dg) cross the kernel↔mid boundary at the layer's
    # compute dtype: bf16 halves those HBM passes (the mid already runs
    # bf16 einsums in that regime); f32 layers keep f32 spectra bit-stable.
    # REALPDEBENCH_FNO_SPEC=f32 opts the boundary back to f32 so a
    # loss-curve regression can be bisected to this precision trade
    # (advisor r4) — it changes w_real/w_imag wgrad rounding, not traffic
    # semantics. ``spec`` arrives as a CACHE-KEY argument (read from the
    # env in fused_fno_layer, like TSTAGE/SELFUSE/K2ALITE) so in-process
    # flips rebuild the calls instead of hitting a stale lru entry.
    spec_dtype = x_dtype if mxu is not None else jnp.float32
    if spec is not None:
        spec_dtype = jnp.bfloat16 if spec == "bf16" else jnp.float32
    kw = dict(Hp=Hp, J=J, C2=C2, m3=m3, act=act, mxu=mxu, aligned=aligned,
              tdims=tdims, selfuse=selfuse)
    cp = dict(interpret=interpret, compiler_params=_COMPILER_PARAMS)
    kk1, kk2, kk2a, kk12b = kks
    k1 = pl.pallas_call(
        functools.partial(_k1_kernel, **kw, kk=kk1),
        grid=(BT // kk1,),
        in_specs=[_blk(kk1, R, C2), _full(), _full()] + [_full()] * 3,
        out_specs=_blk(kk1, Y, C2),
        out_shape=jax.ShapeDtypeStruct((BT, Y, C2), spec_dtype),
        **cp,
    )
    k2 = pl.pallas_call(
        functools.partial(_k2_kernel, **kw, kk=kk2),
        grid=(BT // kk2,),
        in_specs=[_blk(kk2, Y, C2), _blk(kk2, R, C2), _full(), _full(),
                  _full(), _full()] + [_full()] * 7,
        out_specs=(_blk(kk2, R, C2), _acc(2, C2)),
        out_shape=(jax.ShapeDtypeStruct((BT, R, C2), x_dtype),
                   jax.ShapeDtypeStruct((2, C2), jnp.float32)),
        **cp,
    )
    if k2alite:
        # ds-only adjoint: the (ds1, 2 ds2 s) terms become an in-kernel
        # mode-space correction off the blocked g/y residuals (see
        # _lite_consts) — one full-stream read instead of two
        k2a = pl.pallas_call(
            functools.partial(_k2a_lite_kernel, **kw, kk=kk2a),
            grid=(BT // kk2a,),
            in_specs=[_blk(kk2a, R, C2), _blk(kk2a, Y, C2),
                      _blk(kk2a, Y, C2)] + [_full()] * 11,
            out_specs=_blk(kk2a, Y, C2),
            out_shape=jax.ShapeDtypeStruct((BT, Y, C2), spec_dtype),
            **cp,
        )
    else:
        k2a = pl.pallas_call(
            functools.partial(_k2a_kernel, **kw, kk=kk2a),
            grid=(BT // kk2a,),
            in_specs=[_blk(kk2a, R, C2), _blk(kk2a, R, C2), _full(), _full()]
            + [_full()] * 5,
            out_specs=_blk(kk2a, Y, C2),
            out_shape=jax.ShapeDtypeStruct((BT, Y, C2), spec_dtype),
            **cp,
        )
    k12b = pl.pallas_call(
        functools.partial(_k12b_kernel, **kw, kk=kk12b),
        grid=(BT // kk12b,),
        in_specs=[_blk(kk12b, R, C2), _full(), _full(), _full(),
                  _blk(kk12b, R, C2), _blk(kk12b, R, C2), _full(), _full(),
                  _blk(kk12b, Y, C2)]
        + [_full()] * 7,
        out_specs=(_blk(kk12b, R, C2), _acc(C2, C2), _acc(3, C2)),
        out_shape=(jax.ShapeDtypeStruct((BT, R, C2), x_dtype),
                   jax.ShapeDtypeStruct((C2, C2), jnp.float32),
                   jax.ShapeDtypeStruct((3, C2), jnp.float32)),
        # dx overwrites the dead incoming cotangent ds (operand 5): the
        # roofline3 probe showed distinct in/out HBM buffers cost ~212 GB/s
        # vs ~311 aliased — the "pallas DMA ceiling" was an aliasing
        # artifact. Same block index map, so block i's ds read always
        # precedes block i's dx write; prefetch of ds[i+1] overlaps only
        # the disjoint dx[i] region. K12B is ds's last consumer (K2A runs
        # first), so XLA aliases without a protective copy.
        input_output_aliases={5: 0},
        **cp,
    )
    return k1, k2, k2a, k12b


@functools.lru_cache(maxsize=32)
def _make_layer(B: int, Tp: int, Hp: int, J: int, C: int,
                m1: int, m2: int, m3: int,
                act: str, interpret: bool, x_dtype_str: str,
                aligned: bool = False, kks: tuple = (1, 1, 1, 1),
                in_valid=None, tstage=None, selfuse=True,
                k2alite: bool = False, spec=None):
    """One fused FNO layer as a single custom_vjp:

      fwd:  K1 → mid_spectral (XLA) → K2
      bwd:  K2A → vjp(mid_spectral) (XLA) → K12B

    ``in_valid=(T, H, J0)`` marks the layer's input as pad-early (layer 1
    under FNO3d's early-padded head): x rows outside the true data extent
    hold fc0 bias rather than zeros, and the kernels zero them on read
    (and zero dx on write) to reproduce pad-after-fc0 semantics exactly.
    """
    C2, BT = 2 * C, B * Tp
    cst = _ct_consts(Hp, 2 * J, m2, m3)
    tdims = None if in_valid is None else (in_valid[0], Tp)
    # closure constants stay NUMPY: this factory is lru_cached, so any
    # jnp.asarray here would capture a tracer from whichever jit trace ran
    # first and leak it into later traces
    if k2alite:
        # fetch the lite statics BEFORE building the calls: a geometry the
        # structure fit rejects falls back to the proven full-read K2A
        # (one warning) instead of crashing the first trace
        try:
            alpha, beta, Dv, A1v = _lite_consts(Hp, 2 * J, m2, m3)
        except AssertionError as e:
            import warnings

            warnings.warn(f"K2A-lite disabled for this geometry: {e}")
            k2alite = False
    k1_call, k2_call, k2a_call, k12b_call = _layer_calls(
        BT, Hp, J, C2, m2, m3, act, interpret, x_dtype_str, aligned, kks,
        tdims, selfuse, k2alite, spec)
    if k2alite:
        Yd = alpha.shape[0]
        # kernel-ready [Y, C2] lane broadcasts of the per-(row, ri) scales
        lane = lambda v: np.ascontiguousarray(np.concatenate(
            [np.broadcast_to(v[:, 0:1], (Yd, C)),
             np.broadcast_to(v[:, 1:2], (Yd, C))], axis=1), np.float32)
        a1f, dff, alf, bef = lane(A1v), lane(Dv), lane(alpha), lane(beta)
    eyeC = np.eye(C, dtype=np.float32)
    zC = np.zeros((C, C), np.float32)
    selE = np.concatenate([eyeC, zC], axis=0)   # [2C, C]
    selO = np.concatenate([zC, eyeC], axis=0)
    selET = np.concatenate([eyeC, zC], axis=1)  # [C, 2C]
    selOT = np.concatenate([zC, eyeC], axis=1)
    Hp8, J8 = -(-Hp // 8) * 8, -(-J // 8) * 8
    Hr, Jr = (Hp8, J8) if aligned else (Hp, J)
    rows = np.arange(Hr * Jr)
    if aligned:
        mask = (((rows // J8) < Hp) & ((rows % J8) < J)).astype(
            np.float32)[:, None]                # [R8, 1] row validity
    else:
        mask = np.ones((Hp * J, 1), np.float32)
    if in_valid is None:
        xmask = np.ones((Hr * Jr, 1), np.float32)
    else:
        _, Hv, Jv = in_valid
        xmask = (((rows // Jr) < Hv) & ((rows % Jr) < Jv)).astype(
            np.float32)[:, None]                # true-data row validity
    k1_consts = (cst["E67X"], cst["EhP"], xmask)
    k2_consts = (cst["IhP"], cst["IwE2"], cst["IwO2"], selET, selOT, mask,
                 xmask)
    k2a_consts = (cst["IhPT"], cst["IwET"], cst["IwOT"], selE, selO)
    k12b_consts = (cst["EhPT"], cst["E67T"], cst["E67twT"], selET, selOT,
                   mask, xmask)

    x_dtype = jnp.dtype(x_dtype_str)

    def _fwd_impl(x, a, b, w_real, w_imag, wp, bp):
        a2, b2 = _pack_affine(a, b, C)
        wp2 = _block_diag2(wp.astype(jnp.float32))
        bp2 = jnp.concatenate([bp, bp], axis=1).astype(jnp.float32)
        y = k1_call(x, a2, b2, *k1_consts)
        g = mid_spectral(y, w_real, w_imag, B, Tp, mid_dtype=x_dtype,
                         tstage=tstage, interpret=interpret)
        s, stats = k2_call(g, x, a2, b2, wp2, bp2, *k2_consts)
        return (s, stats), (y, g)

    @jax.custom_vjp
    def layer(x, a, b, w_real, w_imag, wp, bp):
        out, _ = _fwd_impl(x, a, b, w_real, w_imag, wp, bp)
        return out

    def layer_f(x, a, b, w_real, w_imag, wp, bp):
        out, (y, g) = _fwd_impl(x, a, b, w_real, w_imag, wp, bp)
        # g is a residual only on the lite path (the 20 MB mode tensor
        # buys back a full-stream read in the backward)
        return out, (x, a, b, w_real, w_imag, wp, bp, y,
                     g if k2alite else None, out[0])

    def layer_b(res, cot):
        x, a, b, w_real, w_imag, wp, bp, y, g, s = res
        ds, dstats = cot
        ds1, ds2 = dstats[0:1], dstats[1:2]
        a2, b2 = _pack_affine(a, b, C)
        wp2t = _block_diag2(wp.astype(jnp.float32)).T
        if k2alite:
            # in-kernel correction: dg = A(ds) + ds1*A1 + 2 ds2 * A(s)
            # with A(s) from the blocked g/y mode residuals (ds1/ds2 have
            # equal parity halves — the stats consumer folds parities —
            # so the (p, c) lane vectors read correctly as (ri, c)).
            # 2*ds2 folds into wp2s' columns and the dsc rows here, so the
            # kernel's per-block work is elementwise + ONE small dot.
            bp2 = jnp.concatenate([bp, bp], axis=1).astype(jnp.float32)
            wp2 = _block_diag2(wp.astype(jnp.float32))
            ds2x2 = 2.0 * ds2.astype(jnp.float32)
            dsc = jnp.concatenate(
                [ds1.astype(jnp.float32) + ds2x2 * bp2, ds2x2], axis=0)
            wp2s = wp2 * ds2x2[0][None, :]
            dg = k2a_call(ds, g, y, dsc, wp2s, *k2a_consts,
                          alf, bef, a1f, dff)
        else:
            dg = k2a_call(s, ds, ds1, ds2, *k2a_consts)
        # the XLA mid-section is linear in y and in the weights; its vjp
        # carries the spectral-weight gradients and maps dg back to dy
        _, mid_vjp = jax.vjp(
            lambda y_, wr_, wi_: mid_spectral(y_, wr_, wi_, B, Tp,
                                              mid_dtype=x_dtype,
                                              tstage=tstage,
                                              interpret=interpret),
            y, w_real, w_imag)
        dy, dwr, dwi = mid_vjp(dg)
        dx, dwp2, dvec = k12b_call(x, a2, b2, wp2t, s, ds, ds1, ds2, dy,
                                   *k12b_consts)
        dwp = dwp2[:C, :C] + dwp2[C:, C:]
        fold = lambda r: r[:, :C] + r[:, C:]
        return (dx, fold(dvec[1:2]), fold(dvec[2:3]), dwr, dwi, dwp,
                fold(dvec[0:1]))

    layer.defvjp(layer_f, layer_b)
    return layer


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


# ---------------------------------------------------------------------------
# T-stage pallas kernels: contract the t axis without XLA's spectrum copies
# ---------------------------------------------------------------------------
#
# The round-4 K3-code profile showed ~18 ms/step of `copy` glue: every
# T-DFT/inverse-T einsum ("btyl,tk->bkyl") makes XLA relayout the packed
# spectrum [B, Tp, Y, C2] into a t-sublane layout {3,1,2,0} first — a full
# read+write of the 82 MB tensor per einsum, ~16-22 times per step. These
# kernels do the t-contraction straight from the kernels' natural
# [B·Tin, Y, C2] row layout, so the spectra never take a relayout pass:
#
#   out[b·Tout+k, y, l] = Σ_t MR[t,k]·y[b·Tin+t, y, l]
#                       + Σ_m S[m,l]·(Σ_t MI[t,k]·y[b·Tin+t, y, m])
#
# (S = [[0,I],[-I,0]] is the lane-half swap that carries the complex cross
# terms in the [re | im] lane packing — same selection-GEMM trick as
# _mid_spectral_packed, and it commutes with the t-contraction.)
#
# Two in-kernel formulations, selected by REALPDEBENCH_FNO_TSTAGE
# (default 'mxu'; 'vpu' is the A/B alternative; 'xla' restores the einsums):
#   * 'mxu': one dim0-of-2D dot against [MR | MI] on the lane-merged
#     [Tin, Y·C2] view (one Mosaic relayout of the 2.6 MB block, then MXU);
#   * 'vpu': unrolled scalar-FMA accumulation over t planes — MR/MI are
#     compile-time python floats, each output row-image is a Σ_t of
#     [Y, C2] vreg planes (no relayout at all, ~0.3 M vreg-FMAs/block).
# The linear map's adjoint is the same kernel with (MRᵀ, -MIᵀ), wrapped in
# a custom_vjp so autodiff through mid_spectral keeps working.


def _tstage_mxu_kernel(y_ref, m12_ref, s_ref, o_ref, *, Tin, Tout, To8, mxu):
    Yc, C2 = y_ref.shape[1], y_ref.shape[2]
    yv = y_ref[...].reshape(Tin, Yc * C2)
    z12 = _dot(m12_ref[:], yv, (((1,), (0,))), mxu)     # [2·To8, Yc·C2]
    z3 = z12.reshape(2 * To8, Yc, C2)
    z1 = z3[0:Tout]
    z2 = z3[To8:To8 + Tout]
    z2s = _dot(z2, s_ref[:], (((2,), (0,))), mxu)       # minormost-of-3D
    o_ref[...] = (z1 + z2s).astype(o_ref.dtype)


def _tstage_vpu_kernel(y_ref, s_ref, o_ref, *, MR, MI, Tin, Tout, mxu):
    planes = [y_ref[t].astype(jnp.float32) for t in range(Tin)]

    def comb(M, k):
        terms = [planes[t] * float(M[t, k]) for t in range(Tin)
                 if M[t, k] != 0.0]
        return functools.reduce(lambda a, b: a + b, terms) if terms else (
            jnp.zeros_like(planes[0]))

    z1 = jnp.stack([comb(MR, k) for k in range(Tout)], axis=0)
    z2 = jnp.stack([comb(MI, k) for k in range(Tout)], axis=0)
    z2s = _dot(z2, s_ref[:], (((2,), (0,))), mxu)
    o_ref[...] = (z1 + z2s).astype(o_ref.dtype)


def _tstage_mats(kind: str, Tp: int, m1: int):
    """(MR, MI) for the four linear T-stage maps. 'et': Tp→2m1 forward
    T-DFT; 'it': 2m1→Tp inverse; '*_adj': their adjoints (MRᵀ, -MIᵀ —
    Sᵀ = -S carries the sign)."""
    EtR, EtI, ItR, ItI = _t_consts(Tp, m1)
    if kind == "et":
        return EtR, EtI
    if kind == "it":
        return ItR, ItI
    if kind == "et_adj":
        return (np.ascontiguousarray(EtR.T),
                np.ascontiguousarray(-EtI.T))
    if kind == "it_adj":
        return (np.ascontiguousarray(ItR.T),
                np.ascontiguousarray(-ItI.T))
    raise ValueError(kind)


@functools.lru_cache(maxsize=64)
def _make_tstage(kind: str, Tp: int, m1: int, B: int, Y: int, C2: int,
                 dtype_str: str, variant: str, interpret: bool):
    MR, MI = _tstage_mats(kind, Tp, m1)
    Tin, Tout = MR.shape
    dtype = jnp.dtype(dtype_str)
    mxu = jnp.bfloat16 if dtype == jnp.bfloat16 else None
    C = C2 // 2
    eyeC = np.eye(C, dtype=np.float32)
    zC = np.zeros((C, C), np.float32)
    S = np.block([[zC, eyeC], [-eyeC, zC]]).astype(np.float32)
    cp = dict(interpret=interpret, compiler_params=_COMPILER_PARAMS)
    if variant == "mxu":
        To8 = -(-Tout // 8) * 8
        pad = lambda M: np.pad(M, ((0, 0), (0, To8 - Tout)))
        m12 = np.concatenate([pad(MR), pad(MI)], axis=1).T  # [2·To8, Tin]
        call = pl.pallas_call(
            functools.partial(_tstage_mxu_kernel, Tin=Tin, Tout=Tout,
                              To8=To8, mxu=mxu),
            grid=(B,),
            in_specs=[_blk(Tin, Y, C2), _full(), _full()],
            out_specs=_blk(Tout, Y, C2),
            out_shape=jax.ShapeDtypeStruct((B * Tout, Y, C2), dtype),
            **cp,
        )
        return lambda y: call(y, m12, S)
    if variant == "vpu":
        call = pl.pallas_call(
            functools.partial(_tstage_vpu_kernel, MR=MR, MI=MI, Tin=Tin,
                              Tout=Tout, mxu=mxu),
            grid=(B,),
            in_specs=[_blk(Tin, Y, C2), _full()],
            out_specs=_blk(Tout, Y, C2),
            out_shape=jax.ShapeDtypeStruct((B * Tout, Y, C2), dtype),
            **cp,
        )
        return lambda y: call(y, S)
    raise ValueError(variant)


_TSTAGE_ADJ = {"et": "et_adj", "it": "it_adj",
               "et_adj": "et", "it_adj": "it"}


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def t_stage(y, kind, Tp, m1, variant, interpret):
    """Pallas t-contraction on packed spectra: [B·Tin, Y, C2] →
    [B·Tout, Y, C2] with (Tin, Tout) set by ``kind`` (see _tstage_mats).
    B is derived from the row count; the spectra keep the kernels' natural
    row layout end to end (no XLA relayout copy)."""
    MR, _ = _tstage_mats(kind, Tp, m1)
    B = y.shape[0] // MR.shape[0]
    fn = _make_tstage(kind, Tp, m1, B, y.shape[1], y.shape[2],
                      str(y.dtype), variant, interpret)
    return fn(y)


def _t_stage_fwd(y, kind, Tp, m1, variant, interpret):
    return t_stage(y, kind, Tp, m1, variant, interpret), None


def _t_stage_bwd(kind, Tp, m1, variant, interpret, _res, dout):
    return (t_stage(dout, _TSTAGE_ADJ[kind], Tp, m1, variant, interpret),)


t_stage.defvjp(_t_stage_fwd, _t_stage_bwd)


def _flavored_einsum(use_bf16: bool):
    """The mid-section einsum flavor as a function of the static flag:
    bf16 operands + f32 accumulation, or plain f32."""
    if not use_bf16:
        return jnp.einsum
    dt = jnp.bfloat16
    # this CPU thunk runtime cannot lower BF16xBF16=F32 dots
    pet = (None if jax.default_backend() == "cpu" else jnp.float32)
    _es = jnp.einsum

    def jnp_einsum(eq_, a, b):
        return _es(eq_, a.astype(dt), b.astype(dt),
                   preferred_element_type=pet).astype(jnp.float32)

    return jnp_einsum


def _mid_einsum(mid_dtype):
    """Select the mid-section einsum flavor: bf16 operands + f32 accumulation
    when the fused layer itself runs bf16 (halves HBM traffic, ~1e-3 rel
    err), plain f32 otherwise. ``REALPDEBENCH_FNO_MID=bf16|f32`` overrides
    either way (A/B runs)."""
    from realpdebench_tpu.utils.misc import env_choice

    env = env_choice("REALPDEBENCH_FNO_MID", ("bf16", "f32"), None)
    use_bf16 = (env == "bf16" if env is not None
                else mid_dtype == jnp.bfloat16)
    return _flavored_einsum(use_bf16), use_bf16


def _pack_w2(w_real, w_imag, dtype=None):
    """2x2 block-complex corner weight: [re | im] input lanes are mixed to
    [re | im] output lanes by ``[[wr, wi], [-wi, wr]]``
    ([4, m., 2Ci, 2Co] — channels-minor storage, see models/fno.py).

    ``dtype`` casts the halves BEFORE packing (identical rounding to casting
    the packed result, half the concat/negate traffic when bf16)."""
    if dtype is not None:
        w_real = w_real.astype(dtype)
        w_imag = w_imag.astype(dtype)
    top = jnp.concatenate([w_real, w_imag], axis=-1)
    bot = jnp.concatenate([-w_imag, w_real], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _corner_gemm(use_bf16, x2, w_real, w_imag):
    """Corner GEMM with a direct weight-gradient VJP.

    Autodiff of ``einsum(x2, pack(wr, wi))`` materializes the x4-duplicated
    ``dw2`` ([4, 2C, 2C, m1, m2, m3] f32 ≈ 201 MB per layer at headline
    scale — the `convert_bitcast_fusion.23-26` sites in the round-4 trace)
    and folds it back to dwr/dwi through slice+add+convert fusions. The
    custom VJP computes the four half-lane dwr/dwi einsums directly
    (50 MB outputs) — half the HBM writes, no converts."""
    e = _flavored_einsum(use_bf16)
    w2 = _pack_w2(w_real, w_imag, jnp.bfloat16 if use_bf16 else None)
    return e("bkxyzi,kxyzio->bkxyzo", x2, w2)


def _corner_gemm_fwd(use_bf16, x2, w_real, w_imag):
    e = _flavored_einsum(use_bf16)
    w2 = _pack_w2(w_real, w_imag, jnp.bfloat16 if use_bf16 else None)
    return e("bkxyzi,kxyzio->bkxyzo", x2, w2), (x2, w2)


def _corner_gemm_bwd(use_bf16, res, dg):
    x2, w2 = res
    e = _flavored_einsum(use_bf16)
    ci, co = x2.shape[-1] // 2, dg.shape[-1] // 2
    dx2 = e("bkxyzo,kxyzio->bkxyzi", dg, w2)
    xr, xi = x2[..., :ci], x2[..., ci:]
    dgr, dgi = dg[..., :co], dg[..., co:]
    # out_r = xr wr - xi wi ; out_i = xr wi + xi wr  (per corner k)
    wg = "bkxyzi,bkxyzo->kxyzio"
    dwr = e(wg, xr, dgr) + e(wg, xi, dgi)
    dwi = e(wg, xr, dgi) - e(wg, xi, dgr)
    return dx2, dwr, dwi


_corner_gemm.defvjp(_corner_gemm_fwd, _corner_gemm_bwd)


def _mid_spectral_packed(y, w_real, w_imag, B, Tp, jnp_einsum, use_bf16,
                         tstage=None, interpret=False):
    """Packed-lane mid-section: the [re*C | im*C] lane packing of the
    spectra is kept END TO END, so the 128-lane dim is never split.

    The round-4 trace showed the original split-lane form's
    ``reshape(..., 2, C)`` forces T(2,128) layout copies of every spectrum
    tensor (8 copies + assorted bitcast fusions ≈ 12 ms/step at headline
    scale). Here complex arithmetic rides the lane packing instead:

      * a T-stage complex multiply (E_R + i·E_I)·(y_r + i·y_i) is two
        t-contractions on full-lane tensors — ``einsum(y, E_R) +
        einsum(y@S, E_I)`` where ``S = [[0, I], [-I, 0]]`` maps lanes
        [yr | yi] ↦ [-yi | yr] as ONE 128x128 MXU pass (the kernels use
        the same selection-GEMM trick; lane slices are relayouts, dots
        are not);
      * the corner mixing consumes the packed lanes DIRECTLY: the 2x2
        block-complex weight ``[[wr, wi], [-wi, wr]]`` contracts
        [re | im] input lanes to [re | im] output lanes — the split
        form's concat/split around the corner GEMM disappears.

    Identical math to the split-lane form (pure reordering)."""
    _, m1, m2, m3, Cin, Cout = w_real.shape
    BT, Y, C2 = y.shape
    C = C2 // 2
    EtR, EtI, ItR, ItI = (jnp.asarray(t) for t in _t_consts(Tp, m1))
    eyeC = np.eye(C, dtype=np.float32)
    zC = np.zeros((C, C), np.float32)
    # [yr | yi] @ S = [-yi | yr]
    S = jnp.asarray(np.block([[zC, eyeC], [-eyeC, zC]]))

    if tstage is not None:
        # pallas t-contraction straight off the kernels' row layout — the
        # XLA path below relayouts the full spectrum to a t-sublane layout
        # for every einsum (~18 ms/step of `copy` in the round-4 K3 trace)
        z = t_stage(y, "et", Tp, m1, tstage, interpret)  # [B·2m1, Y, C2]
        z5 = z.reshape(B, 2 * m1, 2 * m2, m3, C2)
    else:
        y4 = y.reshape(B, Tp, Y, C2)
        # forward T-DFT: zr = Et_R yr - Et_I yi ; zi = Et_I yr + Et_R yi
        #   = einsum(y, EtR) + einsum(y, EtI) @ S, lane-packed. The S
        #   lane-swap commutes with the t-contraction, so it runs on the
        #   SMALL [B, 2m1, Y, C2] side (2m1=8 vs Tp=26 rows at headline
        #   scale) and the full-size ySw tensor never materializes
        zI = jnp_einsum("btyl,tk->bkyl", y4, EtI)
        z = (jnp_einsum("btyl,tk->bkyl", y4, EtR)
             + jnp_einsum("bkyl,lm->bkym", zI, S))   # [B, 2m1, Y, C2]
        z5 = z.reshape(B, 2 * m1, 2 * m2, m3, C2)

    x2 = jnp.stack(
        [z5[:, :m1, :m2], z5[:, m1:, :m2], z5[:, :m1, m2:], z5[:, m1:, m2:]],
        axis=1)                                     # [B, 4, m1, m2, m3, 2C]
    from realpdebench_tpu.utils.misc import env_flag

    if env_flag("REALPDEBENCH_FNO_CORNER_VJP", default=True):
        out2 = _corner_gemm(use_bf16, x2, w_real, w_imag)
    else:  # A/B: autodiff through the packed w2 (duplicated dw2 + converts)
        out2 = jnp_einsum("bkxyzi,kxyzio->bkxyzo", x2, _pack_w2(w_real, w_imag))

    gtop = jnp.concatenate([out2[:, 0], out2[:, 2]], axis=2)
    gbot = jnp.concatenate([out2[:, 1], out2[:, 3]], axis=2)
    g5 = jnp.concatenate([gtop, gbot], axis=1)      # [B, 2m1, 2m2, m3, 2Co]
    g4 = g5.reshape(B, 2 * m1, 2 * m2 * m3, 2 * Cout)
    if tstage is not None:
        g3 = g4.reshape(B * 2 * m1, Y, 2 * Cout).astype(y.dtype)
        return t_stage(g3, "it", Tp, m1, tstage, interpret)  # [B·Tp, Y, 2Co]
    gSw = jnp_einsum("bkyl,lm->bkym", g4, S)
    # inverse T: tr = It_R gr - It_I gi ; ti = It_I gr + It_R gi
    t = (jnp_einsum("bkyl,kt->btyl", g4, ItR)
         + jnp_einsum("bkyl,kt->btyl", gSw, ItI))   # [B, Tp, Y, 2Co]
    # the kernel↔mid boundary stays at the spectra dtype (bf16 when the
    # fused layer runs bf16) — see spec_dtype in _layer_calls
    return t.reshape(BT, Y, 2 * Cout).astype(y.dtype)


def mid_spectral(y, w_real, w_imag, B, Tp, mid_dtype=None, tstage=None,
                 interpret=False):
    """Packed spectra [BT, 2m2*m3, 2C] → T-DFT → corner-block channel mixing
    (fno.py:53-60 order) → inverse T → same packed shape.

    All tensors here are O(B·T·m2·m3·C) — a few MB; the corner mixing runs
    in plain XLA so autodiff produces the w_real/w_imag gradients.

    Default path: lane-packed complex arithmetic + 2x2 block-complex corner
    GEMM (`_mid_spectral_packed`). ``tstage`` ('mxu' | 'vpu', from the
    fused layer) routes the T-DFT/inverse-T through the pallas t_stage
    kernels instead of XLA einsums (kills the full-spectrum relayout
    copies); None keeps the einsums (direct callers, tests, A/B).
    ``REALPDEBENCH_FNO_CORNER=split`` selects the original split-lane
    real/imag form (A/B runs; also the reference shape for the
    block-corner parity test)."""
    import os

    jnp_einsum, use_bf16 = _mid_einsum(mid_dtype)
    if os.environ.get("REALPDEBENCH_FNO_CORNER", "block") == "block":
        return _mid_spectral_packed(y, w_real, w_imag, B, Tp, jnp_einsum,
                                    use_bf16, tstage=tstage,
                                    interpret=interpret)

    _, m1, m2, m3, Cin, Cout = w_real.shape
    BT, Y, C2 = y.shape
    C = C2 // 2
    EtR, EtI, ItR, ItI = (jnp.asarray(t) for t in _t_consts(Tp, m1))

    y6 = y.reshape(B, Tp, 2 * m2, m3, 2, C)
    yr = y6[..., 0, :]
    yi = y6[..., 1, :]                             # [B, Tp, 2m2, m3, C]
    zr = jnp_einsum("btjmc,tk->bkjmc", yr, EtR) - jnp_einsum(
        "btjmc,tk->bkjmc", yi, EtI)
    zi = jnp_einsum("btjmc,tk->bkjmc", yr, EtI) + jnp_einsum(
        "btjmc,tk->bkjmc", yi, EtR)

    def corners(z):
        return jnp.stack(
            [z[:, :m1, :m2], z[:, m1:, :m2], z[:, :m1, m2:], z[:, m1:, m2:]],
            axis=1)  # [B, 4, m1, m2, m3, C]

    cr, ci = corners(zr), corners(zi)
    # corner dims (b, 4, m1, m2, m3, cin) match the reference contraction
    # order directly (weights [4, m1, m2, m3, Cin, Cout], fno.py:53-60)
    eq = "bkxyzi,kxyzio->bkxyzo"
    outr = jnp_einsum(eq, cr, w_real) - jnp_einsum(eq, ci, w_imag)
    outi = jnp_einsum(eq, cr, w_imag) + jnp_einsum(eq, ci, w_real)

    def regrid(o):
        top = jnp.concatenate([o[:, 0], o[:, 2]], axis=2)
        bot = jnp.concatenate([o[:, 1], o[:, 3]], axis=2)
        return jnp.concatenate([top, bot], axis=1)  # [B, 2m1, 2m2, m3, Cout]

    gr_, gi_ = regrid(outr), regrid(outi)
    tr = jnp_einsum("bkjmc,kt->btjmc", gr_, ItR) - jnp_einsum(
        "bkjmc,kt->btjmc", gi_, ItI)
    ti = jnp_einsum("bkjmc,kt->btjmc", gr_, ItI) + jnp_einsum(
        "bkjmc,kt->btjmc", gi_, ItR)
    g = jnp.stack([tr, ti], axis=4)                # [B, Tp, 2m2, m3, 2, C]
    return g.reshape(BT, Y, C2).astype(y.dtype)


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
                    interpret=False, aligned=False, in_valid=None):
    """One fused FNO layer on packed flat activations.

    ``in_valid=(T, H, J0)`` (layer 1 under the pad-early head): x rows
    outside the true data extent hold fc0 bias, not zeros; the kernels
    zero them on read and zero dx on write (see _read_x).

    Args:
      x: [B*Tp, Hp*(Wp//2), 2C] pre-BN activations of the previous layer
        (flatten_cw layout) — or, with ``aligned``, the 8-aligned
        [B*Tp, Hp8*J8, 2C] layout (rows (h, j) with h >= Hp or j >= Wp//2
        are alignment padding; the returned ``s`` keeps that layout and
        the BN statistics exclude the padded rows).
      a, b: [1, C] BN affine folded from the previous layer (a=1, b=0 and
        act='none' for the first layer).
      w_real/w_imag: [4, m1, m2, m3, C, C] spectral corner weights
        (channels-minor storage, see models/fno.py::_spectral_params).
      wp: [C, C] pointwise mixing kernel; bp: [1, C] its bias.
      dims: (B, Tp, Hp, Wp, C).
      act: 'none' | 'tanh' | 'exact' — the activation folded at input.
    Returns: (s, stats128) — s like x (this layer's pre-BN output);
      stats128 [2, 2C] per-(parity, channel) (sum, sumsq) of s; fold the
      parity halves ([:, :C] + [:, C:]) for per-channel BN statistics.
    """
    B, Tp, Hp, Wp, C = dims
    m1, m2, m3 = w_real.shape[1], w_real.shape[2], w_real.shape[3]
    kks = _bt_blocks(B * Tp, aligned)
    # T-stage variant for the mid-section: pallas t-contraction ('mxu' |
    # 'vpu') vs the XLA einsums ('xla'); an lru key so in-process flips
    # (tests, A/B) rebuild the layer
    from realpdebench_tpu.utils.misc import env_choice, env_flag

    _ts = env_choice("REALPDEBENCH_FNO_TSTAGE", ("mxu", "vpu", "xla"), "mxu")
    tstage = None if _ts == "xla" else _ts

    selfuse = env_flag("REALPDEBENCH_FNO_SELFUSE", default=True)
    # K2A-lite: backward reads only ds (A(s) reconstructed from saved mode-
    # space residuals, see _lite_consts) — one full stream instead of two
    k2alite = env_flag("REALPDEBENCH_FNO_K2ALITE", default=True)
    spec = env_choice("REALPDEBENCH_FNO_SPEC", ("bf16", "f32"), None)
    layer = _make_layer(B, Tp, Hp, Wp // 2, C, m1, m2, m3, act, interpret,
                        str(x.dtype), aligned, kks, in_valid, tstage,
                        selfuse, k2alite, spec)
    return layer(x, a, b, w_real, w_imag, wp, bp)


def reference_fused_fno_layer(x, a, b, w_real, w_imag, wp, bp, *, dims, act,
                              in_valid=None):
    """Pure-jnp oracle for the fused layer (tests + non-TPU fallback):
    identical math via ops/spectral.truncated_spectral_conv3d_dft on the
    unflattened layout. ``in_valid=(T, H, J0)`` zeroes x outside the true
    data extent (pad-early semantics; dx masking follows from autodiff)."""
    from realpdebench_tpu.ops.spectral import truncated_spectral_conv3d_dft

    B, Tp, Hp, Wp, C = dims
    x5 = unflatten_cw(x, B, Tp, Hp, Wp, C)
    if in_valid is not None:
        T, Hv, Jv = in_valid
        tm = (jnp.arange(Tp) < T).astype(x5.dtype)
        hm = (jnp.arange(Hp) < Hv).astype(x5.dtype)
        wm = (jnp.arange(Wp) < 2 * Jv).astype(x5.dtype)
        x5 = (x5 * tm[None, :, None, None, None]
              * hm[None, None, :, None, None]
              * wm[None, None, None, :, None])
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
