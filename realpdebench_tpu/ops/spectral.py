"""Spectral (Fourier-domain) ops shared by FNO / DPOT-AFNO / GK-decoder.

Functional spec: the reference 3-D spectral convolution
(`realpdebench/model/fno.py:16-64`) — rfftn over (T,H,W), complex per-mode
channel mixing on the four low-frequency corner blocks, zero elsewhere,
irfftn back.

TPU design notes:
  * channels-last layout throughout — [B, T, H, W, C] — so the channel
    contraction is the innermost (lane) dimension feeding the MXU;
  * the four corner blocks are processed with ONE batched einsum
    (stacked on a leading block axis) instead of four sequential ones —
    XLA lowers it to a single batched complex GEMM;
  * FFTs run in float32/complex64 (TPU has no bf16 FFT path); the caller
    may hold activations in bf16 and we up-cast here;
  * weights are stored as separate real/imag float32 arrays: friendlier to
    optimizers, orbax checkpoints, and torch interop than native complex.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _bf16_dot_dtype(dt):
    """bf16 for the corner contraction where the backend can run it.

    XLA:CPU's thunk runtime cannot execute a direct batched
    bf16 x bf16 -> f32 dot (the channels-minor weight order lowers to one);
    TPU runs it natively on the MXU. On CPU fall back to f32 operands —
    slightly more accurate, test-only path."""
    if dt == jnp.bfloat16 and jax.default_backend() == "cpu":
        return jnp.float32
    return dt


def truncated_spectral_conv3d_fft(x, w_real, w_imag):
    """Mode-truncated spectral conv.

    Args:
      x: [B, T, H, W, C_in] real (any float dtype; FFT math in f32).
      w_real/w_imag: [4, m1, m2, m3, C_in, C_out] — the four corner blocks in
        reference order (+T+H, -T+H, +T-H, -T-H; fno.py:53-60). m3 indexes the
        non-negative rfft axis (W). Channels are the two MINOR dims so the
        stored layout is exactly what the corner GEMM wants — XLA inserts no
        per-step relayout copies of params/grads/optimizer state (the round-4
        HLO showed ~2.4 GB/step of them with channels-major storage).

    Returns: [B, T, H, W, C_out] real, float32.
    """
    B, T, H, W, Cin = x.shape
    _, m1, m2, m3, _, Cout = w_real.shape

    x32 = x.astype(jnp.float32)
    x_ft = jnp.fft.rfftn(x32, axes=(1, 2, 3))  # [B, T, H, W//2+1, Cin] c64

    corners = jnp.stack(
        [
            x_ft[:, :m1, :m2, :m3, :],
            x_ft[:, -m1:, :m2, :m3, :],
            x_ft[:, :m1, -m2:, :m3, :],
            x_ft[:, -m1:, -m2:, :m3, :],
        ],
        axis=1,
    )  # [B, 4, m1, m2, m3, Cin]

    w = (w_real + 1j * w_imag).astype(jnp.complex64)  # [4, m1,m2,m3, Cin,Cout]
    # one batched complex contraction over Cin for all 4 corner blocks
    out_corners = jnp.einsum(
        "bkxyzi,kxyzio->bkxyzo", corners, w, preferred_element_type=jnp.complex64
    )  # [B, 4, m1, m2, m3, Cout]

    Wr = W // 2 + 1
    out_ft = jnp.zeros((B, T, H, Wr, Cout), jnp.complex64)
    out_ft = out_ft.at[:, :m1, :m2, :m3, :].set(out_corners[:, 0])
    out_ft = out_ft.at[:, -m1:, :m2, :m3, :].set(out_corners[:, 1])
    out_ft = out_ft.at[:, :m1, -m2:, :m3, :].set(out_corners[:, 2])
    out_ft = out_ft.at[:, -m1:, -m2:, :m3, :].set(out_corners[:, 3])

    return jnp.fft.irfftn(out_ft, s=(T, H, W), axes=(1, 2, 3))


def grid_features(shape, dtype=jnp.float32):
    """Normalized (t, y, x) coordinate channels for one sample of shape
    [T, H, W]; reference FNO appends these before lifting (fno.py:135-143,
    linspace(0, 1, n) along each of the three leading axes)."""
    T, H, W = shape
    gt = jnp.linspace(0, 1, T, dtype=dtype)[:, None, None, None]
    gy = jnp.linspace(0, 1, H, dtype=dtype)[None, :, None, None]
    gx = jnp.linspace(0, 1, W, dtype=dtype)[None, None, :, None]
    return (
        jnp.broadcast_to(gt, (T, H, W, 1)),
        jnp.broadcast_to(gy, (T, H, W, 1)),
        jnp.broadcast_to(gx, (T, H, W, 1)),
    )


# ---------------------------------------------------------------------------
# Truncated DFT-as-matmul path
# ---------------------------------------------------------------------------
#
# TPU FFTs degrade badly on grids with large prime factors (the FNO's +6
# non-periodic padding produces sizes like 26, 70, 134 = 2·67 → Bluestein).
# But the spectral conv only KEEPS (m1, m2, m3) ≪ grid modes, so the exact
# same math can be three small dense DFT matmuls per direction — >97% of the
# spectrum is never computed, every FLOP lands on the MXU, and the result is
# bit-equal to the FFT path up to float rounding.

from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=64)
def _dft_factors(T: int, H: int, W: int, m1: int, m2: int, m3: int):
    """Forward DFT matrices restricted to the kept corner modes.

    Ew: [W, m3]   — rfft axis, modes 0..m3-1
    Eh: [H, 2m2]  — modes [0..m2-1] ++ [H-m2..H-1]
    Et: [T, 2m1]  — modes [0..m1-1] ++ [T-m1..T-1]
    and the inverse-pass matrices (conjugate transposes with irfft weights).
    """
    def fwd(n, ks):
        idx = np.arange(n)[:, None]
        return np.exp(-2j * np.pi * idx * np.asarray(ks)[None, :] / n)

    kw = np.arange(m3)
    kh = np.concatenate([np.arange(m2), np.arange(H - m2, H)])
    kt = np.concatenate([np.arange(m1), np.arange(T - m1, T)])
    Ew = fwd(W, kw).astype(np.complex64)
    Eh = fwd(H, kh).astype(np.complex64)
    Et = fwd(T, kt).astype(np.complex64)

    # inverse: ifft over T and H on the kept modes; irfft over W with the
    # Hermitian-doubling weights (c_0 = 1, c_{k>0} = 2) and real projection.
    # The Nyquist bin (k = W/2, even W) is its own conjugate: weight 1, and
    # its sin row is identically zero so the imaginary part drops — matching
    # numpy irfft when the mode budget reaches the full rfft width.
    It = np.conj(Et).T / T                       # [2m1, T]
    Ih = np.conj(Eh).T / H                       # [2m2, H]
    nyq = (W % 2 == 0) & (kw == W // 2)
    c = np.where((kw == 0) | nyq, 1.0, 2.0) / W
    theta = 2 * np.pi * np.outer(kw, np.arange(W)) / W
    Iw_re = (c[:, None] * np.cos(theta)).astype(np.float32)   # [m3, W]
    Iw_im = (-c[:, None] * np.sin(theta)).astype(np.float32)  # [m3, W]
    return Ew, Eh, Et, It, Ih, Iw_re, Iw_im


def truncated_spectral_conv3d_dft(x, w_real, w_imag):
    """Drop-in equivalent of `truncated_spectral_conv3d` computed with
    truncated DFT matmuls instead of full FFTs (exact to float rounding).

    Contraction order is chosen to keep intermediates small: forward
    W → H → T (each step shrinks an axis to its mode budget), inverse
    T → H → W (each step grows one axis back).
    """
    B, T, H, W, Cin = x.shape
    _, m1, m2, m3, _, Cout = w_real.shape
    Ew, Eh, Et, It, Ih, Iw_re, Iw_im = _dft_factors(T, H, W, m1, m2, m3)
    Ew = jnp.asarray(Ew)
    Eh = jnp.asarray(Eh)
    Et = jnp.asarray(Et)
    It = jnp.asarray(It)
    Ih = jnp.asarray(Ih)
    Iw_re = jnp.asarray(Iw_re)
    Iw_im = jnp.asarray(Iw_im)

    x32 = x.astype(jnp.float32)
    # forward: real input → W modes (complex), then H, then T
    fw = jnp.einsum("bthwc,wi->bthic", x32, Ew)            # [B,T,H,m3,C] c64
    fh = jnp.einsum("bthic,hj->btjic", fw, Eh)             # [B,T,2m2,m3,C]
    ft = jnp.einsum("btjic,tk->bkjic", fh, Et)             # [B,2m1,2m2,m3,C]

    # corner blocks in reference order (+T+H, -T+H, +T-H, -T-H)
    corners = jnp.stack(
        [
            ft[:, :m1, :m2], ft[:, m1:, :m2],
            ft[:, :m1, m2:], ft[:, m1:, m2:],
        ],
        axis=1,
    )  # [B, 4, m1, m2, m3, Cin]

    wc = (w_real + 1j * w_imag).astype(jnp.complex64)
    out_c = jnp.einsum("bkxyzi,kxyzio->bkxyzo", corners, wc,
                       preferred_element_type=jnp.complex64)

    # reassemble the [2m1, 2m2] corner grid and invert T → H → W
    top = jnp.concatenate([out_c[:, 0], out_c[:, 2]], axis=2)   # +T rows
    bot = jnp.concatenate([out_c[:, 1], out_c[:, 3]], axis=2)   # -T rows
    g = jnp.concatenate([top, bot], axis=1)  # [B, 2m1, 2m2, m3, Cout]

    it = jnp.einsum("bkjic,kt->btjic", g, It)              # [B,T,2m2,m3,C]
    ih = jnp.einsum("btjic,jh->bthic", it, Ih)             # [B,T,H,m3,C]
    y = (
        jnp.einsum("bthic,iw->bthwc", ih.real, Iw_re)
        + jnp.einsum("bthic,iw->bthwc", ih.imag, Iw_im)
    )
    return y


def truncated_spectral_conv3d(x, w_real, w_imag, impl: str | None = None,
                              compute_dtype=jnp.float32):
    """Public entry. Implementations:
      * 'dft'  (default) — truncated-DFT with complex math unrolled into REAL
        matmuls (f32 or bf16 per ``compute_dtype``, f32 accumulation).
        Real arithmetic is deliberate: some TPU runtimes cannot lower
        complex dots, and real GEMMs are what the MXU natively runs
        anyway. Exact vs FFT at f32.
      * 'fft'      — full rfftn/irfftn (env REALPDEBENCH_SPECTRAL=fft);
      * 'dft_c64'  — the complex-einsum DFT variant (kept for testing)."""
    import os

    impl = impl or os.environ.get("REALPDEBENCH_SPECTRAL", "dft")
    if impl == "fft":
        return truncated_spectral_conv3d_fft(x, w_real, w_imag)
    if impl == "dft_c64":
        return truncated_spectral_conv3d_dft(x, w_real, w_imag)
    return truncated_spectral_conv3d_dft_lowp(
        x, w_real, w_imag, compute_dtype=compute_dtype
    )


def truncated_spectral_conv3d_dft_lowp(x, w_real, w_imag,
                                       compute_dtype=jnp.bfloat16):
    """Low-precision DFT path: complex arithmetic unrolled into real matmuls
    so the MXU runs bf16 with f32 accumulation (complex bf16 does not exist).
    ~2× the dense-DFT throughput and half the HBM traffic of the f32 path;
    relative error ~1e-2 (training-quality; use the f32 path for checkpoint
    parity evals)."""
    B, T, H, W, Cin = x.shape
    _, m1, m2, m3, _, Cout = w_real.shape
    Ew, Eh, Et, It, Ih, Iw_re, Iw_im = _dft_factors(T, H, W, m1, m2, m3)
    dt = compute_dtype
    cast = lambda a: jnp.asarray(a).astype(dt)
    EwR, EwI = cast(Ew.real), cast(Ew.imag)
    EhR, EhI = cast(Eh.real), cast(Eh.imag)
    EtR, EtI = cast(Et.real), cast(Et.imag)
    ItR, ItI = cast(It.real), cast(It.imag)
    IhR, IhI = cast(Ih.real), cast(Ih.imag)
    IwR, IwI = cast(Iw_re), cast(Iw_im)

    f32 = jnp.float32

    def mm(a, b, eq):
        return jnp.einsum(eq, a.astype(dt), b, preferred_element_type=f32)

    xb = x.astype(dt)
    # W stage (real input): one GEMM against [EwR | EwI] so the full-size
    # input is read from HBM once (the profile shows these full-width
    # stages are the step's hot ops)
    mW = EwR.shape[1]
    X2 = mm(xb, jnp.concatenate([EwR, EwI], axis=1), "bthwc,wi->bthic")
    Xr, Xi = X2[..., :mW, :], X2[..., mW:, :]
    # H stage
    Yr = mm(Xr, EhR, "bthic,hj->btjic") - mm(Xi, EhI, "bthic,hj->btjic")
    Yi = mm(Xr, EhI, "bthic,hj->btjic") + mm(Xi, EhR, "bthic,hj->btjic")
    # T stage
    Zr = mm(Yr, EtR, "btjic,tk->bkjic") - mm(Yi, EtI, "btjic,tk->bkjic")
    Zi = mm(Yr, EtI, "btjic,tk->bkjic") + mm(Yi, EtR, "btjic,tk->bkjic")

    def corners(z):
        return jnp.stack(
            [z[:, :m1, :m2], z[:, m1:, :m2], z[:, :m1, m2:], z[:, m1:, m2:]],
            axis=1,
        )

    cr, ci = corners(Zr), corners(Zi)
    wdt = _bf16_dot_dtype(dt)
    wr = w_real.astype(wdt)
    wi = w_imag.astype(wdt)
    eq = "bkxyzi,kxyzio->bkxyzo"

    def wmm(a, w):
        return jnp.einsum(eq, a.astype(wdt), w, preferred_element_type=f32)

    outr = wmm(cr, wr) - wmm(ci, wi)
    outi = wmm(cr, wi) + wmm(ci, wr)

    def regrid(o):
        top = jnp.concatenate([o[:, 0], o[:, 2]], axis=2)
        bot = jnp.concatenate([o[:, 1], o[:, 3]], axis=2)
        return jnp.concatenate([top, bot], axis=1)

    gr, gi = regrid(outr), regrid(outi)
    # inverse T
    tr = mm(gr, ItR, "bkjic,kt->btjic") - mm(gi, ItI, "bkjic,kt->btjic")
    ti = mm(gr, ItI, "bkjic,kt->btjic") + mm(gi, ItR, "bkjic,kt->btjic")
    # inverse H
    hr = mm(tr, IhR, "btjic,jh->bthic") - mm(ti, IhI, "btjic,jh->bthic")
    hi = mm(tr, IhI, "btjic,jh->bthic") + mm(ti, IhR, "btjic,jh->bthic")
    # inverse W (real output): concatenate along the contraction axis so one
    # GEMM writes the full-size output once (vs two full-size outputs + add)
    h2 = jnp.concatenate([hr, hi], axis=3)
    I2 = jnp.concatenate([IwR, IwI], axis=0)
    return mm(h2, I2, "bthic,iw->bthwc")


# ---------------------------------------------------------------------------
# Generic real-FFT-as-matmul plane helpers (round 5)
# ---------------------------------------------------------------------------
#
# GSPMD cannot partition the FFT HLO: any jnp.fft.* on a dp-sharded batch
# all-gathers the WHOLE operand into every device (caught by
# tests/test_multichip_lowering.py::test_collective_audit — DPOT's AFNO
# filters and fft_resize, and MWT's inverse transform, each gathered their
# full microbatch per call). Dense DFT matmuls shard like any dot, keep all
# arithmetic REAL (complex dots/scatters do not lower on some TPU runtimes,
# NOTES gotcha 8), and at benchmark sizes (<=128-point axes) run happily on
# the MXU. These helpers are drop-in plane-based replacements:
#
#   rfftn_planes(x, axes, norm)          == jnp.fft.rfftn(x, axes=axes) as
#                                           (real, imag) f32 planes
#   irfftn_planes(re, im, s, axes, norm) == jnp.fft.irfftn(re + 1j*im, ...)
#
# The last entry of `axes` is the half-spectrum (rfft) axis, as in numpy.
# REALPDEBENCH_DFT_MATMUL=0 routes callers back to jnp.fft (A/B, and a
# hedge on very large axes where an FFT's N·logN wins).


def use_dft_matmul() -> bool:
    from realpdebench_tpu.utils.misc import env_flag

    return env_flag("REALPDEBENCH_DFT_MATMUL", default=True)


@_lru_cache(maxsize=64)
def _rdft_mats(n: int):
    """Real forward DFT to the half spectrum: x @ C, x @ S — [n, n//2+1]."""
    m = n // 2 + 1
    th = 2 * np.pi * np.outer(np.arange(n), np.arange(m)) / n
    return (np.cos(th).astype(np.float32), (-np.sin(th)).astype(np.float32))


@_lru_cache(maxsize=64)
def _irdft_mats(n: int):
    """Half spectrum back to real n (Hermitian weights + 1/n): [m, n] pair
    so that out = re @ R + im @ I."""
    m = n // 2 + 1
    k = np.arange(m)[:, None]
    t = np.arange(n)[None, :]
    w = np.ones((m, 1), np.float64) * 2.0
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    th = 2 * np.pi * k * t / n
    return ((w * np.cos(th) / n).astype(np.float32),
            (-w * np.sin(th) / n).astype(np.float32))


@_lru_cache(maxsize=64)
def _cdft_mats(n: int, inverse: bool):
    """Full complex DFT as a real matrix pair C + iS (inverse includes 1/n)."""
    th = 2 * np.pi * np.outer(np.arange(n), np.arange(n)) / n
    sgn = 1.0 if inverse else -1.0
    C = np.cos(th)
    S = sgn * np.sin(th)
    if inverse:
        C, S = C / n, S / n
    return C.astype(np.float32), S.astype(np.float32)


def _apply_last(re, im, C, S):
    """(re + i·im) @ (C + i·S) along the last axis, real arithmetic."""
    C = jnp.asarray(C)
    S = jnp.asarray(S)
    if im is None:
        return re @ C, re @ S
    return re @ C - im @ S, re @ S + im @ C


def rfftn_planes(x, axes, norm=None):
    """jnp.fft.rfftn as (re, im) f32 planes via dense matmuls (see above).
    `axes[-1]` is the rfft (half-spectrum) axis."""
    axes = tuple(axes)
    x = x.astype(jnp.float32)
    n_total = 1
    a = axes[-1]
    n = x.shape[a]
    n_total *= n
    re, im = _apply_last(jnp.moveaxis(x, a, -1), None, *_rdft_mats(n))
    re, im = jnp.moveaxis(re, -1, a), jnp.moveaxis(im, -1, a)
    for a in axes[:-1]:
        n = x.shape[a]
        n_total *= n
        re_m, im_m = jnp.moveaxis(re, a, -1), jnp.moveaxis(im, a, -1)
        re_m, im_m = _apply_last(re_m, im_m, *_cdft_mats(n, False))
        re, im = jnp.moveaxis(re_m, -1, a), jnp.moveaxis(im_m, -1, a)
    if norm == "ortho":
        s = np.float32(1.0 / np.sqrt(n_total))
        re, im = re * s, im * s
    return re, im


def irfftn_planes(re, im, s, axes, norm=None):
    """jnp.fft.irfftn of (re + i·im) via dense matmuls. `s` are the output
    sizes for `axes`; the half-spectrum axis is `axes[-1]` with input size
    s[-1]//2 + 1."""
    axes = tuple(axes)
    s = tuple(int(v) for v in s)
    n_total = int(np.prod(s))
    re = re.astype(jnp.float32)
    im = im.astype(jnp.float32)
    for a, n in zip(axes[:-1], s[:-1]):
        re_m, im_m = jnp.moveaxis(re, a, -1), jnp.moveaxis(im, a, -1)
        re_m, im_m = _apply_last(re_m, im_m, *_cdft_mats(n, True))
        re, im = jnp.moveaxis(re_m, -1, a), jnp.moveaxis(im_m, -1, a)
    a, n = axes[-1], s[-1]
    R, I = _irdft_mats(n)
    out = (jnp.moveaxis(re, a, -1) @ jnp.asarray(R)
           + jnp.moveaxis(im, a, -1) @ jnp.asarray(I))
    out = jnp.moveaxis(out, -1, a)
    if norm == "ortho":
        out = out * np.float32(np.sqrt(n_total))
    return out
