"""Level-1 3-D discrete wavelet transform (DWT) in pure JAX.

Functional spec: `ptwt.wavedec3 / waverec3` with ``mode='zero'`` and
``level=1`` as used by WDNO (`realpdebench/model/wdno.py:94,180,338,499`).
pywt zero-padding semantics per axis:

    forward : y = full_conv(x, dec_filter)[1::2]           (len ⌊(n+L−1)/2⌋)
    inverse : z = full_conv(upsample2(a), rec_lo)
                + full_conv(upsample2(d), rec_hi),
              trimmed by (L−2) on each side                (len 2·la−L+2)

Perfect reconstruction holds exactly on [0, n) for biorthogonal banks with
zero extension (tested).

Subband order for the packed tensor matches the reference's
``coef_to_tensor`` (wdno.py:141-144): [aaa, aad, ada, add, daa, dad, dda,
ddd] over the axis triple (-3, -2, -1), the first entry being the
approximation Yl.

TPU notes: each 1-D pass is a depthwise conv with a length-L filter — XLA
maps it to efficient strided convolutions; everything is static-shaped.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

_SQ2 = 1.0 / np.sqrt(2.0)

# filter banks (dec_lo, dec_hi, rec_lo, rec_hi), pywt coefficient conventions
WAVELETS: Dict[str, Tuple[list, list, list, list]] = {
    # bior1.1 == haar (up to naming)
    "bior1.1": (
        [_SQ2, _SQ2],
        [-_SQ2, _SQ2],
        [_SQ2, _SQ2],
        [_SQ2, -_SQ2],
    ),
    "haar": (
        [_SQ2, _SQ2],
        [-_SQ2, _SQ2],
        [_SQ2, _SQ2],
        [_SQ2, -_SQ2],
    ),
    "db1": (
        [_SQ2, _SQ2],
        [-_SQ2, _SQ2],
        [_SQ2, _SQ2],
        [_SQ2, -_SQ2],
    ),
    "bior1.3": (
        [-0.08838834764831845, 0.08838834764831845, _SQ2, _SQ2,
         0.08838834764831845, -0.08838834764831845],
        [0.0, 0.0, -_SQ2, _SQ2, 0.0, 0.0],
        [0.0, 0.0, _SQ2, _SQ2, 0.0, 0.0],
        [-0.08838834764831845, -0.08838834764831845, _SQ2, -_SQ2,
         0.08838834764831845, 0.08838834764831845],
    ),
}

SUBBAND_KEYS = ("aad", "ada", "add", "daa", "dad", "dda", "ddd")


def dec_len(name: str) -> int:
    return len(WAVELETS[name][0])


def coef_len(n: int, name: str) -> int:
    return (n + dec_len(name) - 1) // 2


def rec_len(la: int, name: str) -> int:
    return 2 * la - dec_len(name) + 2


def _dwt_axis(x, lo, hi, axis):
    """Single-axis DWT: full convolution + odd-index downsample."""
    x = jnp.moveaxis(x, axis, -1)
    L = lo.shape[0]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(L - 1, L - 1)])
    # full convolution == correlation with the reversed filter
    lo_r = lo[::-1]
    hi_r = hi[::-1]
    n_out = x.shape[-1] + L - 1

    def corr(f):
        idx = jnp.arange(n_out)[:, None] + jnp.arange(L)[None, :]
        return jnp.einsum("...nl,l->...n", xp[..., idx], f)

    a = corr(lo_r)[..., 1::2]
    d = corr(hi_r)[..., 1::2]
    return jnp.moveaxis(a, -1, axis), jnp.moveaxis(d, -1, axis)


def _idwt_axis(a, d, lo, hi, axis):
    """Single-axis inverse DWT (zero mode)."""
    a = jnp.moveaxis(a, axis, -1)
    d = jnp.moveaxis(d, axis, -1)
    L = lo.shape[0]
    la = a.shape[-1]

    def up(z):  # [..., la] → [..., 2·la−1]
        out = jnp.zeros(z.shape[:-1] + (2 * la - 1,), z.dtype)
        return out.at[..., ::2].set(z)

    def fullconv(z, f):
        n = z.shape[-1]
        zp = jnp.pad(z, [(0, 0)] * (z.ndim - 1) + [(L - 1, L - 1)])
        idx = jnp.arange(n + L - 1)[:, None] + jnp.arange(L)[None, :]
        return jnp.einsum("...nl,l->...n", zp[..., idx], f[::-1])

    y = fullconv(up(a), lo) + fullconv(up(d), hi)
    trim = L - 2
    if trim > 0:
        y = y[..., trim:-trim]
    return jnp.moveaxis(y, -1, axis)


def wavedec3_level1(x, name: str):
    """x: [..., D, H, W] → packed coefficients [..., 8, D', H', W'].

    Band 0 is the approximation; bands 1..7 follow SUBBAND_KEYS order."""
    lo, hi, _, _ = (jnp.asarray(f, jnp.float32) for f in WAVELETS[name])
    aD, dD = _dwt_axis(x, lo, hi, -3)
    bands = {}
    for nm, zD in (("a", aD), ("d", dD)):
        aH, dH = _dwt_axis(zD, lo, hi, -2)
        for nm2, zH in (("a", aH), ("d", dH)):
            aW, dW = _dwt_axis(zH, lo, hi, -1)
            bands[nm + nm2 + "a"] = aW
            bands[nm + nm2 + "d"] = dW
    order = ["aaa"] + list(SUBBAND_KEYS)
    return jnp.stack([bands[k] for k in order], axis=-4)


def waverec3_level1(coefs, name: str):
    """Inverse of wavedec3_level1. coefs: [..., 8, D', H', W'] →
    [..., D'', H'', W''] with D'' = 2·D'−L+2 (may exceed the original n;
    callers slice)."""
    _, _, lo, hi = (jnp.asarray(f, jnp.float32) for f in WAVELETS[name])
    order = ["aaa"] + list(SUBBAND_KEYS)
    bands = {k: coefs[..., i, :, :, :] for i, k in enumerate(order)}
    # invert W axis
    lvl2 = {}
    for p in ("aa", "ad", "da", "dd"):
        lvl2[p] = _idwt_axis(bands[p + "a"], bands[p + "d"], lo, hi, -1)
    lvl1 = {}
    for p in ("a", "d"):
        lvl1[p] = _idwt_axis(lvl2[p + "a"], lvl2[p + "d"], lo, hi, -2)
    return _idwt_axis(lvl1["a"], lvl1["d"], lo, hi, -3)
