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

import jax.numpy as jnp


def truncated_spectral_conv3d(x, w_real, w_imag):
    """Mode-truncated spectral conv.

    Args:
      x: [B, T, H, W, C_in] real (any float dtype; FFT math in f32).
      w_real/w_imag: [4, C_in, C_out, m1, m2, m3] — the four corner blocks in
        reference order (+T+H, -T+H, +T-H, -T-H; fno.py:53-60). m3 indexes the
        non-negative rfft axis (W).

    Returns: [B, T, H, W, C_out] real, float32.
    """
    B, T, H, W, Cin = x.shape
    _, _, Cout, m1, m2, m3 = w_real.shape

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

    w = (w_real + 1j * w_imag).astype(jnp.complex64)  # [4, Cin, Cout, m1,m2,m3]
    # one batched complex contraction over Cin for all 4 corner blocks
    out_corners = jnp.einsum(
        "bkxyzi,kioxyz->bkxyzo", corners, w, preferred_element_type=jnp.complex64
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
