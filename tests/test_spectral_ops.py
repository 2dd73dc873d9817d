"""Unit tests for the truncated spectral conv implementations.

The default path unrolls the truncated DFT into real matmuls (complex dots do
not lower on some TPU runtimes); it must agree with the rfftn/irfftn
reference implementation and with the kept complex-einsum DFT variant
(`dft_c64`) to float32 round-off, for both values and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realpdebench_tpu.ops.spectral import (
    truncated_spectral_conv3d,
    truncated_spectral_conv3d_dft,
    truncated_spectral_conv3d_dft_lowp,
    truncated_spectral_conv3d_fft,
)


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    # prime-ish, non-power-of-two dims on purpose (the real datasets use
    # 26/70/134-style grids where TPU FFT falls back to Bluestein)
    x = rng.standard_normal((2, 6, 10, 14, 3)).astype(np.float32)
    # channels-minor order [4, m1, m2, m3, Ci, Co]: modes (2, 3, 4), 3 -> 5 ch
    wr = (rng.standard_normal((4, 2, 3, 4, 3, 5)) * 0.1).astype(np.float32)
    wi = (rng.standard_normal((4, 2, 3, 4, 3, 5)) * 0.1).astype(np.float32)
    return x, wr, wi


def test_dft_real_matches_fft(case):
    x, wr, wi = case
    ref = np.asarray(truncated_spectral_conv3d_fft(x, wr, wi))
    out = np.asarray(
        truncated_spectral_conv3d_dft_lowp(x, wr, wi,
                                           compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=1e-5)


def test_dft_exact_at_full_rfft_width():
    """m3 == W//2+1 with even W keeps the Nyquist bin: its inverse weight is
    1 (self-conjugate), not 2 — the DFT path must still match irfftn."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 6, 8, 3)).astype(np.float32)
    m1, m2, m3 = 2, 3, 5  # m3 = 8//2 + 1 → full rfft width incl. Nyquist
    wr = (rng.standard_normal((4, m1, m2, m3, 3, 4)) * 0.1).astype(np.float32)
    wi = (rng.standard_normal((4, m1, m2, m3, 3, 4)) * 0.1).astype(np.float32)
    ref = np.asarray(truncated_spectral_conv3d_fft(x, wr, wi))
    out = np.asarray(truncated_spectral_conv3d_dft_lowp(
        x, wr, wi, compute_dtype=jnp.float32))
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=1e-5)


def test_dft_c64_matches_fft(case):
    x, wr, wi = case
    ref = np.asarray(truncated_spectral_conv3d_fft(x, wr, wi))
    out = np.asarray(truncated_spectral_conv3d_dft(x, wr, wi))
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=1e-5)


def test_dispatcher_default_is_real_arithmetic(case, monkeypatch):
    x, wr, wi = case
    monkeypatch.delenv("REALPDEBENCH_SPECTRAL", raising=False)
    out = np.asarray(truncated_spectral_conv3d(x, wr, wi))
    ref = np.asarray(truncated_spectral_conv3d_fft(x, wr, wi))
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=1e-5)
    # complex primitives must not appear in the lowered default path
    hlo = jax.jit(truncated_spectral_conv3d).lower(x, wr, wi).as_text()
    assert "c64" not in hlo and "complex" not in hlo


def test_gradients_match_fft(case):
    x, wr, wi = case

    def loss(fn, x, wr, wi):
        return jnp.sum(fn(x, wr, wi) ** 2)

    g_ref = jax.grad(lambda *a: loss(truncated_spectral_conv3d_fft, *a),
                     argnums=(0, 1, 2))(x, wr, wi)
    g_out = jax.grad(
        lambda *a: loss(
            lambda x, wr, wi: truncated_spectral_conv3d_dft_lowp(
                x, wr, wi, compute_dtype=jnp.float32
            ),
            *a,
        ),
        argnums=(0, 1, 2),
    )(x, wr, wi)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_bf16_path_close(case):
    x, wr, wi = case
    ref = np.asarray(truncated_spectral_conv3d_fft(x, wr, wi))
    # jit: CPU eager dispatch rejects mixed-precision bf16 dots that XLA
    # compiles fine (and TPU usage is always under jit anyway)
    fn = jax.jit(lambda x, wr, wi: truncated_spectral_conv3d_dft_lowp(
        x, wr, wi, compute_dtype=jnp.bfloat16))
    out = np.asarray(fn(x, wr, wi))
    # bf16 mantissa ≈ 8 bits; activations here are O(1)
    assert np.max(np.abs(out - ref)) < 0.15
    assert np.abs(out - ref).mean() < 0.02
