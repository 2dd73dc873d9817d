"""Fused Galerkin-scores kernel: jnp-reference parity (forward + gradients)
and interpret-mode Pallas parity on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realpdebench_tpu.ops.pallas.galerkin import (
    _pick_tile,
    _scores_pallas,
    galerkin_scores,
)


def _ref(k, v, ks, kb, vs, vb, eps):
    def ln(x, s, b):
        m = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - m) / np.sqrt(var + eps) * s + b

    kn = ln(k, ks[None, :, None, :], kb[None, :, None, :])
    vn = ln(v, vs[None, :, None, :], vb[None, :, None, :])
    return np.einsum("bhnd,bhne->bhde", kn, vn) / k.shape[2]


def _inputs(rng, B=2, h=2, n=512, d=32):
    k = rng.normal(size=(B, h, n, d)).astype(np.float32)
    v = rng.normal(size=(B, h, n, d)).astype(np.float32)
    ks = rng.normal(size=(h, d)).astype(np.float32) * 0.1 + 1
    kb = rng.normal(size=(h, d)).astype(np.float32) * 0.1
    vs = rng.normal(size=(h, d)).astype(np.float32) * 0.1 + 1
    vb = rng.normal(size=(h, d)).astype(np.float32) * 0.1
    return k, v, ks, kb, vs, vb


def test_jnp_path_matches_numpy_ref(rng):
    args = _inputs(rng)
    got = np.asarray(galerkin_scores(*args, 1e-5))
    want = _ref(*args, 1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_interpret_matches_ref(rng):
    k, v, ks, kb, vs, vb = _inputs(rng, B=1, h=1, n=256, d=32)
    got = np.asarray(
        _scores_pallas(k[0, 0], v[0, 0], ks[0], kb[0], vs[0], vb[0],
                       1e-5, tile=64, interpret=True)
    )
    want = _ref(k, v, ks, kb, vs, vb, 1e-5)[0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gradients_match_ref(rng):
    args = _inputs(rng, B=1, h=2, n=128, d=16)
    g = rng.normal(size=(1, 2, 16, 16)).astype(np.float32)

    def fused(*a):
        return jnp.sum(galerkin_scores(*a, 1e-5) * g)

    def ref(*a):
        k, v, ks, kb, vs, vb = a

        def ln(x, s, b):
            m = x.mean(-1, keepdims=True)
            var = x.var(-1, keepdims=True)
            return (x - m) / jnp.sqrt(var + 1e-5) * s + b

        kn = ln(k, ks[None, :, None, :], kb[None, :, None, :])
        vn = ln(v, vs[None, :, None, :], vb[None, :, None, :])
        s = jnp.einsum("bhnd,bhne->bhde", kn, vn) / k.shape[2]
        return jnp.sum(s * g)

    g1 = jax.grad(fused, argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(ref, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pick_tile():
    assert _pick_tile(163840, 64) >= 1024
    assert 163840 % _pick_tile(163840, 64) == 0
    assert _pick_tile(100, 64) in (4, 2, 1)  # odd sizes still divide
