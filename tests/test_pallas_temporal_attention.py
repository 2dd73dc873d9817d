"""Fused temporal-attention kernel parity (interpret mode on CPU) against
the pure-jnp oracle, plus full-module parity of the pallas-backed
TemporalAttention against the einsum path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realpdebench_tpu.ops.pallas.temporal_attention import (
    reference_temporal_attention_tokens,
    temporal_attention_tokens,
)

B, T, H_, D, S = 2, 5, 3, 8, 256  # h=3 heads; S multiple of 128
F = H_ * D


def _inputs(seed=0):
    r = np.random.default_rng(seed)
    q = jnp.asarray(r.normal(size=(B, S, T, F)), jnp.float32)
    k = jnp.asarray(r.normal(size=(B, S, T, F)), jnp.float32)
    v = jnp.asarray(r.normal(size=(B, S, T, F)), jnp.float32)
    pb = jnp.asarray(0.3 * r.normal(size=(H_, T, T)), jnp.float32)
    return q, k, v, pb


def test_forward_parity():
    q, k, v, pb = _inputs()
    out = temporal_attention_tokens(q, k, v, pb, H_, interpret=True)
    ref = reference_temporal_attention_tokens(q, k, v, pb, H_)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grad_parity():
    q, k, v, pb = _inputs(seed=1)
    t = jnp.asarray(np.random.default_rng(2).normal(size=(B, S, T, F)),
                    jnp.float32)

    def loss(fn):
        def run(q, k, v, pb):
            o = fn(q, k, v, pb)
            return jnp.mean((o - t) ** 2) + jnp.mean(o) * 0.1
        return run

    gf = jax.grad(loss(lambda *a: temporal_attention_tokens(
        *a, H_, interpret=True)), argnums=(0, 1, 2, 3))(q, k, v, pb)
    gr = jax.grad(loss(lambda *a: reference_temporal_attention_tokens(
        *a, H_)), argnums=(0, 1, 2, 3))(q, k, v, pb)
    for n, f, r in zip("qkv b", gf, gr):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"grad mismatch for {n}")


@pytest.mark.parametrize("train", [False, True])
def test_unet_temporal_attention_module_parity(train):
    """TemporalAttention with use_pallas (interpret) against the einsum
    path: same params, same outputs, same input gradients."""
    from realpdebench_tpu.models.unet import TemporalAttention

    b, t, h, w, c = 2, 4, 8, 16, 16  # S = 128
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(b, t, h, w, c)), jnp.float32)
    pb = jnp.asarray(0.1 * r.normal(size=(4, t, t)), jnp.float32)
    m_ref = TemporalAttention(c, heads=4, dim_head=8, use_pallas=False)
    m_pal = TemporalAttention(c, heads=4, dim_head=8, use_pallas=True,
                              pallas_interpret=True)
    v = m_ref.init(jax.random.PRNGKey(0), x, pb)
    v2 = m_pal.init(jax.random.PRNGKey(0), x, pb)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    o1 = m_ref.apply(v, x, pb)
    o2 = m_pal.apply(v, x, pb)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-4, atol=2e-5)

    g1 = jax.grad(lambda xx: jnp.sum(m_ref.apply(v, xx, pb) ** 2))(x)
    g2 = jax.grad(lambda xx: jnp.sum(m_pal.apply(v, xx, pb) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=5e-4, atol=5e-5)
