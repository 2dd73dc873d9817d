"""Sequence-parallel Galerkin attention (SURVEY §5 long-context extension):
token axis sharded over the mp mesh axis. The only cross-token coupling in
Galerkin attention is the N-contraction LN(K)ᵀLN(V) — GSPMD turns it into
per-shard partial matmuls + an ICI psum. The sharded model must match the
unsharded oracle bit-for-bit-ish (same params, same rng)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realpdebench_tpu.core.mesh import make_mesh_context
from realpdebench_tpu.models.registry import build_model

SHAPE = (4, 8, 16, 3)  # T, H, W, C → N = 512 tokens

KW = dict(model_name="galerkin_transformer", n_hidden=32,
          num_encoder_layers=2, n_head=4, dim_feedforward=32,
          fourier_modes_x=3, fourier_modes_y=3, fourier_modes_t=2,
          num_regressor_layers=1, freq_dim=16, encoder_dropout=0.0)


@pytest.fixture(scope="module")
def oracle_and_sharded():
    ctx = make_mesh_context("dp=2,mp=4")
    plain = build_model(shapes=(SHAPE, SHAPE), **KW)
    sharded = build_model(shapes=(SHAPE, SHAPE), seq_mesh=ctx.mesh, **KW)
    x = np.random.default_rng(0).standard_normal((4, *SHAPE)).astype(
        np.float32)
    variables = plain.init(jax.random.PRNGKey(0), x[:1])
    return ctx, plain, sharded, variables, x


def test_forward_matches_oracle(oracle_and_sharded):
    ctx, plain, sharded, variables, x = oracle_and_sharded
    want = np.asarray(plain.predict(variables, x))

    xd = jax.device_put(x, ctx.batch_sharding)
    got = np.asarray(sharded.predict(variables, xd))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_grads_match_oracle(oracle_and_sharded):
    ctx, plain, sharded, variables, x = oracle_and_sharded

    def loss(bundle, v, xb):
        def f(params):
            out = bundle.module.apply({**v, "params": params}, xb,
                                      train=False)
            return jnp.mean(out ** 2)
        return jax.jit(jax.grad(f))(v["params"])

    g_plain = loss(plain, variables, x)
    g_shard = loss(sharded, variables, jax.device_put(x, ctx.batch_sharding))
    flat_p, _ = jax.tree_util.tree_flatten(g_plain)
    flat_s, _ = jax.tree_util.tree_flatten(g_shard)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_tokens_actually_sharded(oracle_and_sharded):
    """The encoder activations must really be distributed: jit the encoder
    forward and check the compiled output sharding of an internal probe."""
    ctx, _, sharded, variables, x = oracle_and_sharded
    from realpdebench_tpu.core.partitioning import token_constraint

    h = jnp.zeros((2, 512, 32))

    @jax.jit
    def f(h):
        return token_constraint(h, ctx.mesh)

    out = f(h)
    # token axis (1) sharded 4-way over mp
    assert out.sharding.spec[1] == "mp", out.sharding


# --- Transolver: physics attention with the token axis over mp ------------

TRANSOLVER_KW = dict(
    model_name="transolver", space_dim=3, n_layers=2, n_hidden=16, n_head=2,
    H=8, W=8, D=4, fun_dim=0, out_dim=3, ref=4, dropout=0.0, act="gelu",
    mlp_ratio=2, slice_num=8,
)
T_SHAPE = (4, 8, 8, 3)  # N = 256 tokens; model grid (H,W,D) = (8,8,4)


@pytest.fixture(scope="module")
def transolver_oracle_and_sharded():
    ctx = make_mesh_context("dp=2,mp=4")
    plain = build_model(shapes=(T_SHAPE, T_SHAPE), **TRANSOLVER_KW)
    sharded = build_model(shapes=(T_SHAPE, T_SHAPE), seq_mesh=ctx.mesh,
                          **TRANSOLVER_KW)
    x = np.random.default_rng(1).standard_normal((4, *T_SHAPE)).astype(
        np.float32)
    variables = plain.init(jax.random.PRNGKey(0), x[:1])
    return ctx, plain, sharded, variables, x


def test_transolver_forward_matches_oracle(transolver_oracle_and_sharded):
    """Sharding the N tokens over mp must not change the physics-attention
    output: the only cross-token couplings (slice softmax-sum + the two
    N-contractions) become per-shard partials + ICI psum; the k3 conv
    projections run spatially partitioned with GSPMD halo exchange."""
    ctx, plain, sharded, variables, x = transolver_oracle_and_sharded
    want = np.asarray(plain.predict(variables, x))
    xd = jax.device_put(x, ctx.batch_sharding)
    got = np.asarray(sharded.predict(variables, xd))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_transolver_grads_match_oracle(transolver_oracle_and_sharded):
    ctx, plain, sharded, variables, x = transolver_oracle_and_sharded

    def grads(bundle, v, xb):
        def f(params):
            out = bundle.module.apply({**v, "params": params}, xb,
                                      train=False)
            return jnp.mean(out ** 2)
        return jax.jit(jax.grad(f))(v["params"])

    g_plain = grads(plain, variables, x)
    g_shard = grads(sharded, variables,
                    jax.device_put(x, ctx.batch_sharding))
    flat_p, _ = jax.tree_util.tree_flatten(g_plain)
    flat_s, _ = jax.tree_util.tree_flatten(g_shard)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)
