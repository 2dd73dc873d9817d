"""Mesh/sharding foundation tests on the 8-device virtual CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realpdebench_tpu.core.mesh import (
    MeshContext,
    make_mesh_context,
    parse_mesh_shape,
)


def test_parse_mesh_shape():
    assert parse_mesh_shape(None, 8) == {"dp": 8, "mp": 1}
    assert parse_mesh_shape("dp=4,mp=2", 8) == {"dp": 4, "mp": 2}
    assert parse_mesh_shape("dp=-1,mp=2", 8) == {"dp": 4, "mp": 2}
    # sub-meshes are allowed (leading devices used); oversubscription is not
    assert parse_mesh_shape("dp=3", 8) == {"dp": 3, "mp": 1}
    with pytest.raises(ValueError):
        parse_mesh_shape("dp=16", 8)


def test_mesh_context_dp8():
    ctx = make_mesh_context("dp=8,mp=1")
    assert ctx.dp_size == 8
    assert ctx.pad_batch(5) == 8
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    xd = jax.device_put(x, ctx.batch_sharding)
    assert len(xd.sharding.device_set) == 8

    # data-parallel mean: GSPMD inserts the cross-device reduction
    @jax.jit
    def f(a):
        return jnp.mean(a)

    np.testing.assert_allclose(float(f(xd)), x.mean(), rtol=1e-6)


def test_mesh_context_2d():
    ctx = make_mesh_context("dp=4,mp=2")
    assert ctx.dp_size == 4 and ctx.mp_size == 2
    s = ctx.sharding("dp", None, "mp")
    x = np.ones((4, 3, 2), np.float32)
    xd = jax.device_put(x, s)
    assert xd.shape == (4, 3, 2)


def test_param_shardings_fno():
    from realpdebench_tpu.config import Config
    from realpdebench_tpu.core.partitioning import param_shardings, shard_train_state
    from realpdebench_tpu.models.registry import build_model
    from realpdebench_tpu.train.train_step import (
        TrainState, build_optimizer, make_train_step,
    )
    from realpdebench_tpu.data.normalizer import IdentityNormalizer
    import jax.numpy as jnp

    ctx = make_mesh_context("dp=4,mp=2")
    shape = (4, 16, 16, 3)
    bundle = build_model(shapes=(shape, shape), model_name="fno",
                         modes1=2, modes2=3, modes3=3, n_layers=2, width=8)
    x = np.random.default_rng(0).standard_normal((8, *shape)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x[:1])
    params, ms = bundle.split_variables(variables)

    shardings = param_shardings(params, ctx)
    spec = shardings["layer_0"]["spectral"]["w_real"].spec
    assert spec == jax.sharding.PartitionSpec(None, None, "mp", None, None, None)
    # biases replicated
    assert shardings["fc0"]["bias"].spec == jax.sharding.PartitionSpec()

    # full sharded train step executes with tp+dp
    cfg = Config(lr=1e-3, scheduler="cosine", num_update=4, clip_grad_norm=0.0)
    state = TrainState.create(params, ms, build_optimizer(cfg))
    state = shard_train_state(state, ctx)
    step = make_train_step(bundle, IdentityNormalizer(), ctx)
    xd = jax.device_put(x, ctx.batch_sharding)
    state, loss = step(state, xd, xd, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # weights remain mp-sharded after the update
    w = state.params["layer_0"]["spectral"]["w_real"]
    assert len(w.sharding.device_set) >= 2
