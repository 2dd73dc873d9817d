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
