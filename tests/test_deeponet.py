"""DeepONet tests: shapes, adaptive pooling semantics vs torch, parity via
the registered interop converter."""

import os
import sys

import jax
import numpy as np
import pytest

from realpdebench_tpu.config import Config
from realpdebench_tpu.data.normalizer import IdentityNormalizer
from realpdebench_tpu.models.deeponet import adaptive_avg_pool3d
from realpdebench_tpu.models.registry import build_model
from realpdebench_tpu.train.train_step import (
    TrainState,
    build_optimizer,
    make_train_step,
)

SHAPE_IN = (8, 16, 16, 3)
SHAPE_OUT = (8, 16, 16, 3)


def _bundle(p=16):
    return build_model(
        shapes=(SHAPE_IN, SHAPE_OUT), model_name="deeponet", p=p,
        dropout_rate=0.1,
    )


def test_forward_shape(rng):
    bundle = _bundle()
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    out = bundle.predict(variables, x)
    assert out.shape == (2, *SHAPE_OUT)
    assert np.isfinite(np.asarray(out)).all()


def test_bf16_compute_close_to_f32(rng):
    from conftest import assert_bf16_close

    assert_bf16_close(dict(model_name="deeponet", p=16, dropout_rate=0.1),
                      (SHAPE_IN, SHAPE_OUT), rng)


def test_adaptive_pool_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(2, 3, 5, 7, 4)).astype(np.float32)  # B,T,H,W,C
    got = np.asarray(adaptive_avg_pool3d(x, (1, 4, 4)))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # B,C,T,H,W
    want = (
        torch.nn.AdaptiveAvgPool3d((1, 4, 4))(xt).permute(0, 2, 3, 4, 1).numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_train_step_runs(rng):
    bundle = _bundle()
    x = rng.normal(size=(4, *SHAPE_IN)).astype(np.float32)
    y = rng.normal(size=(4, *SHAPE_OUT)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    params, ms = bundle.split_variables(variables)
    cfg = Config(lr=1e-3, scheduler="cosine", num_update=5, clip_grad_norm=1.0)
    state = TrainState.create(params, ms, build_optimizer(cfg))
    step = make_train_step(bundle, IdentityNormalizer())
    key = jax.random.PRNGKey(1)
    for _ in range(5):
        key, k = jax.random.split(key)
        state, loss = step(state, x, y, k)
        assert np.isfinite(float(loss))


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)
def test_parity_with_reference_torch(rng):
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    from realpdebench.model.deeponet import DeepONet as TorchDeepONet

    from realpdebench_tpu.interop.torch_convert import convert_deeponet

    torch.manual_seed(0)
    tm = TorchDeepONet(
        shape_in=SHAPE_IN, shape_out=SHAPE_OUT, input_channels=3,
        output_channels=3, p=16, dropout_rate=0.1, device="cpu",
    ).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    bundle = _bundle()
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    params, ms = convert_deeponet(sd, variables["params"], {})
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(variables["params"]))
    got = np.asarray(bundle.predict({"params": params, **ms}, x))
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    # tolerance: deep conv stacks accumulate XLA-vs-torch reduction-order
    # noise (~5e-4 abs here); logic-level mismatches are orders larger
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)
