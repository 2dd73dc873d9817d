"""WDNO tests: wavelet PR, packing round-trip, schedule parity vs reference,
training-loss step, end-to-end sampling shapes, rescaler caching."""

import os
import sys

import jax
import numpy as np
import pytest

from realpdebench_tpu.config import Config
from realpdebench_tpu.data.normalizer import IdentityNormalizer
from realpdebench_tpu.models.registry import build_model
from realpdebench_tpu.models.wdno import (
    DiffusionSchedule,
    _pack_input_target,
)
from realpdebench_tpu.ops.wavelet import wavedec3_level1, waverec3_level1
from realpdebench_tpu.train.train_step import (
    TrainState,
    build_optimizer,
    make_train_step,
)

SHAPE_IN = (4, 8, 8, 2)
SHAPE_OUT = (4, 8, 8, 2)
KW = dict(
    model_name="wdno", dim=8, dim_mults=[1, 2], wave_type="bior1.1",
    pad_mode="zero", beta_schedule="sigmoid", timesteps=20,
    sampling_timesteps=4, ddim_sampling_eta=1.0,
)


def _bundle(shape_out=SHAPE_OUT, **kw):
    return build_model(shapes=(SHAPE_IN, shape_out), **{**KW, **kw})


@pytest.mark.parametrize("name", ["bior1.1", "bior1.3"])
def test_wavelet_perfect_reconstruction(rng, name):
    x = rng.normal(size=(3, 8, 12, 10)).astype(np.float32)
    c = wavedec3_level1(x, name)
    r = np.asarray(waverec3_level1(c, name))[..., :8, :12, :10]
    np.testing.assert_allclose(r, x, atol=2e-5)


def test_pack_input_target(rng):
    x = rng.normal(size=(2, 4, 8, 8, 2)).astype(np.float32)
    y = rng.normal(size=(2, 8, 8, 8, 3)).astype(np.float32)  # sub_f = 2
    packed = _pack_input_target(x, y)
    assert packed.shape == (2, 4, 8, 8, 2 + 6)
    # target channel (c=1, sub_f=0) lands at offset c_in + 1*0... check one
    np.testing.assert_allclose(packed[..., :2], x)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)
def test_schedule_matches_reference():
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    # the reference schedule functions live in wdno.py which imports ptwt
    # (absent); replicate the torch computation directly from the formulas
    from realpdebench_tpu.models.wdno import sigmoid_beta_schedule

    timesteps = 50
    t = torch.linspace(0, timesteps, timesteps + 1, dtype=torch.float64) / timesteps
    start, end, tau = -3, 3, 1
    v_start = torch.tensor(start / tau).sigmoid()
    v_end = torch.tensor(end / tau).sigmoid()
    ac = (-((t * (end - start) + start) / tau).sigmoid() + v_end) / (v_end - v_start)
    ac = ac / ac[0]
    want = torch.clip(1 - (ac[1:] / ac[:-1]), 0, 0.999).numpy()
    got = sigmoid_beta_schedule(timesteps)
    np.testing.assert_allclose(got, want, rtol=1e-10)

    sched = DiffusionSchedule.create("sigmoid", timesteps)
    np.testing.assert_allclose(
        sched.alphas_cumprod, np.cumprod(1 - want), rtol=1e-6
    )


def test_pipeline_geometry():
    bundle = _bundle()
    pipe = bundle.pipeline
    # bior1.1 halves every axis: (4,8,8) → (2,4,4); padded to pad_factor 4
    assert pipe.coef_shape == (2, 4, 4)
    assert pipe.model_shape == (4, 4, 4)
    assert pipe.channels == 8 * (2 + 2)


def test_coef_roundtrip(rng):
    bundle = _bundle()
    pipe = bundle.pipeline
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    y = rng.normal(size=(2, *SHAPE_OUT)).astype(np.float32)
    state = pipe.to_coef_tensor(_pack_input_target(x, y))
    assert state.shape == (2, *pipe.model_shape, pipe.channels)
    out = np.asarray(pipe.from_coef_tensor(state))
    np.testing.assert_allclose(out, y, atol=2e-5)


def test_train_step_and_sampling(rng):
    bundle = _bundle()
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    y = rng.normal(size=(2, *SHAPE_OUT)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    params, ms = bundle.split_variables(variables)
    cfg = Config(lr=1e-3, scheduler="cosine", num_update=3, clip_grad_norm=1.0)
    state = TrainState.create(params, ms, build_optimizer(cfg))
    step = make_train_step(bundle, IdentityNormalizer())
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, loss = step(state, x, y, k)
        assert np.isfinite(float(loss))

    # DDIM sampling produces the right output shape
    pred = bundle.predict(
        {"params": state.params}, x, rng=jax.random.PRNGKey(2)
    )
    assert pred.shape == (2, *SHAPE_OUT)
    assert np.isfinite(np.asarray(pred)).all()


def test_ancestral_sampling_shape(rng):
    bundle = _bundle(timesteps=5, sampling_timesteps=5)  # ancestral path
    assert not bundle.pipeline.is_ddim
    x = rng.normal(size=(1, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    pred = bundle.predict(variables, x, rng=jax.random.PRNGKey(1))
    assert pred.shape == (1, *SHAPE_OUT)


def test_time_upsampled_output(rng):
    # T_out = 2×T_in exercises the sub-frame folding
    bundle = _bundle(shape_out=(8, 8, 8, 2))
    x = rng.normal(size=(1, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    pred = bundle.predict(variables, x, rng=jax.random.PRNGKey(1))
    assert pred.shape == (1, 8, 8, 8, 2)
