"""DMD tests: forecast parity with the reference (prediction is invariant to
SVD/eig sign and ordering conventions, so numpy vs scipy backends agree)."""

import os
import sys

import numpy as np
import pytest

from realpdebench_tpu.models.dmd import DMD
from realpdebench_tpu.models.registry import build_model


def _smooth_frames(rng, t, h, w, c):
    y = np.linspace(0, 2 * np.pi, h)[None, :, None, None]
    x = np.linspace(0, 2 * np.pi, w)[None, None, :, None]
    tt = np.arange(t)[:, None, None, None] / t
    base = np.sin(y + 2 * np.pi * tt) * np.cos(x - 2 * np.pi * tt)
    return (base + 0.01 * rng.normal(size=(t, h, w, c))).astype(np.float64)


def test_forecast_shapes(rng):
    model = DMD(n_modes=5, n_predict=6, input_feature=2, n_autoregressive=1)
    x = _smooth_frames(rng, 8, 12, 10, 3)[None]
    pred = model(x)
    assert pred.shape == (1, 6, 12, 10, 2)
    assert np.isfinite(pred).all()


def test_registry_bundle(rng):
    bundle = build_model(
        shapes=((8, 12, 10, 3), (6, 12, 10, 3)), model_name="dmd",
        n_modes=5, n_predict=6, input_feature=2, N_autoregressive=1,
    )
    assert not bundle.trainable
    variables = bundle.init(None, None)
    pred = bundle.predict(variables, _smooth_frames(rng, 8, 12, 10, 3)[None])
    assert pred.shape == (1, 6, 12, 10, 2)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)
def test_parity_with_reference(rng):
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    from realpdebench.model.dmd import DMD as RefDMD

    frames = _smooth_frames(rng, 10, 8, 8, 2)
    ref = RefDMD(n_modes=4, n_predict=5, input_feature=2, n_autoregressive=1)
    with torch.no_grad():
        want = ref(torch.from_numpy(frames[None]).float()).numpy()

    mine = DMD(n_modes=4, n_predict=5, input_feature=2, n_autoregressive=1)
    got = mine(frames[None].astype(np.float32))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
