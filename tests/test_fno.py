"""FNO3d tests: shapes, numerical parity vs the reference torch implementation
(weight transplant), training-step convergence, rollout, checkpointing."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realpdebench_tpu.config import Config
from realpdebench_tpu.data.normalizer import IdentityNormalizer
from realpdebench_tpu.models.registry import build_model
from realpdebench_tpu.train.train_step import (
    TrainState,
    build_optimizer,
    make_train_step,
)

SHAPE_IN = (4, 12, 12, 3)
SHAPE_OUT = (4, 12, 12, 3)
CFG = dict(
    model_name="fno", modes1=2, modes2=3, modes3=3, n_layers=2, width=8,
)


def _bundle():
    return build_model(shapes=(SHAPE_IN, SHAPE_OUT), **CFG)


def test_forward_shape(rng):
    bundle = _bundle()
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    out = bundle.predict(variables, x)
    assert out.shape == (2, *SHAPE_OUT)
    assert np.isfinite(np.asarray(out)).all()


def test_time_upsampling_shape(rng):
    bundle = build_model(shapes=((4, 12, 12, 3), (8, 12, 12, 2)), **CFG)
    x = rng.normal(size=(2, 4, 12, 12, 3)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    out = bundle.predict(variables, x)
    assert out.shape == (2, 8, 12, 12, 2)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)
def test_parity_with_reference_torch(rng):
    """Transplant weights torch→flax and compare eval-mode forwards."""
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    from realpdebench.model.fno import FNO3d as TorchFNO3d

    torch.manual_seed(0)
    tm = TorchFNO3d(
        modes1=2, modes2=3, modes3=3, n_layers=2, width=8,
        shape_in=SHAPE_IN, shape_out=SHAPE_OUT,
    ).eval()

    bundle = _bundle()
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    sd = tm.state_dict()

    def dense(name, tkey):
        params[name]["kernel"] = sd[f"{tkey}.weight"].numpy().T
        params[name]["bias"] = sd[f"{tkey}.bias"].numpy()

    dense("fc0", "fc0")
    dense("fc1", "fc1")
    dense("fc2", "fc2")
    batch_stats = {}
    for i in range(2):
        w = np.stack(
            [sd[f"spectral_convs.{i}.weights{k}"].numpy() for k in (1, 2, 3, 4)]
        ).transpose(0, 3, 4, 5, 1, 2)  # channels-minor storage
        cw = sd[f"convs.{i}.weight"].numpy()[:, :, 0, 0, 0]
        params[f"layer_{i}"] = {
            "spectral": {
                "w_real": w.real.astype(np.float32),
                "w_imag": w.imag.astype(np.float32),
            },
            "pointwise": {
                "kernel": cw.T, "bias": sd[f"convs.{i}.bias"].numpy(),
            },
            "bn": {
                "scale": sd[f"bns.{i}.weight"].numpy(),
                "bias": sd[f"bns.{i}.bias"].numpy(),
            },
        }
        batch_stats[f"layer_{i}"] = {
            "bn": {
                "mean": sd[f"bns.{i}.running_mean"].numpy(),
                "var": sd[f"bns.{i}.running_var"].numpy(),
            }
        }

    variables = {"params": params, "batch_stats": batch_stats}
    got = np.asarray(bundle.predict(variables, x))
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_train_step_reduces_loss(rng):
    bundle = _bundle()
    x = rng.normal(size=(4, *SHAPE_IN)).astype(np.float32)
    y = (2.0 * x[..., :3] + 0.1).astype(np.float32)  # learnable map

    variables = bundle.init(jax.random.PRNGKey(0), x)
    params, model_state = bundle.split_variables(variables)
    cfg = Config(lr=1e-2, scheduler="cosine", num_update=60, clip_grad_norm=1.0)
    tx = build_optimizer(cfg)
    state = TrainState.create(params, model_state, tx)
    step = make_train_step(bundle, IdentityNormalizer())

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(60):
        key, k = jax.random.split(key)
        state, loss = step(state, x, y, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert int(state.step) == 60


def test_rollout_shapes(rng):
    from realpdebench_tpu.eval.rollout import finalize_rollout, make_rollout_fn

    bundle = _bundle()
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    y = rng.normal(size=(2, 12, 12, 12, 3)).astype(np.float32)  # 3 AR steps
    variables = bundle.init(jax.random.PRNGKey(0), x)
    norm = IdentityNormalizer()
    rollout = make_rollout_fn(bundle, norm, n_steps=3)
    pred, xn, yn = rollout(variables, x, y, jax.random.PRNGKey(0))
    assert pred.shape == (2, 12, 12, 12, 3)
    nmse, pp, tp = finalize_rollout(norm, pred, xn, yn, c=2)
    assert pp.shape == pred.shape and float(nmse) > 0


def test_checkpoint_roundtrip(tmp_path, rng):
    from realpdebench_tpu.train.checkpoint import CheckpointManager

    bundle = _bundle()
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    params, model_state = bundle.split_variables(variables)
    cfg = Config(lr=1e-3, scheduler="cosine", num_update=10, clip_grad_norm=0)
    tx = build_optimizer(cfg)
    state = TrainState.create(params, model_state, tx)
    step = make_train_step(bundle, IdentityNormalizer())
    state, _ = step(state, x, x, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, metadata={"best_iteration": 1, "best_val_loss": 0.5})
    mgr.wait()

    fresh = TrainState.create(params, model_state, tx)
    restored, meta = mgr.restore(fresh)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )
    assert int(restored.step) == 1
    assert meta["best_iteration"] == 1
    mgr.close()
