"""End-to-end slice: synthetic cylinder tree → train FNO (data-parallel over
the 8-device CPU mesh) → checkpoint → eval with autoregressive rollout,
metrics, probes. Exercises every layer once (SURVEY.md §7.2 step 2)."""

import os

import numpy as np
import pytest

from realpdebench_tpu.config import Config
from realpdebench_tpu.data.synthetic import make_fluid_tree


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    make_fluid_tree(str(root), "cylinder", n_sim=5, n_frame=64, h=16, w=16)
    return str(root)


def _cfg(root, **kw):
    base = dict(
        exp_name="e2e", seed=0, results_path=os.path.join(root, "results"),
        dataset_name="cylinder", dataset_root=root, num_workers=0,
        normalizer="gaussian", mask_prob=0.1, noise_scale=0.0,
        model_name="fno", modes1=2, modes2=3, modes3=3, n_layers=2, width=8,
        scheduler="cosine", step_size=100, num_update=4,
        train_batch_size=8, test_batch_size=8, lr=1e-3, clip_grad_norm=1.0,
        N_autoregressive=2, N_plot=0, probe_diagnostic=True, N_plot_probe=0,
        train_data_type="numerical", is_use_tb=False,
        # synthetic-tree geometry
        in_step=4, out_step=4, interval=4, trunk_length=16, n_sim_frame=64,
        n_sim_in_distribution=1, n_sim_out_distribution=1,
        sub_s_real=1, sub_s_numerical=1, generate_ids_if_missing=True,
        mesh_shape="dp=8,mp=1",
    )
    base.update(kw)
    return Config(**base)


def test_train_then_eval(root, tmp_path):
    from realpdebench_tpu.eval.__main__ import run_eval
    from realpdebench_tpu.train.loop import run_training

    exp = str(tmp_path / "exp")
    os.makedirs(exp, exist_ok=True)
    cfg = _cfg(root)
    state, history = run_training(cfg, exp)
    assert len(history["train_loss"]) == 4
    assert np.isfinite(history["train_loss"]).all()
    assert len(history["val"]["rmse"]) >= 1
    ckpt_dir = os.path.join(exp, "ckpt")
    assert os.path.isdir(ckpt_dir)

    eval_cfg = cfg.replace(checkpoint_path=ckpt_dir)
    results = run_eval(eval_cfg, str(tmp_path / "eval"))
    for k in ("rmse", "rel_l2_error", "normalized_mse", "probe_error"):
        assert k in results and np.isfinite(results[k]), k


def test_finetune_paradigm(root, tmp_path):
    """Train on numerical, finetune on real from the checkpoint
    (reference train.py:299-301)."""
    from realpdebench_tpu.train.loop import run_training

    exp1 = str(tmp_path / "pre")
    cfg = _cfg(root, num_update=2)
    os.makedirs(exp1, exist_ok=True)
    run_training(cfg, exp1)

    exp2 = str(tmp_path / "ft")
    os.makedirs(exp2, exist_ok=True)
    ft_cfg = cfg.replace(
        train_data_type="real", is_finetune=True,
        checkpoint_path=os.path.join(exp1, "ckpt"),
    )
    state, history = run_training(ft_cfg, exp2)
    assert np.isfinite(history["train_loss"]).all()


def test_resume_continues_from_checkpoint(root, tmp_path):
    """Full resume (params + Adam state + step) — beyond the reference's
    weights-only finetune restart."""
    from realpdebench_tpu.train.loop import run_training

    exp = str(tmp_path / "resume")
    os.makedirs(exp, exist_ok=True)
    cfg = _cfg(root, num_update=2)
    state1, _ = run_training(cfg, exp)
    assert int(state1.step) == 2

    cfg2 = cfg.replace(num_update=4, resume=True)
    state2, history2 = run_training(cfg2, exp)
    assert int(state2.step) == 4
    # only the remaining iterations were run
    assert len(history2["train_loss"]) == 2


def test_training_determinism(root, tmp_path):
    """Same seed → identical losses (SURVEY §5: the JAX build gets
    determinism tests in place of the reference's nonexistent sanitizers)."""
    from realpdebench_tpu.train.loop import run_training

    losses = []
    for run in range(2):
        exp = str(tmp_path / f"det{run}")
        os.makedirs(exp, exist_ok=True)
        cfg = _cfg(root, num_update=3, num_workers=0)
        _, history = run_training(cfg, exp)
        losses.append(history["train_loss"])
    np.testing.assert_array_equal(losses[0], losses[1])


def test_train_with_tensor_parallel_mesh(root, tmp_path):
    """dp=4 × mp=2 training end to end on the virtual mesh."""
    from realpdebench_tpu.train.loop import run_training

    exp = str(tmp_path / "tp")
    os.makedirs(exp, exist_ok=True)
    cfg = _cfg(root, num_update=2, mesh_shape="dp=4,mp=2", train_batch_size=8)
    state, history = run_training(cfg, exp)
    assert np.isfinite(history["train_loss"]).all()
    w = state.params["layer_0"]["spectral"]["w_real"]
    assert len(w.sharding.device_set) >= 2  # stayed mp-sharded


def test_grad_accum_bn_deviation(rng):
    """Quantify the documented grad_accum BatchNorm deviation (see
    make_train_step docstring): accumulated microbatches use ghost-batch BN
    statistics, so losses track the full-batch (accum=1) run closely but not
    bit-exactly. Guards both directions: within a few percent (catches real
    accumulation bugs) yet not identical (the deviation exists)."""
    import jax

    from realpdebench_tpu.config import Config
    from realpdebench_tpu.data.normalizer import IdentityNormalizer
    from realpdebench_tpu.models.registry import build_model
    from realpdebench_tpu.train.train_step import (
        TrainState, build_optimizer, make_train_step,
    )

    si = so = (4, 12, 12, 3)
    bundle = build_model(shapes=(si, so), model_name="fno", modes1=2,
                         modes2=3, modes3=3, n_layers=2, width=8)
    x = rng.normal(size=(8, *si)).astype(np.float32)
    y = (1.5 * x + 0.1).astype(np.float32)

    losses = {}
    for accum in (1, 4):
        variables = bundle.init(jax.random.PRNGKey(0), x)
        params, ms = bundle.split_variables(variables)
        cfg = Config(lr=1e-3, scheduler="cosine", num_update=20)
        state = TrainState.create(params, ms, build_optimizer(cfg))
        step = make_train_step(bundle, IdentityNormalizer(), grad_accum=accum)
        ls = []
        rng_ = jax.random.PRNGKey(1)
        for _ in range(6):
            rng_, k = jax.random.split(rng_)
            state, loss = step(state, x, y, k)
            ls.append(float(loss))
        losses[accum] = np.asarray(ls)

    # ghost-batch BN makes them differ, but only slightly on this problem
    rel = np.abs(losses[1] - losses[4]) / np.abs(losses[1])
    assert rel.max() < 0.05, f"accum deviation too large: {rel}"
    assert rel.max() > 0.0, "expected a (small) BN ghost-batch deviation"
