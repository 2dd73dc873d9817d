"""Surrogate pipeline + auxiliary tool tests: surrogate datasets (H5 + Arrow),
surrogate training smoke, surrogate data generation, sim-vs-real comparator,
CLI dry-run."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from realpdebench_tpu.config import Config
from realpdebench_tpu.data.surrogate import (
    CombustionSurrogateHFDataset,
    SurrogateDataset,
)
from realpdebench_tpu.data.synthetic import make_combustion_tree, make_fluid_tree


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    import h5py

    root = str(tmp_path_factory.mktemp("sur"))
    make_combustion_tree(root, n_sim=2, n_frame=24, h=8, w=8)
    # surrogate-train pair dirs: real_surrogate_train / numerical_surrogate_train
    scen = os.path.join(root, "combustion")
    rng = np.random.default_rng(0)
    for sub, key, shape in (
        ("real_surrogate_train", "trajectory", (24, 8, 8)),
        ("numerical_surrogate_train", "measured_data", (24, 8, 8, 15)),
    ):
        d = os.path.join(scen, sub)
        os.makedirs(d, exist_ok=True)
        for fn in os.listdir(os.path.join(scen, "numerical")):
            with h5py.File(os.path.join(d, fn), "w") as f:
                f.create_dataset(
                    key, data=rng.standard_normal(shape).astype(np.float32)
                )
    return root


SKW = dict(step=4, n_sim_frame=24)


def test_surrogate_dataset(root):
    ds = SurrogateDataset("combustion", root, "train", **SKW)
    x, y = ds[0]
    assert x.shape == (4, 8, 8, 17)
    assert y.shape == (4, 8, 8, 1)
    # parameter planes constant per sample
    assert np.allclose(x[..., 15], x[0, 0, 0, 15])
    assert len(ds) == 2 * 24


def test_surrogate_hf_matches_h5(root):
    from realpdebench_tpu.tools.convert_hdf5_to_hf import convert_surrogate_train

    convert_surrogate_train(root, step=4, n_sim_frame=24)
    h5 = SurrogateDataset("combustion", root, "train", seed=7, **SKW)
    hf = CombustionSurrogateHFDataset("combustion", root, "train", seed=7,
                                      **SKW)
    x1, y1 = h5[0]
    x2, y2 = hf[0]
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)


def test_surrogate_training_and_generation(root, tmp_path):
    from realpdebench_tpu.tools.generate_surrogate_data import generate
    from realpdebench_tpu.train.surrogate import run_surrogate_training

    cfg = Config(
        exp_name="sur", seed=0, dataset_name="combustion", dataset_root=root,
        num_workers=0, normalizer="gaussian", model_name="fno",
        modes1=2, modes2=2, modes3=2, n_layers=1, width=4,
        scheduler="cosine", step_size=10, num_update=50,
        train_batch_size=4, test_batch_size=4, lr=1e-3, clip_grad_norm=0.0,
        step=4, n_sim_frame=24, mesh_shape="dp=1,mp=1",
    )
    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    state, history = run_surrogate_training(cfg, exp)
    assert np.isfinite(history["train_loss"]).all()
    assert len(history["test"]["rmse"]) == 1

    import h5py

    generate(root, os.path.join(exp, "ckpt"), cfg, step=4, n_sim_frame=24)
    out_dir = os.path.join(root, "combustion", "surrogate")
    files = [f for f in os.listdir(out_dir) if f.endswith(".h5")]
    assert len(files) == 2
    with h5py.File(os.path.join(out_dir, files[0]), "r") as f:
        assert f["measured_data"].shape == (24, 8, 8)


def test_numerical_real_compare(tmp_path):
    from realpdebench_tpu.data.fluid import Cylinder
    from realpdebench_tpu.tools.numerical_real_compare import compare

    root = str(tmp_path)
    make_fluid_tree(root, "cylinder", n_sim=3, n_frame=32, h=16, w=16)
    kw = dict(in_step=4, out_step=4, interval=4, trunk_length=16,
              n_sim_frame=32, n_sim_in_distribution=1,
              n_sim_out_distribution=1, sub_s_real=1, sub_s_numerical=1,
              generate_ids_if_missing=True)
    Cylinder("cylinder", root, "real", "train", **kw)  # generate ids
    errors = compare(root, "cylinder", dataset_kwargs=kw)
    assert len(errors) == 4
    assert all(np.isfinite(errors))


def test_cli_download_dry_run(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "realpdebench_tpu", "download",
         "--dataset-root", str(tmp_path), "--scenario", "cylinder",
         "--dry-run"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr
    result = json.loads(out.stdout)
    assert "cylinder/in_dist_test_params_*.json" in result["allow_patterns"]
