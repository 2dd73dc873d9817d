"""HF-Arrow backend tests: converter round-trip, HDF5↔Arrow output parity,
test-mode filters, download pattern building (dry-run)."""

import os

import numpy as np
import pytest

from realpdebench_tpu.data.fluid import Cylinder
from realpdebench_tpu.data.combustion import CombustionDataset
from realpdebench_tpu.data.hf_datasets import (
    CombustionHFDataset,
    CylinderHFDataset,
)
from realpdebench_tpu.data.hf_download import build_allow_patterns
from realpdebench_tpu.data.synthetic import make_combustion_tree, make_fluid_tree
from realpdebench_tpu.tools.convert_hdf5_to_hf import convert_dataset_v2

KW = dict(
    in_step=4, out_step=4, interval=4, trunk_length=16, n_sim_frame=64,
    sub_s_real=1, sub_s_numerical=1,
)


@pytest.fixture(scope="module")
def converted_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hf"))
    make_fluid_tree(root, "cylinder", n_sim=5, n_frame=64, h=16, w=16)
    make_combustion_tree(root, n_sim=3, n_frame=40, h=16, w=16)
    # generate id mappings via the H5 dataset, then convert
    for dtype in ("real", "numerical"):
        Cylinder("cylinder", root, dtype, "train",
                 n_sim_in_distribution=1, n_sim_out_distribution=1,
                 generate_ids_if_missing=True, **KW)
        CombustionDataset("combustion", root, dtype, "train",
                          in_step=4, out_step=4, interval=2, trunk_length=10,
                          n_sim_frame=40, sub_s_real=1, sub_s_numerical=1,
                          generate_ids_if_missing=True)
    convert_dataset_v2(root, "cylinder")
    convert_dataset_v2(root, "combustion")
    return root


def test_hf_matches_h5_fluid(converted_root):
    """With stochastic parts disabled, Arrow and HDF5 backends must produce
    identical samples for identical (sim, time) indices."""
    for dtype, mode in (("numerical", "train"), ("real", "val")):
        h5 = Cylinder("cylinder", converted_root, dtype, mode,
                      mask_prob=0.0, **KW)
        hf = CylinderHFDataset("cylinder", converted_root, dtype, mode,
                               mask_prob=0.0, **KW)
        assert len(h5) == len(hf) > 0
        for i in (0, len(h5) - 1):
            x1, y1 = h5[i]
            x2, y2 = hf[i]
            np.testing.assert_array_equal(x1, x2)
            np.testing.assert_array_equal(y1, y2)


def test_hf_matches_h5_combustion(converted_root):
    kw = dict(in_step=4, out_step=4, interval=2, trunk_length=10,
              n_sim_frame=40, sub_s_real=1, sub_s_numerical=1)
    h5 = CombustionDataset("combustion", converted_root, "numerical", "train",
                           mask_prob=0.0, **kw)
    hf = CombustionHFDataset("combustion", converted_root, "numerical",
                             "train", mask_prob=0.0, **kw)
    assert len(h5) == len(hf) > 0
    x1, y1 = h5[0]
    x2, y2 = hf[0]
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)


def test_hf_test_mode_filter(converted_root):
    all_t = CylinderHFDataset("cylinder", converted_root, "real", "test",
                              test_mode="all", **KW)
    seen = CylinderHFDataset("cylinder", converted_root, "real", "test",
                             test_mode="seen", **KW)
    unseen = CylinderHFDataset("cylinder", converted_root, "real", "test",
                               test_mode="unseen", **KW)
    assert len(seen) + len(unseen) == len(all_t)


def test_hf_autoregressive_filter(converted_root):
    ds = CylinderHFDataset("cylinder", converted_root, "real", "test",
                           N_autoregressive=3, **KW)
    for t in ds.time_id_mapping["test"]:
        assert t + ds.horizon < 64
    x, y = ds[0]
    assert y.shape[0] == 12


def test_allow_patterns():
    pats = build_allow_patterns(scenarios=["cylinder"], what="metadata")
    assert "cylinder/in_dist_test_params_*.json" in pats
    pats = build_allow_patterns(
        scenarios=["fsi"], what="hf_dataset", dataset_types=["real"],
        splits=["train"],
    )
    assert "fsi/hf_dataset/real/**" in pats
    assert "fsi/hf_dataset/train_index_real.json" in pats
    pats = build_allow_patterns(
        scenarios=["combustion"], what="all", include_surrogate_train=True
    )
    assert "combustion/hf_dataset/surrogate_train/**" in pats
    with pytest.raises(ValueError):
        build_allow_patterns(scenarios=[], what="all")


def test_train_eval_on_hf_backend(converted_root, tmp_path):
    """End-to-end train + eval with use_hf_dataset=True."""
    from realpdebench_tpu.config import Config
    from realpdebench_tpu.eval.__main__ import run_eval
    from realpdebench_tpu.train.loop import run_training

    cfg = Config(
        exp_name="hf_e2e", seed=0,
        results_path=os.path.join(converted_root, "results"),
        dataset_name="cylinder", dataset_root=converted_root, num_workers=0,
        normalizer="gaussian", mask_prob=0.1, noise_scale=0.0,
        model_name="fno", modes1=2, modes2=3, modes3=3, n_layers=1, width=4,
        scheduler="cosine", step_size=100, num_update=2,
        train_batch_size=8, test_batch_size=8, lr=1e-3, clip_grad_norm=0.0,
        N_autoregressive=2, N_plot=0, probe_diagnostic=False, N_plot_probe=0,
        train_data_type="numerical", is_use_tb=False, use_hf_dataset=True,
        mesh_shape="dp=8,mp=1", **KW,
    )
    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    state, history = run_training(cfg, exp)
    assert np.isfinite(history["train_loss"]).all()

    results = run_eval(cfg.replace(checkpoint_path=os.path.join(exp, "ckpt")),
                       str(tmp_path / "eval"))
    assert np.isfinite(results["rel_l2_error"])
