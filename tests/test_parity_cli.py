"""End-to-end test of the `parity` CLI subcommand (VERDICT round-2 item 6):
on the synthetic cylinder fixture, save a reference-format torch FNO
checkpoint, then run `eval.parity.run_parity` and assert BOTH sides (this
framework through the converter/rollout path, and the reference torch model
through the mirrored eval.py:296-322 rollout) produce the metric sweep and
agree — the north-star Rel-L2 check as one command."""

import os
import sys

import jax
import numpy as np
import pytest

jax.config.update("jax_default_matmul_precision", "highest")

from realpdebench_tpu.config import Config
from realpdebench_tpu.data.synthetic import make_fluid_tree

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)

sys.path.insert(0, "/root/reference")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity_cli")
    make_fluid_tree(str(root), "cylinder", n_sim=5, n_frame=64, h=16, w=16)
    return str(root)


def _cfg(root, ckpt, **kw):
    base = dict(
        exp_name="parity", seed=0,
        results_path=os.path.join(root, "results"),
        dataset_name="cylinder", dataset_root=root, num_workers=0,
        normalizer="gaussian", mask_prob=0.1, noise_scale=0.0,
        model_name="fno", modes1=2, modes2=3, modes3=3, n_layers=2, width=8,
        scheduler="cosine", step_size=100, num_update=4,
        train_batch_size=8, test_batch_size=8, lr=1e-3, clip_grad_norm=1.0,
        N_autoregressive=2, N_plot=0, probe_diagnostic=False, N_plot_probe=0,
        train_data_type="numerical", is_use_tb=False,
        in_step=4, out_step=4, interval=4, trunk_length=16, n_sim_frame=64,
        n_sim_in_distribution=1, n_sim_out_distribution=1,
        sub_s_real=1, sub_s_numerical=1, generate_ids_if_missing=True,
        checkpoint_path=ckpt, test_mode="all",
    )
    base.update(kw)
    return Config(**base)


def test_parity_cli_end_to_end(root, tmp_path):
    from realpdebench.model.load_model import load_model

    from realpdebench_tpu.eval.parity import run_parity
    from realpdebench_tpu.train.loop import _dataset_class

    # reference torch FNO at the fixture scale, saved in the reference
    # on-disk format (train.py:410-418)
    cfg = _cfg(root, ckpt=None)
    cls = _dataset_class("cylinder", False)
    train_ds = cls(
        mode="train", dataset_type="numerical", dataset_name="cylinder",
        dataset_root=root, in_step=4, out_step=4, interval=4,
        trunk_length=16, n_sim_frame=64, n_sim_in_distribution=1,
        n_sim_out_distribution=1, sub_s_real=1, sub_s_numerical=1,
        generate_ids_if_missing=True,
    )
    tm = load_model(train_ds, device="cpu", **cfg.to_dict())
    path = str(tmp_path / "fno.pth")
    torch.save({"model_state_dict": tm.state_dict(), "train_losses": [0.5],
                "val_losses": [0.6], "iteration": 1, "best_iteration": 1,
                "best_val_loss": 0.6}, path)

    exp = str(tmp_path / "exp")
    os.makedirs(exp, exist_ok=True)
    report = run_parity(_cfg(root, ckpt=path), exp)

    assert report["torch"] is not None, report.get("torch_error")
    for k in ("rel_l2_error", "rmse"):
        a, b = report["tpu"][k], report["torch"][k]
        assert np.isfinite(a) and np.isfinite(b)
        assert abs(a - b) / max(abs(b), 1e-12) < 0.02, (k, a, b)
    assert os.path.isfile(os.path.join(exp, "parity.json"))
