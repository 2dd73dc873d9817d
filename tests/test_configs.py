"""Sweep every shipped YAML config through the config merge + model factory.

Catches drift between the generated configs (realpdebench_tpu/configs/**,
mirroring the reference's config/ hyperparameters) and the registry's
keyword plumbing — a wrong or renamed key fails model construction here
instead of at launch time on a TPU pod.
"""

import glob
import os

import numpy as np
import pytest
import yaml

from realpdebench_tpu.models.registry import build_model

CONFIG_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "realpdebench_tpu", "configs",
)
ALL_CONFIGS = sorted(
    glob.glob(os.path.join(CONFIG_ROOT, "*", "*.yaml"))
)


class _TinyDataset:
    """Two-sample stand-in so factories that probe train_dataset[0] or scan
    samples (the WDNO wavelet rescaler) can run without real data."""

    dataset_type = "numerical"

    def __init__(self, shape_in, shape_out):
        rng = np.random.default_rng(0)
        self._x = rng.standard_normal((2, *shape_in)).astype(np.float32)
        self._y = rng.standard_normal((2, *shape_out)).astype(np.float32)

    def __len__(self):
        return 2

    def __getitem__(self, i):
        return self._x[i], self._y[i]


def _probe_shapes(cfg):
    t_in = int(cfg.get("in_step", 4))
    t_out = int(cfg.get("out_step", 4))
    c = 17 if cfg.get("dataset_name") == "combustion" else 3
    return (t_in, 16, 16, c), (t_out, 16, 16, c)


@pytest.mark.parametrize(
    "path", ALL_CONFIGS,
    ids=[os.path.join(*p.split(os.sep)[-2:]) for p in ALL_CONFIGS],
)
def test_config_builds_model(path, tmp_path):
    with open(path) as f:
        cfg = yaml.safe_load(f)
    assert "model_name" in cfg, f"{path} missing model_name"
    shape_in, shape_out = _probe_shapes(cfg)
    kwargs = dict(cfg)
    # heavy diffusion sampling knobs scaled down for the sweep
    if cfg["model_name"] == "wdno":
        kwargs.update(timesteps=8, sampling_timesteps=2,
                      dataset_root=str(tmp_path), dim=8, dim_mults=[1, 2])
        os.makedirs(tmp_path / cfg.get("dataset_name", "cylinder"),
                    exist_ok=True)
    bundle = build_model(
        train_dataset=_TinyDataset(shape_in, shape_out),
        shapes=(shape_in, shape_out),
        **kwargs,
    )
    assert bundle.name == cfg["model_name"]
    assert bundle.module is not None or not bundle.trainable
