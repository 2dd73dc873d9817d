"""HuggingFace Arrow-backed dataset sources — V2 lazy-slicing format.

Functional parity with the reference (`realpdebench/data/fluid_hf_dataset.py`,
`combustion_hf_dataset.py`): complete trajectories are stored once in an Arrow
dataset per `{scenario}/hf_dataset/{type}/`; JSON index files
`{split}_index_{type}.json` map samples to (sim_id, time_id); slicing
``[time_id : time_id+horizon, ::sub_s, ::sub_s]`` happens lazily at read time
so any N_autoregressive works without re-conversion. Raw bytes are decoded
with ``np.frombuffer`` (zero-copy; fluid_hf_dataset.py:254-256). Test-params
filters come from JSON sidecars (fluid_hf_dataset.py:196-243).

Implementation note: these classes inherit the noise/conditioning/windowing
code from the HDF5 datasets — only storage access differs, so the two backends
can never drift apart.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List

import numpy as np

from realpdebench_tpu import check_data_version
from realpdebench_tpu.data.combustion import CombustionDataset
from realpdebench_tpu.utils.misc import derive_seed
from realpdebench_tpu.data.fluid import (
    Cylinder,
    ControlledCylinder,
    FluidDataset,
    Foil,
    FSI,
)


class _HFTrajectoryMixin:
    """Arrow + JSON-index storage layer shared by all HF dataset classes."""

    def _init_hf(
        self,
        dataset_name,
        dataset_root,
        dataset_type,
        mode,
        test_mode,
        N_autoregressive,
        hf_auto_download=False,
        hf_repo_id="AI4Science-WestlakeU/RealPDEBench",
        hf_endpoint=None,
        hf_revision=None,
    ):
        check_data_version(dataset_root)
        self.dataset_dir = os.path.join(dataset_root, dataset_name)
        self.dataset_path = os.path.join(self.dataset_dir, dataset_type)
        self.hf_dataset_dir = os.path.join(self.dataset_dir, "hf_dataset")
        self.sub_s = (
            self.sub_s_real if dataset_type == "real" else self.sub_s_numerical
        )

        trajectory_path = os.path.join(self.hf_dataset_dir, dataset_type)
        index_path = os.path.join(
            self.hf_dataset_dir, f"{mode}_index_{dataset_type}.json"
        )
        if not (os.path.exists(trajectory_path) and os.path.exists(index_path)):
            from realpdebench_tpu.data.hf_download import ensure_hf_artifacts

            ensure_hf_artifacts(
                dataset_root=dataset_root,
                scenario=dataset_name,
                dataset_type=dataset_type,
                split=mode,
                need_test_params_json=(
                    mode in ("val", "test") and test_mode != "all"
                ),
                hf_auto_download=hf_auto_download,
                repo_id=hf_repo_id,
                endpoint=hf_endpoint,
                revision=hf_revision,
            )
        if not os.path.exists(trajectory_path):
            raise FileNotFoundError(
                f"HF Arrow trajectories not found: {trajectory_path}\n"
                "Run `python -m realpdebench_tpu.tools.convert_hdf5_to_hf ...`"
            )
        if not os.path.exists(index_path):
            raise FileNotFoundError(f"Index file not found: {index_path}")

        from datasets import load_from_disk

        self.trajectories = load_from_disk(trajectory_path)
        self._sim_id_to_idx: Dict[str, int] = {
            self.trajectories[i]["sim_id"]: i
            for i in range(len(self.trajectories))
        }
        with open(index_path) as f:
            indices: List[dict] = json.load(f)
        logging.info(
            f"{type(self).__name__}: {len(self.trajectories)} trajectories, "
            f"{len(indices)} indices ({mode}/{dataset_type})"
        )

        # feed the parent-class split machinery
        self.sim_id_mapping = {mode: [e["sim_id"] for e in indices]}
        self.time_id_mapping = {mode: [e["time_id"] for e in indices]}

        self.in_dist_test_params = {}
        self.out_dist_test_params = {}
        self.remain_params = {}
        if mode in ("val", "test") and test_mode != "all":
            self._load_test_params_json(dataset_type)
            from realpdebench_tpu.data import splits as S

            sids, tids = S.filter_test_mode(
                self.sim_id_mapping[mode], self.time_id_mapping[mode],
                test_mode, self.in_dist_test_params,
                self.out_dist_test_params, self.remain_params,
            )
            self.sim_id_mapping[mode] = sids
            self.time_id_mapping[mode] = tids
        if mode in ("val", "test") and N_autoregressive > 1:
            from realpdebench_tpu.data import splits as S

            sids, tids = S.filter_horizon(
                self.sim_id_mapping[mode], self.time_id_mapping[mode],
                self.horizon, self.n_sim_frame,
            )
            self.sim_id_mapping[mode] = sids
            self.time_id_mapping[mode] = tids

    def _load_test_params_json(self, dataset_type):
        for attr, name in (
            ("in_dist_test_params", "in_dist_test_params"),
            ("out_dist_test_params", "out_dist_test_params"),
            ("remain_params", "remain_params"),
        ):
            path = os.path.join(self.dataset_dir, f"{name}_{dataset_type}.json")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"Missing JSON test params file: {path}"
                )
            with open(path) as f:
                setattr(self, attr, json.load(f))

    @staticmethod
    def _decode(binary, shape, dtype=np.float32):
        return np.frombuffer(binary, dtype=dtype).reshape(shape)

    def _row(self, sim_id):
        return self.trajectories[self._sim_id_to_idx[sim_id]]


class FluidHFDataset(_HFTrajectoryMixin, FluidDataset):
    """Arrow-backed fluid dataset; row schema: sim_id, shape_t/h/w,
    u, v [, p] as float32 bytes."""

    def __init__(self, dataset_name, dataset_root, dataset_type, mode,
                 hf_auto_download=False,
                 hf_repo_id="AI4Science-WestlakeU/RealPDEBench",
                 hf_endpoint=None, hf_revision=None, test_mode="all",
                 seed=0, generate_ids_if_missing=False, **kw):
        # window arithmetic fields without touching HDF5 (the parent __init__
        # scans directories; replicate just its parameter bookkeeping)
        defaults = dict(
            mask_prob=0.5, in_step=20, out_step=20, N_autoregressive=1,
            interval=10, train_ratio=0.5, trunk_length=190, noise_scale=0.0,
            n_sim_frame=2173, sub_s_real=1, sub_s_numerical=2,
            noise_type="gaussian", optical_kernel_size=4, optical_sigma=1.0,
        )
        defaults.update({k: v for k, v in kw.items() if k in defaults})
        self.dataset_type = dataset_type
        self.mode = mode
        self.test_mode = test_mode
        self.mask_prob = defaults["mask_prob"]
        self.noise_scale = defaults["noise_scale"]
        self.noise_type = defaults["noise_type"]
        self.optical_kernel_size = defaults["optical_kernel_size"]
        self.optical_sigma = defaults["optical_sigma"]
        self.sub_s_real = defaults["sub_s_real"]
        self.sub_s_numerical = defaults["sub_s_numerical"]
        self.in_step = defaults["in_step"]
        self.out_step = defaults["out_step"] * defaults["N_autoregressive"]
        self.N_autoregressive = defaults["N_autoregressive"]
        self.horizon = self.in_step + self.out_step
        self.n_sim_frame = defaults["n_sim_frame"]
        self._rng = np.random.default_rng(derive_seed(seed, mode, dataset_type))
        self._init_hf(
            dataset_name, dataset_root, dataset_type, mode, test_mode,
            defaults["N_autoregressive"], hf_auto_download, hf_repo_id,
            hf_endpoint, hf_revision,
        )

    def _read_window(self, sim_id, time_id):
        row = self._row(sim_id)
        shape = (row["shape_t"], row["shape_h"], row["shape_w"])
        sub = self.sub_s
        sl = slice(time_id, time_id + self.horizon)
        u = self._decode(row["u"], shape)[sl, ::sub, ::sub]
        v = self._decode(row["v"], shape)[sl, ::sub, ::sub]
        if self.dataset_type == "real" or self._rng.random() < self.mask_prob:
            p = np.zeros_like(u)
        else:
            p = self._decode(row["p"], shape)[sl, ::sub, ::sub]
        return np.stack([u, v, p], axis=-1).astype(np.float32)


class CylinderHFDataset(FluidHFDataset):
    file_name_pattern = Cylinder.file_name_pattern
    condition_on_para = False
    d, center_x, center_y = Cylinder.d, Cylinder.center_x, Cylinder.center_y

    def __init__(self, dataset_name, dataset_root, dataset_type, mode, **kw):
        kw.setdefault("in_step", 20)
        kw.setdefault("out_step", 20)
        kw.setdefault("interval", 20)
        kw.setdefault("trunk_length", 250)
        kw.setdefault("n_sim_frame", 3990)
        kw.setdefault("sub_s_real", 1)
        kw.setdefault("sub_s_numerical", 2)
        super().__init__(dataset_name, dataset_root, dataset_type, mode, **kw)


class FSIHFDataset(FluidHFDataset):
    file_name_pattern = FSI.file_name_pattern
    condition_on_para = False
    d, center_x, center_y = FSI.d, FSI.center_x, FSI.center_y

    def __init__(self, dataset_name, dataset_root, dataset_type, mode, **kw):
        kw.setdefault("n_sim_frame", 2173)
        kw.setdefault("sub_s_real", 2)
        super().__init__(dataset_name, dataset_root, dataset_type, mode, **kw)


class ControlledCylinderHFDataset(FluidHFDataset):
    file_name_pattern = ControlledCylinder.file_name_pattern
    condition_on_para = True
    d = ControlledCylinder.d
    center_x, center_y = ControlledCylinder.center_x, ControlledCylinder.center_y

    def __init__(self, dataset_name, dataset_root, dataset_type, mode, **kw):
        kw.setdefault("in_step", 10)
        kw.setdefault("out_step", 10)
        kw.setdefault("interval", 20)
        kw.setdefault("trunk_length", 250)
        kw.setdefault("n_sim_frame", 3990)
        super().__init__(dataset_name, dataset_root, dataset_type, mode, **kw)


class FoilHFDataset(FluidHFDataset):
    file_name_pattern = Foil.file_name_pattern
    condition_on_para = False
    d, center_x, center_y = Foil.d, Foil.center_x, Foil.center_y

    def __init__(self, dataset_name, dataset_root, dataset_type, mode, **kw):
        kw.setdefault("in_step", 20)
        kw.setdefault("out_step", 20)
        kw.setdefault("interval", 20)
        kw.setdefault("trunk_length", 250)
        kw.setdefault("n_sim_frame", 3990)
        kw.setdefault("sub_s_real", 2)
        super().__init__(dataset_name, dataset_root, dataset_type, mode, **kw)


class CombustionHFDataset(_HFTrajectoryMixin, CombustionDataset):
    """Arrow-backed combustion dataset; row schema: sim_id, shape_t/h/w,
    observed (T·H·W f32 bytes) [, numerical (T·H·W·numerical_channels),
    numerical_channels] — reference combustion_hf_dataset.py:258-345."""

    file_name_pattern = CombustionDataset.file_name_pattern
    condition_on_para = False
    numerical_channel = 15
    d, center_x, center_y = 0, 0, 0

    def __init__(self, dataset_name, dataset_root, dataset_type, mode,
                 hf_auto_download=False,
                 hf_repo_id="AI4Science-WestlakeU/RealPDEBench",
                 hf_endpoint=None, hf_revision=None, test_mode="all",
                 seed=0, generate_ids_if_missing=False, **kw):
        defaults = dict(
            mask_prob=0.8, in_step=20, out_step=20, N_autoregressive=1,
            interval=1, trunk_length=101, noise_scale=0.0, n_sim_frame=2001,
            sub_s_real=2, sub_s_numerical=2, noise_type="gaussian",
            optical_kernel_size=4, optical_sigma=1.0,
        )
        defaults.update({k: v for k, v in kw.items() if k in defaults})
        self.dataset_type = dataset_type
        self.mode = mode
        self.test_mode = test_mode
        for k in ("mask_prob", "noise_scale", "noise_type",
                  "optical_kernel_size", "optical_sigma", "sub_s_real",
                  "sub_s_numerical", "n_sim_frame"):
            setattr(self, k, defaults[k])
        self.in_step = defaults["in_step"]
        self.out_step = defaults["out_step"] * defaults["N_autoregressive"]
        self.N_autoregressive = defaults["N_autoregressive"]
        self.horizon = self.in_step + self.out_step
        self._rng = np.random.default_rng(derive_seed(seed, mode, dataset_type))
        self._init_hf(
            dataset_name, dataset_root, dataset_type, mode, test_mode,
            defaults["N_autoregressive"], hf_auto_download, hf_repo_id,
            hf_endpoint, hf_revision,
        )

    def _read_window(self, sim_id, time_id):
        row = self._row(sim_id)
        shape = (row["shape_t"], row["shape_h"], row["shape_w"])
        sub = self.sub_s
        sl = slice(time_id, time_id + self.horizon)
        obs = self._decode(row["observed"], shape)[sl, ::sub, ::sub]
        obs = obs[..., None].astype(np.float32)
        if self.dataset_type == "real":
            zeros = np.zeros(obs.shape[:3] + (self.numerical_channel,),
                             np.float32)
            return np.concatenate([obs, zeros], axis=-1)
        if self._rng.random() < self.mask_prob:
            num = np.zeros(obs.shape[:3] + (self.numerical_channel,),
                           np.float32)
        else:
            nc = row["numerical_channels"]
            num = self._decode(row["numerical"], (*shape, nc))[
                sl, ::sub, ::sub
            ].astype(np.float32)
        return np.concatenate([obs, num], axis=-1)


HF_DATASETS = {
    "cylinder": CylinderHFDataset,
    "fsi": FSIHFDataset,
    "controlled_cylinder": ControlledCylinderHFDataset,
    "foil": FoilHFDataset,
    "combustion": CombustionHFDataset,
}
