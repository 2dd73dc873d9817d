"""Combustion surrogate-training datasets (HDF5 and Arrow backends).

The surrogate maps 15 simulated combustion fields + 2 parameter planes
(gas ratio, equivalence ratio) to the 1-channel real observation; it is later
rolled over full numerical trajectories to produce the `surrogate/` channel
consumed by CombustionDataset (SURVEY §2.2). Reference:
`realpdebench/data/combustion_surrogate_dataset.py:12-75` and
`combustion_surrogate_hf_dataset.py`.

Sampling semantics preserved exactly: ``__getitem__`` ignores its index and
draws a random (sim, time) crop (surrogate_dataset.py:45-47); epoch length is
n_sim·n_sim_frame for train and the held-out fraction for test.
"""

from __future__ import annotations

import os
import re

import numpy as np


class SurrogateDataset:
    file_name_pattern = r"(\d+)NH3_(\d+\.?\d*)\.h5"

    def __init__(self, dataset_name, dataset_root, mode, train_ratio=0.8,
                 step=20, n_sim_frame=40, n_sim_frame_test=2001,
                 sub_s_real=1, sub_s_numerical=1, seed=0):
        assert dataset_name == "combustion"
        self.dataset_dir = os.path.join(dataset_root, dataset_name)
        self.real_dataset_path = os.path.join(
            self.dataset_dir, "real_surrogate_train"
        )
        self.numerical_dataset_path = os.path.join(
            self.dataset_dir, "numerical_surrogate_train"
        )
        self.time_ids = list(range(n_sim_frame - step))
        self.sim_ids = sorted(
            f for f in os.listdir(self.numerical_dataset_path)
            if f.endswith(".h5")
        )
        self.n_sim = len(self.sim_ids)
        self.mode = mode
        self.step = step
        self.n_sim_frame = n_sim_frame
        self.train_ratio = train_ratio
        self.sub_s_real = sub_s_real
        self.sub_s_numerical = sub_s_numerical
        self.numerical_channel = 15
        self._rng = np.random.default_rng(seed + hash(mode) % 2**31)

    def _params(self, sim_id):
        m = re.match(self.file_name_pattern, sim_id)
        return int(m.group(1)), float(m.group(2))

    def _load_pair(self, sim_id, time_id):
        import h5py

        with h5py.File(os.path.join(self.real_dataset_path, sim_id), "r") as f:
            real = f["trajectory"][
                time_id : time_id + self.step,
                :: self.sub_s_real, :: self.sub_s_real,
            ].astype(np.float32)[..., None]
        with h5py.File(
            os.path.join(self.numerical_dataset_path, sim_id), "r"
        ) as f:
            num = f["measured_data"][
                time_id : time_id + self.step,
                :: self.sub_s_numerical, :: self.sub_s_numerical,
            ].astype(np.float32)
        return real, num

    def _with_param_planes(self, num, sim_id):
        gas, equiv = self._params(sim_id)
        ones = np.ones_like(num[..., :1])
        return np.concatenate([num, gas * ones, equiv * ones], axis=-1)

    def __getitem__(self, idx):
        sim_id = self.sim_ids[self._rng.integers(len(self.sim_ids))]
        time_id = self.time_ids[self._rng.integers(len(self.time_ids))]
        real, num = self._load_pair(sim_id, time_id)
        return self._with_param_planes(num, sim_id), real  # (T,H,W,17), (T,H,W,1)

    def __len__(self):
        if self.mode == "train":
            return int(self.n_sim * self.n_sim_frame)
        return int(
            self.n_sim * self.n_sim_frame / self.train_ratio
            * (1 - self.train_ratio)
        )


class CombustionSurrogateHFDataset(SurrogateDataset):
    """Arrow-backed variant: per-(sim, time)-window rows with sim outer ×
    time inner ordering (combustion_surrogate_hf_dataset.py:181-213)."""

    def __init__(self, dataset_name, dataset_root, mode,
                 hf_auto_download=False,
                 hf_repo_id="AI4Science-WestlakeU/RealPDEBench",
                 hf_endpoint=None, hf_revision=None,
                 train_ratio=0.8, step=20, n_sim_frame=40,
                 sub_s_real=1, sub_s_numerical=1, seed=0, **kw):
        assert dataset_name == "combustion"
        self.dataset_dir = os.path.join(dataset_root, dataset_name)
        self.hf_dir = os.path.join(self.dataset_dir, "hf_dataset")
        traj_path = os.path.join(self.hf_dir, "surrogate_train")
        if not os.path.exists(traj_path) and hf_auto_download:
            from realpdebench_tpu.data.hf_download import download_realpdebench

            download_realpdebench(
                dataset_root=dataset_root, scenarios=["combustion"],
                what="hf_dataset", include_surrogate_train=True,
                repo_id=hf_repo_id, endpoint=hf_endpoint, revision=hf_revision,
            )
        from datasets import load_from_disk

        self.trajectories = load_from_disk(traj_path)
        sim_ids_path = os.path.join(self.hf_dir, "surrogate_train_sim_ids.txt")
        with open(sim_ids_path) as f:
            self.sim_ids = [line.strip() for line in f if line.strip()]
        self.n_sim = len(self.sim_ids)
        self.real_dataset_path = traj_path
        self.numerical_dataset_path = traj_path
        self.mode = mode
        self.step = step
        self.n_sim_frame = n_sim_frame
        self.train_ratio = train_ratio
        self.sub_s_real = sub_s_real
        self.sub_s_numerical = sub_s_numerical
        self.numerical_channel = 15
        self.time_ids = list(range(n_sim_frame - step))
        self._rng = np.random.default_rng(seed + hash(mode) % 2**31)
        self._n_time = len(self.time_ids)

    def _load_pair(self, sim_id, time_id):
        row_idx = self.sim_ids.index(sim_id) * self._n_time + time_id
        row = self.trajectories[row_idx]
        if row["sim_id"] != sim_id or int(row["time_id"]) != int(time_id):
            raise RuntimeError(
                "HF surrogate dataset ordering mismatch; re-run conversion "
                "with sim_ids outer loop and time_ids inner loop."
            )
        real = np.frombuffer(row["real"], np.float32).reshape(
            row["real_shape_t"], row["real_shape_h"], row["real_shape_w"]
        )[:, :: self.sub_s_real, :: self.sub_s_real][..., None]
        num = np.frombuffer(row["numerical"], np.float32).reshape(
            row["numerical_shape_t"], row["numerical_shape_h"],
            row["numerical_shape_w"], row["numerical_channels"],
        )[:, :: self.sub_s_numerical, :: self.sub_s_numerical]
        return real, num
