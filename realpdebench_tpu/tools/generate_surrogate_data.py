"""Offline surrogate rollout: trained surrogate × full numerical trajectories
→ `{root}/combustion/surrogate/*.h5` consumed by CombustionDataset's
numerical branch.

Reference: `realpdebench/data/generate_surrogate_data.py:42-98` (NOTE: the
reference script has stale imports and hard-coded paths — SURVEY §2.2; this is
the working equivalent). The surrogate input is the 15 numerical fields + gas
ratio + equivalence-ratio planes; the output is the predicted observed channel.

Usage:
    python -m realpdebench_tpu.tools.generate_surrogate_data \
        --dataset-root ./datasets --checkpoint ./results/.../ckpt \
        --config configs/combustion/surrogate_model/fno.yaml [--step 10]
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np


def generate(dataset_root, checkpoint_path, cfg, step=10, batch_size=8,
             sub_s=1, n_sim_frame=40):
    import h5py
    import jax

    from realpdebench_tpu.data.normalizer import GaussianNormalizer
    from realpdebench_tpu.data.surrogate import SurrogateDataset
    from realpdebench_tpu.models.registry import build_model
    from realpdebench_tpu.train.checkpoint import CheckpointManager
    from realpdebench_tpu.train.train_step import TrainState, build_optimizer

    num_dir = os.path.join(dataset_root, "combustion", "numerical")
    real_dir = os.path.join(dataset_root, "combustion", "real")
    out_dir = os.path.join(dataset_root, "combustion", "surrogate")
    os.makedirs(out_dir, exist_ok=True)

    norm_ds = SurrogateDataset("combustion", dataset_root, "train", step=step,
                               n_sim_frame=n_sim_frame)
    normalizer = GaussianNormalizer(norm_ds, is_save=False)

    x0, y0 = norm_ds[0]
    bundle = build_model(
        shapes=((step, *x0.shape[1:3], 17), (step, *x0.shape[1:3], 1)),
        **cfg.to_dict(),
    )
    variables = bundle.init(jax.random.PRNGKey(0), x0[None])
    params, model_state = bundle.split_variables(variables)
    state = TrainState.create(params, model_state, build_optimizer(cfg))
    mgr = CheckpointManager(checkpoint_path)
    state, _ = mgr.restore(state, load_opt_state=False)
    mgr.close()
    variables = {"params": state.params, **state.model_state}

    @jax.jit
    def predict(x):
        xn, _ = normalizer.preprocess(x, x[..., :1])
        pred = bundle.predict(variables, xn)
        _, pred = normalizer.postprocess(xn, pred)
        return pred

    for fn in sorted(os.listdir(num_dir)):
        if not fn.endswith(".h5"):
            continue
        m = re.match(r"(\d+)NH3_(\d+\.?\d*)\.h5", fn)
        gas, equiv = int(m.group(1)), float(m.group(2))
        with h5py.File(os.path.join(num_dir, fn), "r") as f:
            num = np.asarray(
                f["measured_data"][:, ::sub_s, ::sub_s], np.float32
            )
        T = num.shape[0]
        ones = np.ones_like(num[..., :1])
        inp = np.concatenate([num, gas * ones, equiv * ones], axis=-1)

        preds = []
        for s in range(0, T - step + 1, step):
            window = inp[s : s + step][None]
            preds.append(np.asarray(predict(window))[0, ..., 0])
        rem = T - (T // step) * step
        if rem > 0:  # trailing partial window: predict a full window, keep tail
            window = inp[T - step :][None]
            preds.append(np.asarray(predict(window))[0, -rem:, ..., 0])
        surrogate = np.concatenate(preds, axis=0)
        assert surrogate.shape[0] == T, (surrogate.shape, T)

        with h5py.File(os.path.join(out_dir, fn), "w") as f:
            f.create_dataset("measured_data", data=surrogate)
        print(f"{fn}: surrogate {surrogate.shape} written")


def main():
    from realpdebench_tpu.config import load_config

    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset-root", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--step", type=int, default=10)
    parser.add_argument("--sub-s", type=int, default=1)
    parser.add_argument("--n-sim-frame", type=int, default=40)
    args = parser.parse_args()
    cfg = load_config(args.config)
    generate(args.dataset_root, args.checkpoint, cfg, step=args.step,
             sub_s=args.sub_s, n_sim_frame=args.n_sim_frame)


if __name__ == "__main__":
    main()
