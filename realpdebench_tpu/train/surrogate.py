"""Combustion surrogate training — `python -m realpdebench_tpu.train.surrogate`.

Reference: `realpdebench/train_surrogate.py:50-243`. Trains the 17-channel →
1-channel surrogate (numerical fields + parameter planes → real observation),
evaluates every 50 iterations with the simplified metric set (normalized MSE,
RMSE, MAE, Rel-L2) and checkpoints at each evaluation. Uses the same jitted
train step as the main loop.
"""

from __future__ import annotations

import argparse
import datetime
import logging
import os
import time

import jax
import numpy as np

from realpdebench_tpu.config import merge_config
from realpdebench_tpu.core.mesh import (
    allgather_to_host,
    assemble_from_process_local,
    make_mesh_context,
)
from realpdebench_tpu.core.prefetch import prefetch_to_device
from realpdebench_tpu.data.loader import DataLoader, cycle_loader
from realpdebench_tpu.data.normalizer import build_normalizer
from realpdebench_tpu.data.surrogate import (
    CombustionSurrogateHFDataset,
    SurrogateDataset,
)
from realpdebench_tpu.models.registry import build_model
from realpdebench_tpu.train.checkpoint import CheckpointManager
from realpdebench_tpu.train.train_step import (
    TrainState,
    build_optimizer,
    make_eval_step,
    make_train_step,
)
from realpdebench_tpu.utils.misc import set_seed, setup_logging


def run_surrogate_training(cfg, exp_path):
    mesh_ctx = make_mesh_context(cfg.get("mesh_shape"))
    use_hf = bool(cfg.get("use_hf_dataset", False))
    cls = CombustionSurrogateHFDataset if use_hf else SurrogateDataset
    common = dict(dataset_name=cfg.dataset_name, dataset_root=cfg.dataset_root)
    if use_hf:
        common.update(
            hf_auto_download=bool(cfg.get("hf_auto_download", False)),
            hf_repo_id=cfg.get("hf_repo_id", "AI4Science-WestlakeU/RealPDEBench"),
            hf_endpoint=cfg.get("hf_endpoint"),
            hf_revision=cfg.get("hf_revision"),
        )
    for k in ("step", "n_sim_frame", "sub_s_real", "sub_s_numerical",
              "train_ratio"):
        if cfg.get(k) is not None:
            common[k] = cfg.get(k)

    train_ds = cls(mode="train", **common)
    test_ds = cls(mode="test", **common)
    norm_ds = cls(mode="train", **common)
    logging.info(f"Data loaded from {train_ds.numerical_dataset_path}")

    global_bs = mesh_ctx.pad_batch(int(cfg.train_batch_size))
    # multi-host: per-process slices, assembled by prefetch_to_device
    # (process_sharded=True) — same pattern as train/loop.py
    train_loader = DataLoader(train_ds, batch_size=global_bs, shuffle=True,
                              drop_last=True, process_shard=True,
                              seed=int(cfg.get("seed", 0)),
                              num_workers=int(cfg.get("num_workers", 4)))
    test_loader = DataLoader(test_ds,
                             batch_size=mesh_ctx.pad_batch(
                                 int(cfg.test_batch_size)),
                             pad_last=True, process_shard=True,
                             num_workers=int(cfg.get("num_workers", 4)))

    # surrogate normalizer stats are never cached (train_surrogate.py:113-116)
    normalizer = build_normalizer(
        cfg.get("normalizer", "gaussian"), norm_ds, is_save=False
    )
    bundle = build_model(train_dataset=train_ds, **cfg.to_dict())

    x0, _ = train_ds[0]
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    rng, init_rng = jax.random.split(rng)
    variables = bundle.init(init_rng, x0[None])
    params, model_state = bundle.split_variables(variables)
    logging.info(f"Number of parameters: {bundle.param_count(variables)}")

    state = TrainState.create(params, model_state, build_optimizer(cfg))
    state = jax.device_put(state, mesh_ctx.replicated)
    step_fn = make_train_step(bundle, normalizer, mesh_ctx,
                              grad_accum=int(cfg.get("grad_accum", 1) or 1))
    eval_fn = make_eval_step(bundle, normalizer, c=None, mesh_ctx=mesh_ctx)
    ckpt = CheckpointManager(os.path.join(exp_path, "ckpt"))

    batches = prefetch_to_device(cycle_loader(train_loader),
                                 mesh_ctx.batch_sharding,
                                 process_sharded=True)
    num_update = int(cfg.num_update)
    history = {"train_loss": [], "test": {k: [] for k in
               ("normalized_mse", "rmse", "mae", "rel_l2_error")}}
    best_loss, best_iter = float("inf"), 0
    total, count = 0.0, 0
    t0 = time.time()

    for iteration in range(1, num_update + 1):
        x, y = next(batches)
        rng, k = jax.random.split(rng)
        state, loss = step_fn(state, x, y, k)
        lv = float(loss)
        total += lv
        count += 1
        history["train_loss"].append(lv)

        if iteration % 50 == 0:
            variables = {"params": state.params, **state.model_state}
            nmse_sum, nb = 0.0, 0
            preds, targets = [], []
            for batch in test_loader:
                # multi-host: assemble the per-process slices into the
                # global batch and gather predictions back before slicing
                # with the GLOBAL pad mask (same pattern as run_validation)
                bx = assemble_from_process_local(batch[0], mesh_ctx)
                by = assemble_from_process_local(batch[1], mesh_ctx)
                n_real = (int(batch[2].sum()) if len(batch) > 2
                          else batch[0].shape[0])
                rng, k = jax.random.split(rng)
                nmse, p, t = eval_fn(variables, bx, by, k)
                nmse_sum += float(nmse)
                nb += 1
                preds.append(allgather_to_host(p)[:n_real])
                targets.append(allgather_to_host(t)[:n_real])
            pred = np.concatenate(preds)
            target = np.concatenate(targets)
            rmse = float(np.sqrt(np.mean((pred - target) ** 2)))
            mae = float(np.mean(np.abs(pred - target)))
            b = pred.shape[0]
            err = np.linalg.norm((pred - target).reshape(b, -1), axis=1)
            nrm = np.linalg.norm(target.reshape(b, -1), axis=1)
            rel = float(np.mean(err / nrm))
            vals = dict(normalized_mse=nmse_sum / max(nb, 1), rmse=rmse,
                        mae=mae, rel_l2_error=rel)
            for kk, v in vals.items():
                history["test"][kk].append(v)
            if rmse < best_loss:
                best_loss, best_iter = rmse, iteration
            logging.info(
                f"Iteration {iteration}, train loss: {total / max(count,1):.5f}"
            )
            logging.info(
                "Validation results: "
                + ", ".join(f"{kk}: {v:.5f}" for kk, v in vals.items())
            )
            total, count = 0.0, 0
            ckpt.save(iteration, state, metadata={
                "iteration": iteration, "best_iteration": best_iter,
                "best_test_loss": best_loss,
            })

    ckpt.wait()
    logging.info(
        f"Training complete, best iteration {best_iter}, "
        f"time {(time.time() - t0) / 60:.2f} min"
    )
    ckpt.close()
    return state, history


def main():
    parser = argparse.ArgumentParser(description="Surrogate training")
    parser.add_argument("--config", type=str,
                        default="configs/combustion/surrogate_model/fno.yaml")
    parser.add_argument("--use_hf_dataset", action="store_true")
    parser.add_argument("--hf_auto_download", action="store_true")
    parser.add_argument("--hf_repo_id", type=str,
                        default="AI4Science-WestlakeU/RealPDEBench")
    parser.add_argument("--hf_endpoint", type=str, default=None)
    parser.add_argument("--hf_revision", type=str, default=None)
    parser.add_argument("--mesh_shape", type=str, default=None)
    args = parser.parse_args()
    cfg = merge_config(args)
    set_seed(int(cfg.get("seed", 0)))

    current_time = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    exp_path = os.path.join(cfg.get("results_path", "./results/"),
                            cfg.model_name, cfg.exp_name, current_time)
    os.makedirs(exp_path, exist_ok=True)
    writer = setup_logging(exp_path, bool(cfg.get("is_use_tb")))
    logging.info(f"args: {cfg.to_dict()}")
    run_surrogate_training(cfg, exp_path)
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
