"""End-to-end training loop: the 3-paradigm driver.

Reference: `realpdebench/train.py:55-425`. Paradigms
(`--train_data_type numerical|real`, `--is_finetune`):
  * train-on-numerical  — train split of the numerical data
  * train-on-real       — train split of the real data
  * finetune            — load checkpoint, continue on the other type
Validation runs every num_update/50 iterations on the real val split with the
full 13-metric sweep; checkpoints saved at each validation (train.py:344-418).

TPU structure: one jitted train step (train_step.py) consuming double-buffered
sharded batches; validation uses the jitted eval step, metrics computed on
device. The loop itself is thin host code.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import numpy as np

from realpdebench_tpu.core.mesh import MeshContext, make_mesh_context
from realpdebench_tpu.core.prefetch import prefetch_to_device
from realpdebench_tpu.data.loader import DataLoader, cycle_loader
from realpdebench_tpu.data.normalizer import build_normalizer
from realpdebench_tpu.eval.metrics import (
    METRIC_NAMES,
    eval_metrics,
    infer_unmeasured_channels,
)
from realpdebench_tpu.models.registry import build_model
from realpdebench_tpu.utils.profiling import StepTimer, maybe_trace
from realpdebench_tpu.train.checkpoint import CheckpointManager
from realpdebench_tpu.train.train_step import (
    TrainState,
    build_optimizer,
    make_eval_step,
    make_train_step,
)

VAL_KEYS = ["normalized_mse"] + list(METRIC_NAMES)


def build_datasets(cfg, train_data_type: str, use_hf: bool = False):
    """Dataset triplet (train / val / normalizer) per reference train.py:81-267.

    Val is always the real val split; the normalizer always streams the
    numerical train split.
    """
    name = cfg.dataset_name
    common = dict(dataset_name=name, dataset_root=cfg.dataset_root)
    extra_train = dict(
        mask_prob=cfg.get("mask_prob", 0.5),
        noise_scale=cfg.get("noise_scale", 0.0),
    )
    gen = dict(generate_ids_if_missing=bool(cfg.get("generate_ids_if_missing",
                                                    False)))
    for k in ("in_step", "out_step", "interval", "trunk_length", "n_sim_frame",
              "sub_s_real", "sub_s_numerical", "train_ratio",
              "n_sim_in_distribution", "n_sim_out_distribution", "noise_type",
              "optical_kernel_size", "optical_sigma"):
        if cfg.get(k) is not None:
            gen[k] = cfg.get(k)

    cls = _dataset_class(name, use_hf)
    hf_kwargs = {}
    if use_hf:
        hf_kwargs = dict(
            hf_auto_download=bool(cfg.get("hf_auto_download", False)),
            hf_repo_id=cfg.get("hf_repo_id", "AI4Science-WestlakeU/RealPDEBench"),
            hf_endpoint=cfg.get("hf_endpoint"),
            hf_revision=cfg.get("hf_revision"),
        )
    train_ds = cls(mode="train", dataset_type=train_data_type,
                   **common, **extra_train, **gen, **hf_kwargs)
    val_ds = cls(mode="val", dataset_type="real", **common, **gen, **hf_kwargs)
    norm_ds = cls(mode="train", dataset_type="numerical",
                  **common, **gen, **hf_kwargs)
    return train_ds, val_ds, norm_ds


def _dataset_class(name: str, use_hf: bool):
    if use_hf:
        from realpdebench_tpu.data.hf_datasets import HF_DATASETS

        if name not in HF_DATASETS:
            raise ValueError(f"Dataset {name} not supported (hf)")
        return HF_DATASETS[name]
    from realpdebench_tpu.data.combustion import CombustionDataset
    from realpdebench_tpu.data.fluid import FLUID_DATASETS

    if name == "combustion":
        return CombustionDataset
    if name in FLUID_DATASETS:
        return FLUID_DATASETS[name]
    raise ValueError(f"Dataset {name} not supported")


def run_training(cfg, exp_path: str, mesh_ctx: MeshContext | None = None,
                 writer=None):
    """Run the full training loop; returns (state, history)."""
    if mesh_ctx is None:
        mesh_ctx = make_mesh_context(cfg.get("mesh_shape"))

    train_data_type = cfg.get("train_data_type", "numerical")
    use_hf = bool(cfg.get("use_hf_dataset", False))
    train_ds, val_ds, norm_ds = build_datasets(cfg, train_data_type, use_hf)
    logging.info(
        f"Datasets: train={len(train_ds)} val={len(val_ds)} "
        f"(type={train_data_type}, hf={use_hf})"
    )

    global_bs = mesh_ctx.pad_batch(int(cfg.train_batch_size))
    # multi-host: each process loads only its slice of every global batch
    # (same shuffle seed everywhere keeps the index permutation aligned);
    # prefetch_to_device assembles the slices into global sharded arrays
    train_loader = DataLoader(
        train_ds, batch_size=global_bs, shuffle=True, drop_last=True,
        num_workers=int(cfg.get("num_workers", 4)), seed=int(cfg.get("seed", 0)),
        process_shard=True,
    )
    # pad_last keeps every val batch the same shape (one compiled eval step);
    # padded rows are dropped host-side before the metric sweep. The val
    # loader is process-sharded like the train loader so multi-host
    # validation assembles global batches the same way.
    val_loader = DataLoader(
        val_ds, batch_size=mesh_ctx.pad_batch(int(cfg.test_batch_size)),
        shuffle=False, num_workers=int(cfg.get("num_workers", 4)),
        pad_last=True, process_shard=True,
    )

    normalizer = build_normalizer(cfg.get("normalizer", "gaussian"), norm_ds)
    extra = {}
    if cfg.get("seq_shard") and mesh_ctx.mp_size > 1:
        # sequence parallelism: token axis over mp for GKT and Transolver
        # (core/partitioning.py::token_constraint)
        extra["seq_mesh"] = mesh_ctx.mesh
    bundle = build_model(train_dataset=train_ds, **cfg.to_dict(), **extra)

    x0, y0 = train_ds[0]
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    rng, init_rng = jax.random.split(rng)
    variables = bundle.init(init_rng, x0[None])
    params, model_state = bundle.split_variables(variables)
    n_params = bundle.param_count(variables)
    logging.info(f"Number of parameters: {n_params}")

    tx = build_optimizer(cfg)
    state = TrainState.create(params, model_state, tx)

    ckpt = CheckpointManager(os.path.join(exp_path, "ckpt"))
    start_iteration = 0
    if cfg.get("resume"):
        # full resume (params + optimizer + step) from this experiment's own
        # checkpoint dir — capability the reference lacks (it restarts Adam,
        # SURVEY §5 checkpoint row)
        resume_dir = cfg.get("resume") if isinstance(cfg.get("resume"), str)             else os.path.join(exp_path, "ckpt")
        mgr = CheckpointManager(resume_dir)
        if mgr.latest_step() is not None:
            state, meta = mgr.restore(state, load_opt_state=True)
            start_iteration = int(state.step)
            logging.info(
                f"Resumed from {resume_dir} at iteration {start_iteration}"
            )
        mgr.close()
    if cfg.get("is_finetune"):
        state = load_reference_or_orbax_checkpoint(
            cfg.checkpoint_path, state, bundle
        )
        logging.info(f"Checkpoint {cfg.checkpoint_path} loaded (finetune)")
    if mesh_ctx.mp_size > 1:
        # tensor-parallel placement: weight output-channels over mp
        from realpdebench_tpu.core.partitioning import shard_train_state

        state = shard_train_state(state, mesh_ctx)
    else:
        # params/opt state replicated across the mesh (batch is dp-sharded)
        state = jax.device_put(state, mesh_ctx.replicated)

    step_fn = make_train_step(bundle, normalizer, mesh_ctx,
                              grad_accum=int(cfg.get("grad_accum", 1) or 1))
    eval_fn = None  # built lazily once c is known

    num_update = int(cfg.num_update)
    val_every = max(1, num_update // 50)
    batches = prefetch_to_device(
        cycle_loader(train_loader), mesh_ctx.batch_sharding,
        process_sharded=True,
    )

    history = {"train_loss": [], "val": {k: [] for k in VAL_KEYS}}
    best_val, best_iter = float("inf"), 0
    unmeasured_c = None
    t_start = time.time()
    total_loss, count = 0.0, 0
    timer = StepTimer(warmup=2)
    profile_dir = cfg.get("profile_dir")
    profile_window = (10, min(20, num_update))  # steps traced when enabled

    # losses stay on device between validations: float(loss) per step would
    # force a host sync every iteration (~30 ms round-trip on tunneled
    # runtimes); instead device scalars accumulate in a list and one batched
    # fetch drains them at each validation/log boundary
    pending_losses: list = []

    def _drain_losses():
        nonlocal total_loss, count
        if not pending_losses:
            return
        vals = [float(v) for v in jax.device_get(pending_losses)]
        start_it = iteration - len(vals) + 1
        for j, lv in enumerate(vals):
            history["train_loss"].append(lv)
            if writer is not None:
                writer.add_scalar("train_loss", lv, start_it + j)
        total_loss += sum(vals)
        count += len(vals)
        pending_losses.clear()

    for iteration in range(start_iteration + 1, num_update + 1):
        x, y = next(batches)
        rng, k = jax.random.split(rng)
        with maybe_trace(
            profile_dir, enabled=iteration == profile_window[0]
        ) as tracing:
            if tracing:
                for _ in range(profile_window[0], profile_window[1]):
                    state, loss = step_fn(state, x, y, k)
                jax.block_until_ready(loss)
        state, loss = step_fn(state, x, y, k)
        timer.tick()
        pending_losses.append(loss)

        if iteration % val_every == 0:
            _drain_losses()
            if unmeasured_c is None:
                _, y_probe = val_ds[0]
                unmeasured_c = infer_unmeasured_channels(y_probe[None])
                c = y_probe.shape[-1] - unmeasured_c
                eval_fn = make_eval_step(bundle, normalizer, c, mesh_ctx)
            val = run_validation(
                state, bundle, eval_fn, val_loader, c, rng, mesh_ctx
            )
            for kk in VAL_KEYS:
                history["val"][kk].append(val[kk])
            if val["rmse"] < best_val:
                best_val, best_iter = val["rmse"], iteration
            logging.info(
                f"Iteration {iteration}, train loss: {total_loss / max(count,1):.5f}"
            )  # noqa: E501
            logging.info(
                "Validation results: "
                + ", ".join(f"{kk}: {val[kk]:.5f}" for kk in VAL_KEYS)
            )
            total_loss, count = 0.0, 0
            if writer is not None:
                for kk in ("normalized_mse", "rmse", "mae", "rel_l2_error"):
                    writer.add_scalar(f"val_{kk}", val[kk], iteration)
            ckpt.save(
                iteration, state,
                metadata={
                    "iteration": iteration,
                    "best_iteration": best_iter,
                    "best_val_loss": best_val,
                    "val_losses": {k: v for k, v in history["val"].items()},
                },
            )

    _drain_losses()
    ckpt.wait()
    elapsed = time.time() - t_start
    perf = timer.summary()
    logging.info(
        f"Training complete, best iteration {best_iter}, "
        f"time {elapsed / 60:.2f} min "
        f"({num_update / elapsed:.2f} steps/s incl. validation; "
        f"perf: {perf})"
    )
    history["perf"] = perf
    ckpt.close()
    return state, history


def run_validation(state, bundle, eval_fn, val_loader, c, rng,
                   mesh_ctx: MeshContext | None = None):
    """Full-val-set metric sweep (reference train.py:344-402).

    Multi-host: the val loader yields per-process slices of each global
    batch (plus a GLOBAL pad mask); slices are assembled onto the mesh with
    ``make_array_from_process_local_data`` and predictions are gathered back
    to every host with ``process_allgather`` before the (host-side, full-
    array) metric sweep.
    """
    from realpdebench_tpu.core.mesh import (
        allgather_to_host as _gather,
    )
    from realpdebench_tpu.core.mesh import assemble_from_process_local

    def _assemble(x):
        return assemble_from_process_local(x, mesh_ctx)

    variables = {"params": state.params, **state.model_state}
    nmse_sum, n_batches = 0.0, 0
    preds, targets = [], []
    for batch in val_loader:
        x, y = _assemble(batch[0]), _assemble(batch[1])
        n_real = int(batch[2].sum()) if len(batch) > 2 else batch[0].shape[0]
        rng, k = jax.random.split(rng)
        nmse, pred_phys, target_phys = eval_fn(variables, x, y, k)
        nmse_sum += float(nmse)
        n_batches += 1
        preds.append(_gather(pred_phys)[:n_real])
        targets.append(_gather(target_phys)[:n_real])
    vals = eval_metrics(
        np.concatenate(preds, axis=0), np.concatenate(targets, axis=0), c
    )
    out = dict(zip(METRIC_NAMES, (float(v) for v in vals)))
    out["normalized_mse"] = nmse_sum / max(n_batches, 1)
    return out


def load_reference_or_orbax_checkpoint(path: str, state, bundle):
    """Load either an orbax checkpoint directory or a reference torch .pth
    (via interop converter) into the train state — weights only, fresh
    optimizer (reference finetune semantics, SURVEY §5 checkpoint row)."""
    if os.path.isdir(path):
        mgr = CheckpointManager(path)
        state, _ = mgr.restore(state, load_opt_state=False)
        mgr.close()
        return state
    from realpdebench_tpu.interop.torch_convert import load_torch_checkpoint

    params, model_state = load_torch_checkpoint(
        path, bundle, state.params, state.model_state
    )
    return state.replace(params=params, model_state=model_state)
