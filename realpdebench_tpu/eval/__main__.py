"""`python -m realpdebench_tpu.eval --config ... --checkpoint_path ...`

Reference: `realpdebench/eval.py:57-367` — load checkpoint, autoregressive
rollout over the real test split, 13-metric sweep (chunked per eval batch when
N_autoregressive > 4), optional result plots and probe diagnostics."""

import datetime
import logging
import os

import jax
import numpy as np

from realpdebench_tpu.config import make_arg_parser, merge_config
from realpdebench_tpu.core.mesh import make_mesh_context, maybe_initialize_distributed
from realpdebench_tpu.data.loader import DataLoader
from realpdebench_tpu.data.normalizer import build_normalizer
from realpdebench_tpu.eval.metrics import (
    METRIC_NAMES,
    eval_metrics,
    infer_unmeasured_channels,
)
from realpdebench_tpu.eval.plots import plot_result
from realpdebench_tpu.eval.probes import probe_diagnostic
from realpdebench_tpu.eval.rollout import finalize_rollout, make_rollout_fn
from realpdebench_tpu.models.registry import build_model
from realpdebench_tpu.train.loop import (
    _dataset_class,
    build_datasets,
    load_reference_or_orbax_checkpoint,
)
from realpdebench_tpu.train.train_step import TrainState, build_optimizer
from realpdebench_tpu.utils.misc import set_seed, setup_logging


def run_eval(cfg, exp_path: str):
    mesh_ctx = make_mesh_context(cfg.get("mesh_shape"))
    use_hf = bool(cfg.get("use_hf_dataset", False))

    # datasets: test (real, autoregressive horizon), train (shape probe),
    # normalizer (numerical train) — reference eval.py:91-260
    cls = _dataset_class(cfg.dataset_name, use_hf)
    common = dict(dataset_name=cfg.dataset_name, dataset_root=cfg.dataset_root)
    if use_hf:
        common.update(
            hf_auto_download=bool(cfg.get("hf_auto_download", False)),
            hf_repo_id=cfg.get("hf_repo_id", "AI4Science-WestlakeU/RealPDEBench"),
            hf_endpoint=cfg.get("hf_endpoint"),
            hf_revision=cfg.get("hf_revision"),
        )
    gen = {}
    for k in ("in_step", "out_step", "interval", "trunk_length", "n_sim_frame",
              "sub_s_real", "sub_s_numerical", "train_ratio",
              "n_sim_in_distribution", "n_sim_out_distribution",
              "generate_ids_if_missing"):
        if cfg.get(k) is not None:
            gen[k] = cfg.get(k)
    test_ds = cls(mode="test", dataset_type="real",
                  N_autoregressive=int(cfg.N_autoregressive),
                  test_mode=cfg.get("test_mode", "all"), **common, **gen)
    train_ds = cls(mode="train", dataset_type=cfg.get("train_data_type",
                                                      "numerical"),
                   mask_prob=cfg.get("mask_prob", 0.5), **common, **gen)
    norm_ds = cls(mode="train", dataset_type="numerical", **common, **gen)

    loader = DataLoader(test_ds, batch_size=int(cfg.test_batch_size),
                        num_workers=int(cfg.get("num_workers", 4)),
                        pad_last=True)
    normalizer = build_normalizer(cfg.get("normalizer", "gaussian"), norm_ds)
    extra = {}
    if cfg.get("seq_shard") and mesh_ctx.mp_size > 1:
        # sequence parallelism: GKT token axis over mp (core/partitioning.py)
        extra["seq_mesh"] = mesh_ctx.mesh
    bundle = build_model(train_dataset=train_ds, **cfg.to_dict(), **extra)

    x0, _ = train_ds[0]
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    rng, init_rng = jax.random.split(rng)
    variables = bundle.init(init_rng, x0[None])
    logging.info(f"Number of parameters: {bundle.param_count(variables)}")

    if bundle.trainable:
        params, model_state = bundle.split_variables(variables)
        state = TrainState.create(params, model_state, build_optimizer(cfg))
        state = load_reference_or_orbax_checkpoint(
            cfg.checkpoint_path, state, bundle
        )
        variables = {"params": state.params, **state.model_state}
        logging.info(f"Checkpoint {cfg.checkpoint_path} loaded.")
    else:
        logging.info("Training-free model; no checkpoint loaded.")

    x_probe, y_probe = test_ds[0]
    unmeasured_c = infer_unmeasured_channels(y_probe[None])
    c = y_probe.shape[-1] - unmeasured_c
    para_c = max(0, x_probe.shape[-1] - y_probe.shape[-1])

    n_steps = int(cfg.N_autoregressive)
    if bundle.trainable:
        rollout = make_rollout_fn(bundle, normalizer, n_steps, para_c)
    else:
        from realpdebench_tpu.eval.rollout import make_host_rollout_fn

        rollout = make_host_rollout_fn(bundle, normalizer, n_steps, para_c)

    pred_list, target_list, probe_errors = [], [], []
    nmse_sum, n_batches = 0.0, 0
    for batch_idx, batch in enumerate(loader):
        x, y = batch[0], batch[1]
        n_real = int(batch[2].sum()) if len(batch) > 2 else x.shape[0]
        rng, k = jax.random.split(rng)
        pred_norm, xn, yn = rollout(variables, x, y, k)
        nmse, pred_phys, target_phys = finalize_rollout(
            normalizer, pred_norm, xn, yn, c
        )
        nmse_sum += float(nmse)
        n_batches += 1
        pred_np = np.asarray(pred_phys)[:n_real]
        target_np = np.asarray(target_phys)[:n_real]

        if batch_idx == 0 and int(cfg.get("N_plot", 0)) > 0:
            plot_result(pred_np, target_np, exp_path, int(cfg.N_plot),
                        unmeasured_c)
        if cfg.get("probe_diagnostic"):
            kwargs = {}
            if batch_idx == 0:
                kwargs = dict(N_plot=int(cfg.get("N_plot_probe", 0)),
                              exp_path=exp_path)
            probe_errors.extend(
                probe_diagnostic(pred_np, target_np, test_ds.d,
                                 test_ds.center_x, test_ds.center_y,
                                 test_ds.sub_s_real, **kwargs)
            )
        pred_list.append(pred_np)
        target_list.append(target_np)

    pred_all = np.concatenate(pred_list, axis=0)
    target_all = np.concatenate(target_list, axis=0)
    eval_bs = int(cfg.test_batch_size) if n_steps > 4 else pred_all.shape[0]
    vals = eval_metrics(pred_all, target_all, c, eval_bs)
    results = dict(zip(METRIC_NAMES, (float(v) for v in vals)))
    results["normalized_mse"] = nmse_sum / max(n_batches, 1)

    logging.info(
        "Test results: "
        + ", ".join(f"{k}: {v:.5f}" for k, v in results.items())
    )
    if probe_errors:
        results["probe_error"] = float(np.mean(probe_errors))
        logging.info(f"Probe based diagnostic: {results['probe_error']:.5f}")
    return results


def main():
    parser = make_arg_parser("RealPDEBench-TPU evaluation")
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--test_mode", type=str, default="all",
                        help="all | in_dist | out_dist | seen | unseen")
    args = parser.parse_args()
    cfg = merge_config(args)
    maybe_initialize_distributed()
    set_seed(int(cfg.get("seed", 0)))

    current_time = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    exp_path = os.path.join(cfg.get("results_path", "./results/"),
                            cfg.model_name, f"{cfg.exp_name}_eval", current_time)
    os.makedirs(exp_path, exist_ok=True)
    setup_logging(exp_path, is_train=False)
    logging.info(f"args: {cfg.to_dict()}")

    run_eval(cfg, exp_path)
    logging.info(f"Results saved at {exp_path}")


if __name__ == "__main__":
    main()
