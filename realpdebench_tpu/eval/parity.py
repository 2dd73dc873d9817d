"""`realpdebench-tpu parity` — side-by-side reference-vs-TPU evaluation.

The north-star check (BASELINE.md): load a released reference PyTorch
checkpoint (`/root/reference/README.md:92-113` layout,
`{"model_state_dict": ...}` — reference train.py:410-418), evaluate it

  (a) through THIS framework — converter (`interop/torch_convert.py`) →
      jitted autoregressive rollout → 13-metric sweep, and
  (b) through the reference torch model itself (when the `realpdebench`
      package and torch are importable — e.g. driver-side where the real
      datasets/checkpoints exist), using the SAME data batches, the SAME
      normalizer statistics, and the SAME metric code,

then print both metric sets side by side with relative deviation. One
command turns "Rel-L2 within 1%" from an aspiration into a table:

    realpdebench-tpu parity --config configs/cylinder/fno.yaml \
        --checkpoint_path model.pth --dataset_root /data ...

Reference call path mirrored on the torch side: eval.py:296-322 (rollout
with normalizer round-trips and control-channel re-injection).
"""

from __future__ import annotations

import datetime
import importlib
import json
import logging
import os
import sys

import numpy as np

from realpdebench_tpu.config import make_arg_parser, merge_config
from realpdebench_tpu.eval.metrics import (
    METRIC_NAMES,
    eval_metrics,
    infer_unmeasured_channels,
)
from realpdebench_tpu.utils.misc import set_seed, setup_logging


def _import_reference():
    """Import the reference `realpdebench` package if reachable.

    Order: already-importable (pip-installed) → $REALPDEBENCH_REF →
    /root/reference (the read-only mount used during development)."""
    try:
        return importlib.import_module("realpdebench")
    except ImportError:
        pass
    for root in (os.environ.get("REALPDEBENCH_REF"), "/root/reference"):
        if root and os.path.isdir(os.path.join(root, "realpdebench")):
            if root not in sys.path:
                sys.path.insert(0, root)
            try:
                return importlib.import_module("realpdebench")
            except ImportError:
                return None
    return None


def run_torch_eval(cfg, normalizer, test_loader, train_ds, c, para_c):
    """Evaluate the reference torch model on the same batches/normalizer.

    Mirrors reference eval.py:296-322: autoregressive rollout with
    normalizer round-trips and control-channel re-injection, padded rows
    dropped, then the shared metric sweep."""
    import torch

    from realpdebench.model.load_model import load_model

    kwargs = dict(cfg.to_dict())
    kwargs.setdefault("device", "cpu")
    model = load_model(train_ds, **kwargs)
    model.load_checkpoint(cfg.checkpoint_path, torch.device("cpu"))
    model.eval()

    n_steps = int(cfg.N_autoregressive)
    asnp = lambda a: np.asarray(a, dtype=np.float32)

    preds, targets = [], []
    nmse_sum, n_batches = 0.0, 0
    for batch in test_loader:
        x, y = batch[0], batch[1]
        n_real = int(batch[2].sum()) if len(batch) > 2 else x.shape[0]
        x = asnp(x)
        para_input = x[..., x.shape[-1] - para_c:] if para_c else None
        # identical arithmetic to eval/rollout.py::make_rollout_fn — only
        # the `model(...)` call is torch
        xn, yn = map(asnp, normalizer.preprocess(x, asnp(y)))
        window, steps = xn, []
        with torch.no_grad():
            for _ in range(n_steps):
                p = model(
                    torch.from_numpy(np.ascontiguousarray(window))).numpy()
                _, p_phys = normalizer.postprocess(window, p)
                if para_c:
                    p_phys = np.concatenate(
                        [asnp(p_phys), para_input], axis=-1)
                window, _ = map(asnp, normalizer.preprocess(
                    asnp(p_phys), yn))
                steps.append(window)
        pred_norm = np.concatenate(steps, axis=1)
        if para_c:
            pred_norm = pred_norm[..., :-para_c]
        nmse_sum += float(
            np.mean((pred_norm[..., :c] - yn[..., :c]) ** 2))
        n_batches += 1
        _, pred_phys = normalizer.postprocess(xn, pred_norm)
        _, target_phys = normalizer.postprocess(xn, yn)
        preds.append(asnp(pred_phys)[:n_real])
        targets.append(asnp(target_phys)[:n_real])
    pred_all = np.concatenate(preds, axis=0)
    target_all = np.concatenate(targets, axis=0)
    eval_bs = (int(cfg.test_batch_size) if n_steps > 4
               else pred_all.shape[0])
    vals = eval_metrics(pred_all, target_all, c, eval_bs)
    out = dict(zip(METRIC_NAMES, (float(v) for v in vals)))
    out["normalized_mse"] = nmse_sum / max(n_batches, 1)
    return out


def run_parity(cfg, exp_path: str) -> dict:
    from realpdebench_tpu.data.loader import DataLoader
    from realpdebench_tpu.data.normalizer import build_normalizer
    from realpdebench_tpu.eval.__main__ import run_eval
    from realpdebench_tpu.train.loop import _dataset_class

    # (a) full framework eval through the converter/rollout path
    results_jax = run_eval(cfg, exp_path)

    # (b) reference torch eval on identical batches, when importable
    results_torch = None
    ref = _import_reference()
    torch_err = None
    if ref is None:
        torch_err = "reference `realpdebench` package not importable"
    else:
        try:
            use_hf = bool(cfg.get("use_hf_dataset", False))
            cls = _dataset_class(cfg.dataset_name, use_hf)
            common = dict(dataset_name=cfg.dataset_name,
                          dataset_root=cfg.dataset_root)
            gen = {}
            for k in ("in_step", "out_step", "interval", "trunk_length",
                      "n_sim_frame", "sub_s_real", "sub_s_numerical",
                      "train_ratio", "n_sim_in_distribution",
                      "n_sim_out_distribution", "generate_ids_if_missing"):
                if cfg.get(k) is not None:
                    gen[k] = cfg.get(k)
            test_ds = cls(mode="test", dataset_type="real",
                          N_autoregressive=int(cfg.N_autoregressive),
                          test_mode=cfg.get("test_mode", "all"),
                          **common, **gen)
            train_ds = cls(mode="train",
                           dataset_type=cfg.get("train_data_type",
                                                "numerical"),
                           mask_prob=cfg.get("mask_prob", 0.5),
                           **common, **gen)
            norm_ds = cls(mode="train", dataset_type="numerical",
                          **common, **gen)
            loader = DataLoader(test_ds,
                                batch_size=int(cfg.test_batch_size),
                                num_workers=int(cfg.get("num_workers", 4)),
                                pad_last=True)
            normalizer = build_normalizer(cfg.get("normalizer", "gaussian"),
                                          norm_ds)
            x_probe, y_probe = test_ds[0]
            c = y_probe.shape[-1] - infer_unmeasured_channels(y_probe[None])
            para_c = max(0, x_probe.shape[-1] - y_probe.shape[-1])
            results_torch = run_torch_eval(cfg, normalizer, loader,
                                           train_ds, c, para_c)
        except Exception as e:  # torch side is best-effort diagnostics
            torch_err = f"{type(e).__name__}: {e}"
            logging.exception("reference torch eval failed")

    report = {"tpu": results_jax, "torch": results_torch}
    if torch_err:
        report["torch_error"] = torch_err

    lines = [f"{'metric':<22}{'tpu':>14}{'torch':>14}{'rel_dev':>10}"]
    for k in ["normalized_mse"] + list(METRIC_NAMES):
        a = results_jax.get(k)
        b = (results_torch or {}).get(k)
        if a is None:
            continue
        if b is None:
            lines.append(f"{k:<22}{a:>14.6f}{'-':>14}{'-':>10}")
        else:
            dev = abs(a - b) / max(abs(b), 1e-12)
            lines.append(f"{k:<22}{a:>14.6f}{b:>14.6f}{dev:>10.4f}")
    table = "\n".join(lines)
    logging.info("Parity table:\n" + table)
    print(table)
    print(json.dumps(report))
    with open(os.path.join(exp_path, "parity.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    return report


def main():
    parser = make_arg_parser("RealPDEBench-TPU reference-parity evaluation")
    parser.add_argument("--checkpoint_path", type=str, required=True,
                        help="reference .pth (or orbax dir) to evaluate")
    parser.add_argument("--test_mode", type=str, default="all",
                        help="all | in_dist | out_dist | seen | unseen")
    args = parser.parse_args()
    cfg = merge_config(args)
    set_seed(int(cfg.get("seed", 0)))

    current_time = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    exp_path = os.path.join(cfg.get("results_path", "./results/"),
                            cfg.model_name, f"{cfg.exp_name}_parity",
                            current_time)
    os.makedirs(exp_path, exist_ok=True)
    setup_logging(exp_path, is_train=False)
    logging.info(f"args: {cfg.to_dict()}")
    run_parity(cfg, exp_path)


if __name__ == "__main__":
    main()
