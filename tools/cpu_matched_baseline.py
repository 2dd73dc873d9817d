"""Measured same-hardware torch-vs-JAX baseline (VERDICT r4 next-8).

``bench.py``'s ``vs_baseline`` divides by an A100 FLOP-model ESTIMATE
(3.0 steps/s) because the reference publishes no per-step timings and this
environment has no GPU and no egress. This tool produces the one hard
cross-framework number that CAN be measured here: the reference torch
training loop (``reference/realpdebench/train.py:290-334`` semantics —
Adam + train_loss + backward) and our jitted train step, at a MATCHED
cylinder-window FNO config, from converted-identical weights, on identical
batches, on the SAME host CPU. The ratio is a framework-efficiency anchor
that is independent of the guessed A100 denominator: it cannot prove an
absolute A100 number, but it bounds "is the TPU framework's software stack
actually faster than the reference's, or is vs_baseline an artifact".

Caveats (in-band in the JSON): single CPU core, f32 (no MXU/bf16), XLA:CPU
vs torch-CPU codegen — this measures the two frameworks' CPU backends, not
TPU vs A100. The width is reduced (32 vs 128) so a step fits single-core
CPU time; shapes (window, modes, layers) match configs/cylinder/fno.yaml.

Writes bench_results/r5/cpu_matched_baseline.json; bench.py surfaces it
as ``cpu_matched`` next to the estimate-based ``vs_baseline``.

Usage: python tools/cpu_matched_baseline.py [n_steps]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import tempfile
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, "/root/reference")

import numpy as np

# cylinder window + reference modes/layers (configs/cylinder/fno.yaml);
# width reduced 128 -> 32 for single-core CPU step time
SI = SO = (20, 64, 128, 3)
KW = dict(modes1=4, modes2=12, modes3=16, n_layers=4, width=32)
BATCH = 2
LR = 1e-3


def _bench(step_fn, n_steps, warmup=2):
    for _ in range(warmup):
        step_fn()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step_fn()
    return (time.perf_counter() - t0) / n_steps


def main(n_steps: int = 10) -> None:
    import torch

    from tests.test_checkpoint_parity import (
        _install_import_stubs,
        _save_reference_ckpt,
    )

    _install_import_stubs()
    from realpdebench.model.fno import FNO3d as TorchFNO3d

    rng = np.random.default_rng(0)
    x = rng.normal(size=(BATCH, *SI)).astype(np.float32)
    y = rng.normal(size=(BATCH, *SO)).astype(np.float32)

    torch.manual_seed(0)
    tm = TorchFNO3d(shape_in=SI, shape_out=SO, **KW)
    opt = torch.optim.Adam(tm.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=n_steps + 8)
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    tm.train()

    def torch_step():
        opt.zero_grad()
        loss = tm.train_loss(xt, yt).mean()
        loss.backward()
        opt.step()
        sched.step()
        return loss

    torch_s = _bench(torch_step, n_steps)

    # --- ours, from converted-identical weights ---------------------------
    import jax

    from realpdebench_tpu.config import Config
    from realpdebench_tpu.data.normalizer import IdentityNormalizer
    from realpdebench_tpu.models.registry import build_model
    from realpdebench_tpu.train.loop import (
        load_reference_or_orbax_checkpoint,
    )
    from realpdebench_tpu.train.train_step import (
        TrainState,
        build_optimizer,
        make_train_step,
    )

    bundle = build_model(shapes=(SI, SO), model_name="fno", **KW)
    variables = bundle.init(jax.random.PRNGKey(0), x[:1])
    params, model_state = bundle.split_variables(variables)
    cfg = Config(lr=LR, scheduler="cosine", num_update=n_steps + 8)
    state = TrainState.create(params, model_state, build_optimizer(cfg))
    with tempfile.TemporaryDirectory() as td:
        ckpt = _save_reference_ckpt(pathlib.Path(td), tm, "fno")
        state = load_reference_or_orbax_checkpoint(ckpt, state, bundle)
    step = make_train_step(bundle, IdentityNormalizer(), grad_accum=1)
    key = jax.random.PRNGKey(0)

    holder = {"state": state}

    def jax_step():
        holder["state"], loss = step(holder["state"], x, y, key)
        jax.block_until_ready(loss)
        return loss

    jax_s = _bench(jax_step, n_steps)

    # the two loops must be training the same problem: loss agreement at
    # matched weights is the validity check for the timing comparison
    tl = float(torch_step().item())
    jl = float(np.asarray(jax.device_get(jax_step())))

    out = {
        "config": dict(window=SI, batch=BATCH, **KW),
        "hardware": f"host CPU, {os.cpu_count()} core(s), "
                    f"torch_threads={torch.get_num_threads()}",
        "torch_s_per_step": round(torch_s, 4),
        "jax_s_per_step": round(jax_s, 4),
        "jax_over_torch_speedup": round(torch_s / jax_s, 3),
        "loss_torch": round(tl, 6),
        "loss_jax": round(jl, 6),
        "note": "same host CPU, matched config + converted-identical "
                "weights; measures framework software stacks (XLA:CPU vs "
                "torch-CPU), NOT TPU-vs-A100 hardware",
    }
    dest = REPO / "bench_results" / "r5" / "cpu_matched_baseline.json"
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
