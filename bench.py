#!/usr/bin/env python
"""Benchmark: cylinder/FNO train step throughput + rollout frames/sec on TPU.

Workload matches the reference's headline configuration
(`configs/cylinder/fno.yaml`: batch 32, window (20, 64, 128, 3) — the real
cylinder grid, modes (4, 12, 16), 4 layers, width 64 — see BASELINE.md) with
device-synthesized data. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

``vs_baseline`` compares against the documented A100 torch estimate below
(the repo publishes no numbers — BASELINE.md). Target is ≥5× on v5e-8.
"""

import json
import os
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: no persistent compilation cache here — in this environment CPU
# executables are AOT-compiled on the remote-compile server and round-trip
# through the cache with mismatched host features, silently poisoning reruns

# Estimated A100 torch reference throughput for cylinder/FNO (steps/sec).
# The repo publishes no numbers (BASELINE.md). Estimate: fwd+bwd ≈ 3.7 TFLOP
# per step (4 spectral layers + pointwise convs at bs32·(26,70,134)·w64),
# cuFFT-dominated f32 with TF32 matmuls at the ~15-25% end-to-end MFU typical
# of torch FNO training on A100 → ≈ 2-4 steps/s; we use the midpoint.
A100_REFERENCE_STEPS_PER_SEC = 3.0

BATCH = 32
SHAPE_IN = (20, 64, 128, 3)
SHAPE_OUT = (20, 64, 128, 3)
N_AUTOREGRESSIVE = 10
EVAL_BATCH = 8  # re-decided round 4: 6734 f/s @8 vs 6668 @32, 64 OOMs
# (bench_results/r4/rollout_sweep.jsonl — per-frame cost is batch-invariant)


def main():
    from realpdebench_tpu.config import Config
    from realpdebench_tpu.data.normalizer import IdentityNormalizer
    from realpdebench_tpu.eval.rollout import make_rollout_fn
    from realpdebench_tpu.models.registry import build_model
    from realpdebench_tpu.train.train_step import (
        TrainState,
        build_optimizer,
        make_train_step,
    )

    n_chips = jax.device_count()
    # batches are synthesized ON DEVICE: the benchmark measures compute, not
    # the host link (which is a slow tunnel in this environment)
    key = jax.random.PRNGKey(0)
    kx, ky, key = jax.random.split(key, 3)
    make_x = jax.jit(lambda k: jax.random.normal(k, (BATCH, *SHAPE_IN), jnp.float32))
    make_y = jax.jit(lambda k: jax.random.normal(k, (BATCH, *SHAPE_OUT), jnp.float32))
    xd = make_x(kx)
    yd = make_y(ky)
    x = np.zeros((1, *SHAPE_IN), np.float32)  # tiny host sample for init shapes

    bundle = build_model(
        shapes=(SHAPE_IN, SHAPE_OUT),
        model_name="fno", modes1=4, modes2=12, modes3=16, n_layers=4, width=64,
        compute_dtype="bfloat16", remat=False,  # bf16 activations fit 16GB
    )
    variables = bundle.init(jax.random.PRNGKey(0), x)
    params, model_state = bundle.split_variables(variables)
    cfg = Config(lr=1e-4, scheduler="cosine", num_update=4000, clip_grad_norm=0.0)
    state = TrainState.create(params, model_state, build_optimizer(cfg))
    # microbatch so bs-32 fp32 activations fit one v5e chip's 16G HBM.
    # NOTE: with BatchNorm models the accumulated gradient is a ghost-batch
    # approximation of the full-batch gradient (BN stats are per-microbatch);
    # the deviation is documented and quantified in train/train_step.py and
    # tests/test_fno.py::test_grad_accum_bn_deviation.
    # accum=1 fits 16G HBM since the round-4 traffic cut (bf16 packed
    # spectra) and measured +2.9% over accum=4 (bench_results/r4/
    # ab_experiments.jsonl: 4.015 vs 3.903 steps/s)
    grad_accum = int(os.environ.get("BENCH_GRAD_ACCUM", "1")) if n_chips == 1 else 1
    step = make_train_step(bundle, IdentityNormalizer(), grad_accum=grad_accum)

    # warmup / compile (two steps: the first may include autotuning)
    state, loss = step(state, xd, yd, key)
    jax.block_until_ready(loss)
    state, loss = step(state, xd, yd, key)
    jax.block_until_ready(loss)

    # repeated timed windows → median of window rates (round-1 showed single
    # windows can be skewed ~2x by remote-compile-service contention)
    n_windows, n_steps = 5, 10
    window_rates = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for i in range(n_steps):
            key, k = jax.random.split(key)
            state, loss = step(state, xd, yd, k)
        # device_get is the only reliable execution barrier on this runtime
        # (block_until_ready can return before the async dispatch drains);
        # the scalar fetch cost amortizes over the window
        final_loss = float(np.asarray(jax.device_get(loss)))
        window_rates.append(n_steps / (time.perf_counter() - t0))
    window_rates.sort()
    steps_per_sec = window_rates[len(window_rates) // 2]
    # spread over STABLE windows only: a window <0.5x median is a stall
    # (recompile / remote-service contention), not steady-state variance —
    # it stays visible in window_rates but must not dominate the spread
    stable = [r for r in window_rates if r >= 0.5 * steps_per_sec]
    spread = (stable[-1] - stable[0]) / steps_per_sec if stable else 0.0
    n_stalled = len(window_rates) - len(stable)
    steps_per_sec_chip = steps_per_sec / n_chips

    # MFU: executed FLOPs per step measured by tools/model_bench.py --flops
    # in a CPU subprocess (unfused build at grad_accum=1 — XLA cost analysis
    # on the fused TPU program misses Pallas custom-call FLOPs and counts
    # the accum scan body once, undercounting >20x). Fallback: the analytic
    # fwd+bwd estimate. v5e-1 peak: 197 TFLOP/s bf16.
    flops_per_step, flops_src = 2.7e12, "analytic"
    try:
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.model_bench import fetch_flops

        measured = fetch_flops("fno", timeout=900)
        if measured:
            flops_per_step, flops_src = measured, "xla_cpu_unfused"
    except Exception:
        pass
    peak_flops = 197e12 * n_chips
    mfu = steps_per_sec * flops_per_step / peak_flops

    # --- dp=8 proxy (VERDICT r3 item 3): one chip running microbatch 4 at
    # grad_accum=1 is exactly the per-chip workload of dp=8 at global bs32.
    # projected_v5e8 = 1 / (per-chip step time + estimated ring-allreduce
    # time for the f32 grads over ICI), i.e. compute/psum NOT overlapped —
    # a conservative projection. ICI assumption: one 2x4 v5e slice,
    # ~90 GB/s usable per chip (2 links x ~45 GB/s); ring all-reduce moves
    # 2*(N-1)/N * grad_bytes per chip. BENCH_DP8_PROXY=0 skips (one extra
    # multi-minute compile through the tunnel).
    dp8 = {}
    if os.environ.get("BENCH_DP8_PROXY", "1") != "0" and n_chips == 1:
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(params))
        k4x, k4y, key = jax.random.split(key, 3)
        x4 = jax.jit(lambda k: jax.random.normal(
            k, (4, *SHAPE_IN), jnp.float32))(k4x)
        y4 = jax.jit(lambda k: jax.random.normal(
            k, (4, *SHAPE_OUT), jnp.float32))(k4y)
        v4 = bundle.init(jax.random.PRNGKey(0), x)
        p4, ms4 = bundle.split_variables(v4)
        state4 = TrainState.create(p4, ms4, build_optimizer(cfg))
        step4 = make_train_step(bundle, IdentityNormalizer(), grad_accum=1)
        state4, l4 = step4(state4, x4, y4, key)
        jax.block_until_ready(l4)
        rates4 = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                key, k = jax.random.split(key)
                state4, l4 = step4(state4, x4, y4, k)
            _ = float(np.asarray(jax.device_get(l4)))
            rates4.append(20 / (time.perf_counter() - t0))
        rates4.sort()
        r4 = rates4[1]
        grad_bytes = n_params * 4
        ici_gbps = 90e9
        t_psum = 2 * (8 - 1) / 8 * grad_bytes / ici_gbps
        projected = 1.0 / (1.0 / r4 + t_psum)
        # measured vs modeled kept visually distinct (advisor, round 4):
        # the bs4 proxy rate is a MEASUREMENT; everything else in the
        # sub-object is an analytic model on top of it
        dp8 = {
            "dp8_proxy_bs4_steps_per_sec": round(r4, 3),
            "projection": {
                "estimated_v5e8_steps_per_sec": round(projected, 3),
                "estimated_v5e8_vs_baseline": round(
                    projected / A100_REFERENCE_STEPS_PER_SEC, 3),
                "ici_assumption": "2x4 v5e, 90 GB/s/chip ring allreduce, "
                                  "no compute overlap",
                "psum_ms_estimate": round(t_psum * 1e3, 2),
            },
        }
        del state4, x4, y4
        key, _ = jax.random.split(key)

    # rollout frames/sec (eval path, device-synthesized batch); free the
    # training buffers first — opt state + donated batches otherwise sit in
    # HBM alongside the rollout activations
    eval_vars = {"params": state.params, **state.model_state}
    del state, xd, yd
    import gc

    gc.collect()
    key, k1, k2 = jax.random.split(key, 3)
    xr = jax.jit(lambda k: jax.random.normal(
        k, (EVAL_BATCH, *SHAPE_IN), jnp.float32))(k1)
    yr = jax.jit(lambda k: jax.random.normal(
        k, (EVAL_BATCH, SHAPE_OUT[0] * N_AUTOREGRESSIVE, *SHAPE_OUT[1:]),
        jnp.float32))(k2)
    rollout = make_rollout_fn(bundle, IdentityNormalizer(), N_AUTOREGRESSIVE)
    pred, _, _ = rollout(eval_vars, xr, yr, key)
    jax.block_until_ready(pred)
    # same multi-window median as the train measurement above: a single
    # window through the tunnel can be skewed ~2x by remote-compile-service
    # contention / stalls (round-4: one-window rollout read 3236 f/s while
    # tools/rollout_sweep.py's 3-window medians read 6668-6734 across batch
    # sizes with exact batch-linearity — the single window ate a stall)
    roll_rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(3):
            pred, _, _ = rollout(eval_vars, xr, yr, key)
            # chain iterations so an async runtime cannot overlap them
            xr = xr + 0.0 * pred[:, : SHAPE_IN[0]]
        _ = float(np.asarray(jax.device_get(pred[0, 0, 0, 0, 0])))  # barrier
        roll_rates.append(
            3 * EVAL_BATCH * N_AUTOREGRESSIVE * SHAPE_OUT[0]
            / (time.perf_counter() - t0))
    roll_rates.sort()
    frames_per_sec = roll_rates[len(roll_rates) // 2]

    result = {
        "metric": "train steps/sec/chip (cylinder FNO, bs32)",
        "value": round(steps_per_sec_chip, 3),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_sec_chip / A100_REFERENCE_STEPS_PER_SEC, 3),
        "baseline_source": "estimate",
        "baseline_note": "A100 ref is a FLOP-model estimate (3.0 steps/s), "
                         "not a measurement; a driver-side torch reference "
                         "measurement is requested in BASELINE.md",
        "window_rates": [round(r, 3) for r in window_rates],
        "window_spread": round(spread, 3),
        "n_stalled_windows": n_stalled,
        "rollout_frames_per_sec": round(frames_per_sec, 1),
        "rollout_window_rates": [round(r, 1) for r in roll_rates],
        "n_chips": n_chips,
        "device": str(jax.devices()[0].platform),
        "final_loss": final_loss,
        "grad_accum": grad_accum,
        "mfu": round(mfu, 4),
        "flops_per_step": flops_per_step,
        "flops_model": flops_src,
        **dp8,
    }
    # measured same-host torch-vs-jax anchor (tools/cpu_matched_baseline.py):
    # the one hard cross-framework number available without egress/GPU
    cpu_anchor = pathlib.Path(__file__).parent / "bench_results" / "r5" / \
        "cpu_matched_baseline.json"
    if cpu_anchor.exists():
        try:
            a = json.loads(cpu_anchor.read_text())
            import datetime

            mtime = datetime.datetime.utcfromtimestamp(
                cpu_anchor.stat().st_mtime).strftime("%Y-%m-%d")
            result["cpu_matched"] = {
                "jax_over_torch_speedup": a["jax_over_torch_speedup"],
                "measured_on": a.get("measured_on", mtime),
                "note": a["note"] + " — a point-in-time anchor, not "
                "re-measured per bench run",
            }
        except (KeyError, ValueError, OSError):
            result["cpu_matched_error"] = "anchor file unreadable"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
