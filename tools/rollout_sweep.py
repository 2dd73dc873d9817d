"""Rollout throughput sweep: frames/s vs eval batch size (cylinder FNO).

The headline bench's EVAL_BATCH=8 was chosen in round 1 (2753 fps vs 1697
at batch 32) — BEFORE bf16 compute and the 8-aligned fused layout. The
reference evaluates at test_batch_size=64 (`configs/cylinder/fno.yaml`),
so larger batches are faithful. This sweep re-decides the operating point
on current code.

Usage:  python tools/rollout_sweep.py [batch ...]   # default 8 16 32 64
Prints one JSON line per batch.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SHAPE_IN = (20, 64, 128, 3)
N_AUTO = 10


def run_one(batch: int, n_rep: int = 5) -> dict:
    from realpdebench_tpu.data.normalizer import IdentityNormalizer
    from realpdebench_tpu.eval.rollout import make_rollout_fn
    from realpdebench_tpu.models.registry import build_model

    bundle = build_model(
        shapes=(SHAPE_IN, SHAPE_IN), model_name="fno", modes1=4, modes2=12,
        modes3=16, n_layers=4, width=64, compute_dtype="bfloat16",
        remat=False)
    x = np.zeros((1, *SHAPE_IN), np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)

    key = jax.random.PRNGKey(1)
    k1, k2, key = jax.random.split(key, 3)
    xr = jax.jit(lambda k: jax.random.normal(
        k, (batch, *SHAPE_IN), jnp.float32))(k1)
    yr = jax.jit(lambda k: jax.random.normal(
        k, (batch, SHAPE_IN[0] * N_AUTO, *SHAPE_IN[1:]), jnp.float32))(k2)
    rollout = make_rollout_fn(bundle, IdentityNormalizer(), N_AUTO)
    t0 = time.time()
    pred, _, _ = rollout(variables, xr, yr, key)
    jax.block_until_ready(pred)
    compile_s = time.time() - t0
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_rep):
            pred, _, _ = rollout(variables, xr, yr, key)
            xr = xr + 0.0 * pred[:, : SHAPE_IN[0]]  # chain
        _ = float(np.asarray(jax.device_get(pred[0, 0, 0, 0, 0])))
        dt = (time.perf_counter() - t0) / n_rep
        rates.append(batch * N_AUTO * SHAPE_IN[0] / dt)
    rates.sort()
    return dict(batch=batch, frames_per_sec=round(rates[1], 1),
                spread=round((rates[-1] - rates[0]) / rates[1], 3),
                compile_s=round(compile_s, 1),
                ms_per_model_call=round(
                    1000.0 * batch * SHAPE_IN[0] * N_AUTO
                    / rates[1] / N_AUTO, 1))


def main():
    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [8, 16, 32, 64]
    for b in batches:
        # subprocess isolation: one async failure poisons the process
        import subprocess
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(b)],
            capture_output=True, text=True, timeout=2400)
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        print(lines[-1] if lines else json.dumps(
            dict(batch=b, error=(out.stderr or "?").strip()[-200:])),
            flush=True)


if __name__ == "__main__":
    if "--one" in sys.argv:
        b = int(sys.argv[sys.argv.index("--one") + 1])
        print(json.dumps(run_one(b)))
    else:
        main()
