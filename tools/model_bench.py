"""Per-model train-step throughput on the real chip at reference scale.

VERDICT round-1 item 2: measure every trainable family at its reference
cylinder configuration (configs/cylinder/*.yaml batch sizes and model
hyperparameters) and record steps/s/chip in MODEL_BENCH.md.

Method notes (hard-won on this runtime):
  * each model runs in a SUBPROCESS — one async failure poisons the host
    process (NOTES.md gotcha 9);
  * timing barrier is a device_get of the loss scalar — block_until_ready
    can return before the async dispatch queue drains on this runtime;
  * batches are synthesized on device (the host link is a slow tunnel).

Usage:
    python tools/model_bench.py [model ...]      # default: all
    python tools/model_bench.py --write-md       # also rewrite MODEL_BENCH.md
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SH = (20, 64, 128, 3)  # cylinder window (T, H, W, C)

# Reference-scale settings: model kwargs from configs/cylinder/*.yaml,
# batch = the reference train_batch_size, accum chosen so activations fit
# one 16 GB v5e chip (documented deviation: ghost-batch BN under accum).
MODELS = {
    "fno": dict(
        kw=dict(model_name="fno", modes1=4, modes2=12, modes3=16, n_layers=4,
                width=64, compute_dtype="bfloat16", remat=False),
        # accum=1 fits HBM since the round-4 traffic cut (bf16 packed
        # spectra) and kills the 13.5 ms/step grad-accum weight adds
        # (+2.9% measured; bench_results/r4/ab_experiments.jsonl) — matches
        # bench.py's headline config
        batch=32, accum=1),
    "deeponet": dict(
        kw=dict(model_name="deeponet", p=128, dropout_rate=0.1,
                compute_dtype="bfloat16"),
        batch=32, accum=2),  # f32 accum=1 exceeds 16G HBM (17.4G peak)
    "unet": dict(
        kw=dict(model_name="unet", dim_mults=[1, 2, 4],
                compute_dtype="bfloat16", remat=False),
        # remat off: bf16 + the fused temporal-attention kernel fit bs12
        # accum4 without block replay (0.351 -> 0.462 steps/s on chip).
        # accum=3 (microbatch 4): removes the B=3->4 sublane-pad third on
        # every {4,0,3,2,1:T(4,128)(2,1)} activation — 0.499 -> 0.632
        # steps/s measured (bench_results/r4/ab_experiments.jsonl)
        batch=12, accum=3),
    "cno": dict(
        kw=dict(model_name="cno", N_layers=3, N_res=1, N_res_neck=8,
                channel_multiplier=32, latent_lift_proj_dim=64,
                activation="LeakyReLU", compute_dtype="bfloat16"),
        batch=16, accum=4),
    "mwt": dict(
        kw=dict(model_name="mwt", k=3, alpha=5, c=4, nCZ=4, base="legendre",
                L=0, compute_dtype="bfloat16"),
        batch=32, accum=4),
    "galerkin_transformer": dict(
        kw=dict(model_name="galerkin_transformer", n_hidden=256,
                num_encoder_layers=1, n_head=4, dim_feedforward=256,
                fourier_modes_x=16, fourier_modes_y=20, fourier_modes_t=4,
                num_regressor_layers=1, freq_dim=128, encoder_dropout=0.05,
                compute_dtype="bfloat16"),
        batch=16, accum=4),  # cylinder yaml: 1 encoder + 1 regressor layer
    "transolver": dict(
        kw=dict(model_name="transolver", space_dim=3, n_layers=1,
                n_hidden=256, n_head=8, H=128, W=64, D=20, fun_dim=0,
                out_dim=3, ref=4, dropout=0.1, act="gelu", mlp_ratio=4,
                slice_num=16, compute_dtype="bfloat16"),
        # mlp_ratio 4 (cylinder yaml): the 1024-wide MLP over 164k tokens
        # needs microbatch 2 to fit alongside params/opt state
        batch=16, accum=8),
    "dpot": dict(
        kw=dict(model_name="dpot", img_size=128, in_channels=4,
                out_channels=4, in_timesteps=20, out_timesteps=20,
                patch_size=8, embed_dim=1024, depth=6, n_blocks=8, modes=32,
                mlp_ratio=1, out_layer_dim=32, normalize=False, act="gelu",
                time_agg="exp_mlp", n_cls=1, compute_dtype="bfloat16"),
        batch=16, accum=8),
    # the reference also trains the Large backbone (configs/cylinder/
    # dpot_l.yaml: 1536-dim, depth 24, mlp_ratio 4, out_layer_dim 1536)
    "dpot_l": dict(
        kw=dict(model_name="dpot", img_size=128, in_channels=4,
                out_channels=4, in_timesteps=20, out_timesteps=20,
                patch_size=8, embed_dim=1536, depth=24, n_blocks=16, modes=32,
                mlp_ratio=4, out_layer_dim=1536, normalize=False, act="gelu",
                time_agg="exp_mlp", n_cls=1, compute_dtype="bfloat16",
                remat=True),
        # 673M params: f32 param+adam(m,v)+accum-grad state is ~10.8G; the
        # out_layer head materializes [B,20,64,128,1536] activations
        # (~1 GB/sample bf16), so microbatch 1 + block remat on a 16G chip
        batch=16, accum=16),
    "wdno": dict(
        kw=dict(model_name="wdno", dim=256, dim_mults=[1, 2],
                wave_type="bior1.1", pad_mode="zero", beta_schedule="sigmoid",
                timesteps=1000, sampling_timesteps=10, ddim_sampling_eta=1.0,
                compute_dtype="bfloat16"),
        batch=16, accum=8),
}


def run_one(name: str, n_steps: int = 8) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realpdebench_tpu.config import Config
    from realpdebench_tpu.data.normalizer import IdentityNormalizer
    from realpdebench_tpu.models.registry import build_model
    from realpdebench_tpu.train.train_step import (
        TrainState, build_optimizer, make_train_step,
    )

    spec = MODELS[name]
    bs, accum = spec["batch"], spec["accum"]
    # one-off experiment overrides (committed table always uses the specs)
    if os.environ.get("REALPDEBENCH_BENCH_ACCUM"):
        accum = int(os.environ["REALPDEBENCH_BENCH_ACCUM"])
    if os.environ.get("REALPDEBENCH_BENCH_KW"):
        spec = dict(spec, kw={**spec["kw"],
                              **json.loads(os.environ["REALPDEBENCH_BENCH_KW"])})
    key = jax.random.PRNGKey(0)
    kx, ky, key = jax.random.split(key, 3)
    x = jax.jit(lambda k: 0.3 * jax.random.normal(
        k, (bs, *SH), jnp.float32))(kx)
    y = jax.jit(lambda k: 0.3 * jax.random.normal(
        k, (bs, *SH), jnp.float32))(ky)

    bundle = build_model(shapes=(SH, SH), **spec["kw"])
    v = bundle.init(jax.random.PRNGKey(0), np.zeros((1, *SH), np.float32))
    params, ms = bundle.split_variables(v)
    n_params = bundle.param_count(v)
    cfg = Config(lr=1e-4, scheduler="cosine", num_update=4000)
    state = TrainState.create(params, ms, build_optimizer(cfg))
    step = make_train_step(bundle, IdentityNormalizer(), grad_accum=accum)

    t0 = time.time()
    state, loss = step(state, x, y, key)
    _ = float(np.asarray(jax.device_get(loss)))
    compile_s = time.time() - t0

    # calibration window → size timed windows to ≥2 s of device work each,
    # so the per-window loss-fetch barrier (slow tunnel) cannot dominate the
    # measurement for fast models (dpot at ~40 ms/step needs ~50 steps)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        state, loss = step(state, x, y, k)
    _ = float(np.asarray(jax.device_get(loss)))
    est_rate = n_steps / (time.perf_counter() - t0)
    n_steps = max(n_steps, min(128, int(2.0 * est_rate)))

    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            state, loss = step(state, x, y, k)
        _ = float(np.asarray(jax.device_get(loss)))
        rates.append(n_steps / (time.perf_counter() - t0))
    rates.sort()

    # optional rollout (serving-path) throughput: frames/s over the jitted
    # N_autoregressive=10 scan at eval batch 8 (the headline bench's
    # measured-best point) — REALPDEBENCH_BENCH_ROLLOUT=1 opts in (adds a
    # second multi-minute compile per family through the tunnel)
    rollout_fps = None
    if os.environ.get("REALPDEBENCH_BENCH_ROLLOUT") == "1":
        from realpdebench_tpu.eval.rollout import make_rollout_fn

        n_auto, eb = 10, 8
        ev = {"params": state.params, **state.model_state}
        kx2, ky2, key = jax.random.split(key, 3)
        xr = jax.jit(lambda k: jax.random.normal(
            k, (eb, *SH), jnp.float32))(kx2)
        yr = jax.jit(lambda k: jax.random.normal(
            k, (eb, SH[0] * n_auto, *SH[1:]), jnp.float32))(ky2)
        rollout = make_rollout_fn(bundle, IdentityNormalizer(), n_auto)
        pred, _, _ = rollout(ev, xr, yr, key)
        jax.block_until_ready(pred)
        t0 = time.perf_counter()
        for _ in range(3):
            pred, _, _ = rollout(ev, xr, yr, key)
            xr = xr + 0.0 * pred[:, : SH[0]]  # chain (async runtimes)
        _ = float(np.asarray(jax.device_get(pred[0, 0, 0, 0, 0])))
        rollout_fps = eb * n_auto * SH[0] / ((time.perf_counter() - t0) / 3)

    # FLOPs/MFU are NOT computed here: XLA cost_analysis on the fused TPU
    # program (a) cannot see Pallas custom-call FLOPs and (b) counts the
    # grad-accum `lax.scan` body once, not ×trip-count — both silently
    # undercount (fno showed 0.16 TFLOP/step vs ~3.7 real). main() merges
    # the true count from a CPU-side `--flops` subprocess instead.
    return dict(
        model=name, batch=bs, grad_accum=accum,
        steps_per_sec=round(rates[1], 3),
        ms_per_step=round(1000.0 / rates[1], 1),
        compile_s=round(compile_s, 1), n_params=int(n_params),
        spread=round((rates[-1] - rates[0]) / rates[1], 3),
        rollout_frames_per_sec=(round(rollout_fps, 1) if rollout_fps
                                else None),
    )


def run_flops(name: str) -> dict:
    """Executed FLOPs for one family's full train step (all microbatches).

    Method: build the UNFUSED (pure-XLA) variant of the same model at
    grad_accum=1 (full batch in one pass — arithmetically the same work the
    accumulated step executes, but visible to the cost model because there
    is no scan to hide behind), lower it abstractly, and compile for CPU.
    Pallas custom-calls are invisible to XLA's HloCostAnalysis and a scan
    body is counted once regardless of trip count, so analysing the fused
    TPU program undercounts by >20x for fno. Run under JAX_PLATFORMS=cpu.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")  # before any device query
    import jax.numpy as jnp

    from realpdebench_tpu.config import Config
    from realpdebench_tpu.data.normalizer import IdentityNormalizer
    from realpdebench_tpu.models.registry import build_model
    from realpdebench_tpu.train.train_step import (
        TrainState, build_optimizer, make_train_step,
    )

    spec = MODELS[name]
    bs = spec["batch"]
    kw = dict(spec["kw"])
    if kw.get("model_name") in ("fno", "unet"):
        kw["use_pallas"] = False  # count the work the Pallas kernels do
    bundle = build_model(shapes=(SH, SH), **kw)
    key = jax.random.PRNGKey(0)
    x_abs = jax.ShapeDtypeStruct((bs, *SH), jnp.float32)
    v_abs = jax.eval_shape(
        bundle.init, key, jax.ShapeDtypeStruct((1, *SH), jnp.float32))
    params_abs, ms_abs = bundle.split_variables(v_abs)
    tx = build_optimizer(Config(lr=1e-4, scheduler="cosine", num_update=4000))
    state_abs = jax.eval_shape(
        lambda p, ms: TrainState.create(p, ms, tx), params_abs, ms_abs)
    step = make_train_step(bundle, IdentityNormalizer(), grad_accum=1)
    ca = step.lower(state_abs, x_abs, x_abs, key).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return dict(model=name, flops_per_step=float(ca.get("flops", 0.0)))


def fetch_flops(name: str, timeout: int = 1800) -> float | None:
    """Run the `--flops` pass in a CPU subprocess; None on any failure."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flops", name],
            capture_output=True, text=True, timeout=timeout, env=env)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if line:
            return float(json.loads(line[-1])["flops_per_step"]) or None
    except Exception:
        pass
    return None


def rewrite_from_log(path: str) -> None:
    """Rebuild MODEL_BENCH.md from a sweep log's JSON lines (last record
    per family wins), filling in tflops/mfu via the CPU `--flops` pass
    where a record predates it — lets the table be corrected without
    burning another full chip sweep."""
    by_name = {}
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if ln.startswith("{"):
                try:
                    r = json.loads(ln)
                except json.JSONDecodeError:
                    continue
                if "model" in r:
                    by_name[r["model"]] = r
    results = []
    for name in MODELS:
        if name not in by_name:
            continue
        r = by_name[name]
        if "error" not in r and not r.get("mfu"):
            flops = fetch_flops(name)
            if flops:
                r["tflops_per_step"] = round(flops / 1e12, 2)
                r["mfu"] = round(r["steps_per_sec"] * flops / 197e12, 4)
        results.append(r)
    write_table(results)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    write_md = "--write-md" in sys.argv
    names = args or list(MODELS)
    results = []
    for name in names:
        cmd = [sys.executable, os.path.abspath(__file__), "--one", name]
        env = dict(os.environ)
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=2400, env=env)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            if line:
                res = json.loads(line[-1])
            else:
                lines = (out.stderr or out.stdout).strip().splitlines()
                # JAX appends its traceback-filtering notice AFTER the
                # exception line; scan backwards for the real error.
                exc = next(
                    (ln for ln in reversed(lines)
                     if re.search(r"(Error|Exception|Exhausted)", ln)),
                    " | ".join(lines[-4:]),
                )
                res = dict(model=name, error=exc.strip()[-300:],
                           stderr_tail=" | ".join(lines[-12:])[-1200:])
        except subprocess.TimeoutExpired:
            res = dict(model=name, error="timeout")
        if "error" not in res:
            flops = fetch_flops(name)
            if flops:
                res["tflops_per_step"] = round(flops / 1e12, 2)
                res["mfu"] = round(
                    res["steps_per_sec"] * flops / 197e12, 4)
        results.append(res)
        print(json.dumps(res))
    if write_md:
        write_table(results)
    return results


def write_table(results):
    # stamp provenance so the record cannot silently rot (VERDICT r3 item 9):
    # the sweep date + code revision are part of the committed table
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))).stdout.strip() or "unknown"
    except Exception:
        rev = "unknown"
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    lines = [
        "# MODEL_BENCH — train steps/s/chip at reference cylinder scale",
        "",
        f"Generated {stamp} at commit {rev} by `tools/model_bench.py "
        "--write-md` (regenerate with the same command; `--from-log` "
        "rebuilds from a sweep log).",
        "",
        "Measured by `tools/model_bench.py` on one TPU v5e chip; device-",
        "synthesized batches; batch sizes from `configs/cylinder/*.yaml`;",
        "`grad_accum` chosen to fit 16 GB HBM (ghost-batch BN deviation",
        "documented in train/train_step.py). Median of 3 windows, loss-fetch",
        "barrier per window.",
        "",
        "| model | batch | accum | steps/s/chip | ms/step | params | "
        "TFLOP/step | MFU | spread |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in results:
        if "error" in r:
            lines.append(f"| {r['model']} | - | - | ERROR | - | - | - | - | "
                         f"{r['error'][:80]} |")
        else:
            tf = r.get("tflops_per_step")
            mfu = r.get("mfu")
            lines.append(
                f"| {r['model']} | {r['batch']} | {r['grad_accum']} | "
                f"{r['steps_per_sec']} | {r['ms_per_step']} | "
                f"{r['n_params']:,} | {tf if tf else '-'} | "
                f"{f'{mfu:.1%}' if mfu else '-'} | {r['spread']} |")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MODEL_BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    if "--one" in sys.argv:
        name = sys.argv[sys.argv.index("--one") + 1]
        print(json.dumps(run_one(name)))
    elif "--flops" in sys.argv:
        name = sys.argv[sys.argv.index("--flops") + 1]
        print(json.dumps(run_flops(name)))
    elif "--from-log" in sys.argv:
        rewrite_from_log(sys.argv[sys.argv.index("--from-log") + 1])
    else:
        main()
