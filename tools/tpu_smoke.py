"""TPU smoke matrix: one train step + one predict per model family on the
real chip at tiny shapes. Catches backend-specific lowering gaps (e.g. the
erf hang) that CPU tests cannot see.

Usage: python -m realpdebench_tpu.tools.tpu_smoke  (from repo root: python tools/tpu_smoke.py)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SH_IN = (4, 16, 16, 3)
SH_OUT = (4, 16, 16, 3)

MODELS = {
    "fno": dict(model_name="fno", modes1=2, modes2=3, modes3=3, n_layers=2,
                width=8),
    "deeponet": dict(model_name="deeponet", p=16, dropout_rate=0.1),
    "unet": dict(model_name="unet", dim_mults=[1, 2]),
    "cno": dict(model_name="cno", N_layers=2, N_res=1, N_res_neck=1,
                channel_multiplier=8, latent_lift_proj_dim=8,
                activation="LeakyReLU"),
    "mwt": dict(model_name="mwt", k=3, alpha=2, c=1, nCZ=1, L=0,
                base="legendre"),
    "galerkin_transformer": dict(
        model_name="galerkin_transformer", n_hidden=16, num_encoder_layers=1,
        n_head=2, dim_feedforward=16, fourier_modes_x=3, fourier_modes_y=3,
        fourier_modes_t=2, num_regressor_layers=1, freq_dim=8,
        encoder_dropout=0.0),
    "transolver": dict(model_name="transolver", space_dim=3, n_layers=1,
                       n_hidden=16, n_head=2, H=16, W=16, D=4, fun_dim=0,
                       out_dim=3, ref=4, dropout=0.0, act="gelu", mlp_ratio=1,
                       slice_num=8),
    "dpot": dict(model_name="dpot", img_size=16, in_channels=4, out_channels=4,
                 in_timesteps=4, out_timesteps=4, patch_size=4, embed_dim=16,
                 depth=1, n_blocks=4, modes=4, mlp_ratio=1, out_layer_dim=8,
                 normalize=False, act="gelu", time_agg="exp_mlp", n_cls=1),
    "wdno": dict(model_name="wdno", dim=8, dim_mults=[1, 2],
                 wave_type="bior1.1", pad_mode="zero", beta_schedule="sigmoid",
                 timesteps=8, sampling_timesteps=2, ddim_sampling_eta=1.0),
}


def run_one(name: str):
    """Run a single model's smoke entry (used in subprocess isolation)."""
    from realpdebench_tpu.config import Config
    from realpdebench_tpu.data.normalizer import IdentityNormalizer
    from realpdebench_tpu.models.registry import build_model
    from realpdebench_tpu.train.train_step import (
        TrainState, build_optimizer, make_train_step,
    )

    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, (4, *SH_IN), jnp.float32))(key)
    y = jax.jit(lambda k: jax.random.normal(k, (4, *SH_OUT), jnp.float32))(key)

    if name == "dmd":
        bundle = build_model(shapes=(SH_IN, SH_OUT), model_name="dmd",
                             n_modes=3, n_predict=4, input_feature=2,
                             N_autoregressive=1)
        pred = bundle.predict({"params": {}}, np.asarray(jax.device_get(x)))
        ok = np.isfinite(pred).all()
        return ("OK" if ok else "NONFINITE", 0.0, float(pred.sum()))

    kw = MODELS[name]
    t0 = time.time()
    if True:
        try:
            bundle = build_model(shapes=(SH_IN, SH_OUT), **kw)
            v = bundle.init(jax.random.PRNGKey(0),
                            np.zeros((1, *SH_IN), np.float32))
            p, ms = bundle.split_variables(v)
            cfg = Config(lr=1e-3, scheduler="cosine", num_update=4,
                         clip_grad_norm=0.0)
            state = TrainState.create(p, ms, build_optimizer(cfg))
            state = jax.device_put(state, jax.devices()[0])
            step = make_train_step(bundle, IdentityNormalizer())
            state, loss = step(state, x, y, key)
            state, loss = step(state, x, y, key)
            lv = float(np.asarray(jax.device_get(loss)))
            pred = bundle.predict(
                {"params": state.params, **state.model_state}, x, rng=key
            )
            jax.block_until_ready(pred)
            pv = float(np.asarray(jnp.sum(pred)))
            ok = np.isfinite(lv) and np.isfinite(pv)
            return ("OK" if ok else "NONFINITE",
                    round(time.time() - t0, 1), lv)
        except Exception as e:
            traceback.print_exc()
            return ("FAIL", round(time.time() - t0, 1),
                    f"{type(e).__name__}: {str(e)[:60]}")


def main(only=None):
    """Each model runs in its own subprocess: an async backend failure on
    this runtime poisons every later dispatch in the process, so in-process
    iteration turns one failure into a full-matrix cascade."""
    import subprocess

    names = list(MODELS) + ["dmd"]
    if only:
        names = [n for n in names if n in only]
    results = {}
    for name in names:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--model", name],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if line:
            results[name] = eval(line[-1][7:])  # trusted: our own subprocess
        else:
            tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
            results[name] = ("FAIL", round(time.time() - t0, 1),
                             " | ".join(tail)[:120])
        print(f"{name:24s} {results[name]}", flush=True)

    n_ok = sum(1 for r in results.values() if r[0] == "OK")
    print(f"\n{n_ok}/{len(results)} models OK on "
          f"{jax.devices()[0].platform}", flush=True)
    return results


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated subset for the matrix run")
    a = ap.parse_args()
    if a.model:
        print("RESULT", run_one(a.model), flush=True)
    else:
        main(only=a.only.split(",") if a.only else None)
