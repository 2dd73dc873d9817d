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


def main():
    from realpdebench_tpu.config import Config
    from realpdebench_tpu.data.normalizer import IdentityNormalizer
    from realpdebench_tpu.models.registry import build_model
    from realpdebench_tpu.train.train_step import (
        TrainState, build_optimizer, make_train_step,
    )

    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, (4, *SH_IN), jnp.float32))(key)
    y = jax.jit(lambda k: jax.random.normal(k, (4, *SH_OUT), jnp.float32))(key)
    results = {}
    for name, kw in MODELS.items():
        t0 = time.time()
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
            results[name] = (
                "OK" if ok else "NONFINITE",
                round(time.time() - t0, 1), lv,
            )
        except Exception as e:
            results[name] = ("FAIL", round(time.time() - t0, 1),
                             f"{type(e).__name__}: {str(e)[:60]}")
            traceback.print_exc()
        print(f"{name:24s} {results[name]}", flush=True)

    # DMD (host-side)
    try:
        bundle = build_model(shapes=(SH_IN, SH_OUT), model_name="dmd",
                             n_modes=3, n_predict=4, input_feature=2,
                             N_autoregressive=1)
        pred = bundle.predict({"params": {}}, np.asarray(x))
        results["dmd"] = ("OK" if np.isfinite(pred).all() else "NONFINITE",
                          0.0, float(pred.sum()))
    except Exception as e:
        results["dmd"] = ("FAIL", 0.0, str(e)[:60])
    print(f"{'dmd':24s} {results['dmd']}", flush=True)

    n_ok = sum(1 for r in results.values() if r[0] == "OK")
    print(f"\n{n_ok}/{len(results)} models OK on "
          f"{jax.devices()[0].platform}", flush=True)
    return results


if __name__ == "__main__":
    main()
