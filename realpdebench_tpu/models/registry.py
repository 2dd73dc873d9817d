"""Model factory: name + config + probed data shapes → ModelBundle.

Reference counterpart: `realpdebench/model/load_model.py:4-161` — the factory
probes ``train_dataset[0]`` for input/output shapes and dispatches on
``model_name``. Same contract here; each entry returns a ModelBundle.
"""

from __future__ import annotations

import jax.numpy as jnp

from realpdebench_tpu.models.base import ModelBundle


def build_model(train_dataset=None, shapes=None, **kwargs) -> ModelBundle:
    """Build a ModelBundle.

    Either pass ``train_dataset`` (shapes probed from item 0, like
    load_model.py:7-10) or explicit ``shapes=(shape_in, shape_out)``.
    Remaining kwargs are the flat config namespace (YAML keys).
    """
    model_name = kwargs["model_name"]
    if shapes is None:
        x0, y0 = train_dataset[0]
        shape_in, shape_out = tuple(x0.shape), tuple(y0.shape)
    else:
        shape_in, shape_out = tuple(shapes[0]), tuple(shapes[1])

    compute_dtype = {
        None: jnp.float32,
        "float32": jnp.float32,
        "bfloat16": jnp.bfloat16,
    }[kwargs.get("compute_dtype")]

    if model_name == "fno":
        from realpdebench_tpu.models.fno import FNO3d

        use_pallas = kwargs.get("use_pallas")  # None → auto (TPU only)
        module = FNO3d(
            modes1=kwargs["modes1"],
            modes2=kwargs["modes2"],
            modes3=kwargs["modes3"],
            n_layers=kwargs["n_layers"],
            width=kwargs["width"],
            shape_in=shape_in,
            shape_out=shape_out,
            compute_dtype=compute_dtype,
            remat=bool(kwargs.get("remat", True)),
            use_pallas=None if use_pallas is None else bool(use_pallas),
            pallas_interpret=bool(kwargs.get("pallas_interpret", False)),
        )
        def _fno_loss(mod, variables, x, y, rng, train):
            # loss-in-module: lets the fused path engage the K3 tail+loss
            # kernel (ops/pallas/fno_tail.py) — the value equals the default
            # mse(pred, y) on every path (tests/test_pallas_fno_tail.py)
            if train:
                loss, new_state = mod.apply(
                    variables, x, y=y, train=True, mutable=["batch_stats"])
                return loss, new_state
            return mod.apply(variables, x, y=y, train=False), {}

        return ModelBundle(
            name="fno", module=module, mutable=("batch_stats",),
            needs_train_flag=True, loss_fn=_fno_loss,
        )

    if model_name == "deeponet":
        from realpdebench_tpu.models.deeponet import DeepONet

        module = DeepONet(
            shape_in=shape_in,
            shape_out=shape_out,
            p=kwargs["p"],
            dropout_rate=kwargs.get("dropout_rate", 0.0),
            compute_dtype=compute_dtype,
        )
        return ModelBundle(
            name="deeponet", module=module, mutable=("batch_stats",),
            needs_train_flag=True, stochastic=True,  # dropout rng
        )

    if model_name == "unet":
        from realpdebench_tpu.models.unet import Unet3d

        module = Unet3d(
            dim=shape_in[1],
            out_channels=shape_out[-1],
            dim_mults=tuple(kwargs["dim_mults"]),
            channels=shape_in[-1],
            in_time=shape_in[0],
            out_time=shape_out[0],
            compute_dtype=compute_dtype,
            remat=bool(kwargs.get("remat", True)),
        )
        return ModelBundle(
            name="unet", module=module, mutable=(), needs_train_flag=True,
        )

    if model_name == "transolver":
        from realpdebench_tpu.models.transolver import Transolver3d

        module = Transolver3d(
            space_dim=kwargs["space_dim"],
            n_layers=kwargs["n_layers"],
            n_hidden=kwargs["n_hidden"],
            n_head=kwargs["n_head"],
            H=kwargs["H"], W=kwargs["W"], D=kwargs["D"],
            fun_dim=kwargs["fun_dim"],
            out_dim=kwargs["out_dim"],
            ref=kwargs.get("ref", 8),
            mlp_ratio=kwargs.get("mlp_ratio", 1),
            slice_num=kwargs.get("slice_num", 32),
            unified_pos=bool(kwargs.get("unified_pos", False)),
            shape_in=shape_in,
            shape_out=shape_out,
            compute_dtype=compute_dtype,
            seq_mesh=kwargs.get("seq_mesh"),
        )
        return ModelBundle(
            name="transolver", module=module, mutable=(), needs_train_flag=True,
        )

    if model_name == "galerkin_transformer":
        from realpdebench_tpu.models.galerkin_transformer import (
            GalerkinTransformer3d,
        )

        module = GalerkinTransformer3d(
            shape_in=shape_in,
            shape_out=shape_out,
            n_hidden=kwargs.get("n_hidden", 96),
            num_encoder_layers=kwargs.get("num_encoder_layers", 4),
            n_head=kwargs.get("n_head", 4),
            dim_feedforward=kwargs.get("dim_feedforward", 192),
            attention_type=kwargs.get("attention_type", "galerkin"),
            layer_norm=bool(kwargs.get("layer_norm", False)),
            attn_norm=bool(kwargs.get("attn_norm", True)),
            norm_eps=float(kwargs.get("norm_eps", 1e-5)),
            modes1=kwargs.get("fourier_modes_x", 16),
            modes2=kwargs.get("fourier_modes_y", 20),
            modes3=kwargs.get("fourier_modes_t", 4),
            spectral_layers=kwargs.get("num_regressor_layers", 1),
            freq_dim=kwargs.get("freq_dim", 128),
            dropout=float(kwargs.get("encoder_dropout", 0.05) or 0.0),
            xavier_init=float(kwargs.get("xavier_init", 1e-2)),
            diagonal_weight=float(kwargs.get("diagonal_weight", 1e-2)),
            reference_eval_dropout=bool(
                kwargs.get("reference_eval_dropout", False)
            ),
            # sequence parallelism (tokens over mp) — a Mesh object threaded
            # by the caller (train/loop.py) when `seq_shard: true`; not a
            # YAML scalar
            seq_mesh=kwargs.get("seq_mesh"),
            compute_dtype=compute_dtype,
        )
        return ModelBundle(
            name="galerkin_transformer", module=module,
            mutable=("batch_stats",), needs_train_flag=True, stochastic=True,
        )

    if model_name == "mwt":
        from realpdebench_tpu.models.mwt import MWT3d

        module = MWT3d(
            ich=kwargs.get("ich", shape_in[-1]),
            k=kwargs.get("k", 3),
            alpha=kwargs.get("alpha", 8),
            c=kwargs.get("c", 3),
            nCZ=kwargs.get("nCZ", 4),
            L=kwargs.get("L", 0),
            base=kwargs.get("base", "legendre"),
            och=kwargs.get("och", shape_out[-1]),
            shape_in=shape_in,
            shape_out=shape_out,
            compute_dtype=compute_dtype,
        )
        return ModelBundle(
            name="mwt", module=module, mutable=("batch_stats",),
            needs_train_flag=True,
        )

    if model_name == "cno":
        from realpdebench_tpu.models.cno import CNO3d

        t_in, t_out = shape_in[0], shape_out[0]
        if t_out > t_in and t_out % t_in == 0:
            out_dim_mult = t_out // t_in
        elif t_out == t_in:
            out_dim_mult = 1
        else:
            raise ValueError(f"T_out {t_out} incompatible with T_in {t_in}")
        def _int(key, default):
            # reference YAMLs carry trailing commas ("N_res: 1," parses as a
            # string); the torch factory ignores those keys entirely — we
            # accept them when they are clean ints, else fall back to the
            # model defaults, matching effective reference behavior
            v = kwargs.get(key, default)
            try:
                return int(v)
            except (TypeError, ValueError):
                return default

        module = CNO3d(
            in_dim=shape_in[-1],
            out_dim=shape_out[-1],
            out_dim_mult=out_dim_mult,
            in_size=shape_in[2],
            N_layers=kwargs["N_layers"],
            N_res=_int("N_res", 1),
            N_res_neck=_int("N_res_neck", 6),
            channel_multiplier=_int("channel_multiplier", 32),
            latent_lift_proj_dim=_int("latent_lift_proj_dim", 64),
            activation=kwargs.get("activation", "LeakyReLU"),
            shape_in=shape_in,
            shape_out=shape_out,
            remat=bool(kwargs.get("remat", True)),
            compute_dtype=compute_dtype,
        )
        return ModelBundle(
            name="cno", module=module, mutable=("batch_stats",),
            needs_train_flag=True,
        )

    if model_name == "dpot":
        from realpdebench_tpu.models.dpot import DPOT

        module = DPOT(
            shape_in=shape_in,
            shape_out=shape_out,
            model_type=kwargs.get("model_type", "dpot"),
            img_size=kwargs["img_size"],
            in_channels=kwargs["in_channels"],
            out_channels=kwargs["out_channels"],
            in_timesteps=kwargs["in_timesteps"],
            out_timesteps=kwargs["out_timesteps"],
            patch_size=kwargs["patch_size"],
            embed_dim=kwargs["embed_dim"],
            depth=kwargs["depth"],
            n_blocks=kwargs["n_blocks"],
            modes=kwargs["modes"],
            mlp_ratio=kwargs["mlp_ratio"],
            out_layer_dim=kwargs["out_layer_dim"],
            normalize=bool(kwargs.get("normalize", False)),
            act=kwargs.get("act", "gelu"),
            time_agg=kwargs.get("time_agg", "exp_mlp"),
            n_cls=int(kwargs.get("n_cls", 1)),
            compute_dtype=compute_dtype,
            remat=bool(kwargs.get("remat", False)),
        )
        return ModelBundle(
            name="dpot", module=module, mutable=(), needs_train_flag=True,
        )

    if model_name == "wdno":
        from realpdebench_tpu.models.wdno import build_wdno_bundle

        kwargs = dict(kwargs)
        kwargs["_train_dataset"] = train_dataset  # for the wavelet rescaler
        kwargs["_compute_dtype"] = compute_dtype  # resolved jnp dtype
        return build_wdno_bundle(shape_in, shape_out, kwargs)

    if model_name == "dmd":
        from realpdebench_tpu.models.dmd import DMD

        return ModelBundle(
            name="dmd",
            module=DMD(
                n_modes=kwargs["n_modes"],
                n_predict=kwargs["n_predict"],
                input_feature=kwargs["input_feature"],
                n_autoregressive=kwargs["N_autoregressive"],
                shape_out=shape_out,
            ),
            trainable=False,
            needs_train_flag=False,
        )

    raise ValueError(f"Model {model_name} not supported")
