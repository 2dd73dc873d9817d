"""JAX → torch checkpoint export — the inverse of ``torch_convert``.

Closes the interop loop: models trained in this framework become reference
`.pth` checkpoints (the on-disk format of `train.py:410-418`), loadable by
the reference's `Model.load_checkpoint` (`model/model.py:14-26`) — e.g. for
leaderboard submission or cross-validation in the torch ecosystem.

Every family's exporter is the exact inverse of its converter in
`torch_convert.py`; `tests/test_torch_export.py` enforces this by
round-tripping random params through export → convert and asserting
tree-equality, plus (when the reference repo is mounted) loading the
exported dict into the real torch module and checking forward parity.

Conventions inverted here:
  * flax Dense kernel (in, out) → torch Linear weight (out, in)
  * flax Conv kernel (*K, I, O) → torch ConvNd weight (O, I, *K)
  * flax ConvTranspose (transpose_kernel=True) kernel (*K, O, I) →
    torch ConvTransposeNd weight (I, O, *K)
  * (w_real, w_imag) corner stacks → complex64 ``weights{1..4}``
  * batch_stats → BN ``running_mean/running_var`` (+ the int64
    ``num_batches_tracked`` counter torch state dicts always carry)
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

_EXPORTERS: Dict[str, Callable] = {}


def register_exporter(name):
    def deco(fn):
        _EXPORTERS[name] = fn
        return fn

    return deco


def export_torch_state_dict(bundle, params, model_state) -> dict:
    """flax (params, model_state) → reference torch state dict (numpy)."""
    if bundle.name not in _EXPORTERS:
        raise NotImplementedError(
            f"No torch exporter registered for model '{bundle.name}'"
        )
    params = _np_tree(params)
    model_state = _np_tree(model_state or {})
    return _EXPORTERS[bundle.name](params, model_state, bundle=bundle)


def save_torch_checkpoint(path: str, bundle, params, model_state,
                          iteration: int = 0, **extras):
    """Write the reference on-disk checkpoint dict (train.py:410-418)."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state_dict(bundle, params, model_state).items()
    }
    ckpt = {"model_state_dict": sd, "iteration": iteration, **extras}
    torch.save(ckpt, path)
    return path


def _np_tree(t):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), t)


# --- inverse primitive helpers (mirror torch_convert.py:65-95) -------------


def _x_dense(out, tkey, p):
    out[f"{tkey}.weight"] = np.ascontiguousarray(p["kernel"].T)
    if "bias" in p:
        out[f"{tkey}.bias"] = p["bias"]


def _x_conv(out, tkey, p):
    """flax (*K, I, O) → torch (O, I, *K); same perm inverts the
    ConvTranspose (*K, O, I) → (I, O, *K) layout."""
    w = p["kernel"]
    n = w.ndim
    perm = (n - 1, n - 2) + tuple(range(n - 2))
    out[f"{tkey}.weight"] = np.ascontiguousarray(w.transpose(perm))
    if "bias" in p:
        out[f"{tkey}.bias"] = p["bias"]


_x_conv_transpose = _x_conv


def _x_norm(out, tkey, p):
    out[f"{tkey}.weight"] = p["scale"]
    out[f"{tkey}.bias"] = p["bias"]


def _x_bn_stats(out, tkey, b):
    out[f"{tkey}.running_mean"] = b["mean"]
    out[f"{tkey}.running_var"] = b["var"]
    out[f"{tkey}.num_batches_tracked"] = np.asarray(0, np.int64)


def _x_spectral(out, prefix, p):
    """(w_real, w_imag) channels-minor [4, m1, m2, m3, Ci, Co] → torch
    complex weights{1..4} [Ci, Co, m1, m2, m3]."""
    w = p["w_real"].astype(np.complex64) + 1j * p["w_imag"].astype(
        np.complex64)
    w = w.transpose(0, 4, 5, 1, 2, 3)
    for k in range(4):
        out[f"{prefix}{k + 1}"] = np.ascontiguousarray(w[k])


def _x_pointwise(out, tkey, p):
    """flax [Ci, Co] kernel → torch Conv3d 1x1x1 weight [Co, Ci, 1, 1, 1]."""
    out[f"{tkey}.weight"] = np.ascontiguousarray(
        p["kernel"].T)[:, :, None, None, None]
    out[f"{tkey}.bias"] = p["bias"]


# --- families ---------------------------------------------------------------


@register_exporter("fno")
def export_fno(params, model_state, bundle=None):
    sd = {}
    for k in ("fc0", "fc1", "fc2"):
        _x_dense(sd, k, params[k])
    bs = model_state.get("batch_stats", {})
    i = 0
    while f"layer_{i}" in params:
        lp = params[f"layer_{i}"]
        _x_spectral(sd, f"spectral_convs.{i}.weights", lp["spectral"])
        _x_pointwise(sd, f"convs.{i}", lp["pointwise"])
        _x_norm(sd, f"bns.{i}", lp["bn"])
        _x_bn_stats(sd, f"bns.{i}", bs[f"layer_{i}"]["bn"])
        i += 1
    return sd


@register_exporter("deeponet")
def export_deeponet(params, model_state, bundle=None):
    sd = {}
    br = params["branch"]
    bs = model_state.get("batch_stats", {}).get("branch", {})
    for i, stage in enumerate(("conv1", "conv2", "conv3", "conv4")):
        _x_conv(sd, f"branch.{stage}.0", br[f"Conv_{i}"])
        _x_norm(sd, f"branch.{stage}.1", br[f"BatchNorm_{i}"])
        _x_bn_stats(sd, f"branch.{stage}.1", bs[f"BatchNorm_{i}"])
    # inverse of the channels-last flatten permutation (torch_convert.py:295)
    k0 = br["Dense_0"]["kernel"]            # [S*C, out] with C = 256
    cdim = 256
    spatial = k0.shape[0] // cdim
    w0 = k0.T.reshape(k0.shape[1], spatial, cdim)
    sd["branch.fc.0.weight"] = np.ascontiguousarray(
        w0.transpose(0, 2, 1)).reshape(k0.shape[1], -1)
    sd["branch.fc.0.bias"] = br["Dense_0"]["bias"]
    _x_dense(sd, "branch.fc.3", br["Dense_1"])
    for i, dst in enumerate(("trunk.fc.0", "trunk.fc.2", "trunk.fc.4")):
        _x_dense(sd, dst, params["trunk"][f"Dense_{i}"])
    for src, dst in (("out_fc1", "output_net.0"), ("out_fc2", "output_net.3"),
                     ("out_fc3", "output_net.6")):
        _x_dense(sd, dst, params[src])
    return sd


@register_exporter("dpot")
def export_dpot(params, model_state, bundle=None):
    """Emits the reference *wrapper* checkpoint layout ('dpot_model.' prefix,
    dpot.py:336-346)."""
    if bundle is not None and getattr(bundle.module, "model_type",
                                      "dpot") == "dpot3d":
        raise NotImplementedError(
            "dpot3d is this framework's volumetric extension — the reference "
            "has no working 3-D DPOT to load a .pth into (see models/dpot.py "
            "docstring); use orbax checkpoints for dpot3d models")
    net = params["dpot_model"]
    sd = {}
    sd["pos_embed"] = np.ascontiguousarray(
        net["pos_embed"].transpose(0, 3, 1, 2))
    _x_conv(sd, "patch_embed.proj.0", net["patch_proj1"])
    _x_conv(sd, "patch_embed.proj.2", net["patch_proj2"])
    sd["time_agg_layer.w"] = net["time_agg_w"]
    if "time_agg_gamma" in net:
        sd["time_agg_layer.gamma"] = net["time_agg_gamma"]
    if "scale_feats_mu" in net:
        _x_dense(sd, "scale_feats_mu", net["scale_feats_mu"])
        _x_dense(sd, "scale_feats_sigma", net["scale_feats_sigma"])
    i = 0
    while f"block_{i}" in net:
        blk = net[f"block_{i}"]
        pre = f"blocks.{i}"
        _x_norm(sd, f"{pre}.norm1", blk["norm1"])
        _x_norm(sd, f"{pre}.norm2", blk["norm2"])
        for w in ("w1", "b1", "w2", "b2"):
            sd[f"{pre}.filter.{w}"] = blk["filter"][w]
        _x_conv(sd, f"{pre}.mlp.0", blk["mlp1"])
        _x_conv(sd, f"{pre}.mlp.2", blk["mlp2"])
        i += 1
    for src, dst in (("cls1", "cls_head.0"), ("cls2", "cls_head.2"),
                     ("cls3", "cls_head.4")):
        _x_dense(sd, dst, net[src])
    _x_conv_transpose(sd, "out_layer.0", net["out_deconv"])
    _x_conv(sd, "out_layer.2", net["out_conv1"])
    _x_conv(sd, "out_layer.4", net["out_conv2"])
    return {f"dpot_model.{k}": v for k, v in sd.items()}


@register_exporter("transolver")
def export_transolver(params, model_state, bundle=None):
    sd = {"placeholder": params["placeholder"]}
    _x_dense(sd, "preprocess.linear_pre.0", params["preprocess"]["Dense_0"])
    _x_dense(sd, "preprocess.linear_post", params["preprocess"]["Dense_1"])
    i = 0
    while f"block_{i}" in params:
        blk = params[f"block_{i}"]
        pre = f"blocks.{i}"
        for ln in ("ln_1", "ln_2", "ln_3"):
            if ln in blk:
                sd[f"{pre}.{ln}.weight"] = blk[ln]["scale"]
                sd[f"{pre}.{ln}.bias"] = blk[ln]["bias"]
        attn = blk["attn"]
        sd[f"{pre}.Attn.temperature"] = attn["temperature"]
        for conv in ("in_project_fx", "in_project_x"):
            _x_conv(sd, f"{pre}.Attn.{conv}", attn[conv])
        _x_dense(sd, f"{pre}.Attn.in_project_slice", attn["in_project_slice"])
        for qkv in ("to_q", "to_k", "to_v"):
            _x_dense(sd, f"{pre}.Attn.{qkv}", attn[qkv])
        _x_dense(sd, f"{pre}.Attn.to_out.0", attn["to_out"])
        _x_dense(sd, f"{pre}.mlp.linear_pre.0", blk["mlp"]["Dense_0"])
        _x_dense(sd, f"{pre}.mlp.linear_post", blk["mlp"]["Dense_1"])
        if "mlp2" in blk:
            _x_dense(sd, f"{pre}.mlp2", blk["mlp2"])
        i += 1
    return sd


@register_exporter("galerkin_transformer")
def export_galerkin(params, model_state, bundle=None):
    sd = {}
    sd["downscaler.id.weight"] = np.ascontiguousarray(
        params["downscaler"]["kernel"].T)
    sd["downscaler.id.bias"] = params["downscaler"]["bias"]
    i = 0
    while f"encoder_{i}" in params:
        enc = params[f"encoder_{i}"]
        pre = f"encoder_layers.{i}"
        for src, dst in (("q", 0), ("k", 1), ("v", 2)):
            _x_dense(sd, f"{pre}.attn.linears.{dst}", enc["attn"][src])
        for which in ("K", "V"):
            nrm = enc["attn"][f"norm_{which}"]
            for h in range(nrm["scale"].shape[0]):
                sd[f"{pre}.attn.norm_{which}.{h}.weight"] = nrm["scale"][h]
                sd[f"{pre}.attn.norm_{which}.{h}.bias"] = nrm["bias"][h]
        _x_dense(sd, f"{pre}.ff.lr1", enc["ff1"])
        _x_dense(sd, f"{pre}.ff.lr2", enc["ff2"])
        for ln in ("layer_norm1", "layer_norm2"):
            if ln in enc:
                sd[f"{pre}.{ln}.weight"] = enc[ln]["scale"]
                sd[f"{pre}.{ln}.bias"] = enc[ln]["bias"]
        i += 1
    reg = params["regressor"]
    bs = model_state.get("batch_stats", {}).get("regressor", {})
    _x_dense(sd, "regressor.fc", reg["fc"])
    i = 0
    while f"spectral_{i}" in reg:
        _x_spectral(sd, f"regressor.spectral_conv.{i}.weights",
                    reg[f"spectral_{i}"])
        _x_pointwise(sd, f"regressor.convs.{i}", reg[f"pointwise_{i}"])
        _x_norm(sd, f"regressor.bns.{i}", reg[f"bn_{i}"])
        _x_bn_stats(sd, f"regressor.bns.{i}", bs[f"bn_{i}"])
        i += 1
    _x_dense(sd, "regressor.regressor1", reg["regressor1"])
    _x_dense(sd, "regressor.regressor2", reg["regressor2"])
    return sd


@register_exporter("mwt")
def export_mwt(params, model_state, bundle=None):
    sd = {}
    for k in ("Lk", "Lc0", "Lc1"):
        _x_dense(sd, k, params[k])
    i = 0
    while f"cz_{i}" in params:
        cz = params[f"cz_{i}"]
        pre = f"MWT_CZ.{i}"
        _x_spectral(sd, f"{pre}.A.weights", cz["A"])
        _x_dense(sd, f"{pre}.A.Lo", cz["A"]["Lo"])
        for mod in ("B", "C"):
            _x_conv(sd, f"{pre}.{mod}.conv.0", cz[mod]["conv"])
            _x_dense(sd, f"{pre}.{mod}.Lo", cz[mod]["Lo"])
        _x_dense(sd, f"{pre}.T0", cz["T0"])
        i += 1
    return sd


@register_exporter("cno")
def export_cno(params, model_state, bundle=None):
    sd = {}
    bs = model_state.get("batch_stats", {})

    for src, tkey in (("lift", "lift"), ("project", "project")):
        _x_conv(sd, f"{tkey}.inter_CNOBlock.convolution",
                params[src]["inter"]["convolution"])
        _x_conv(sd, f"{tkey}.convolution", params[src]["convolution"])

    def put(name, tkey):
        p = params[name]
        _x_conv(sd, f"{tkey}.convolution", p["convolution"])
        if "bn" in p:
            _x_norm(sd, f"{tkey}.batch_norm", p["bn"])
            _x_bn_stats(sd, f"{tkey}.batch_norm", bs[name]["bn"])

    n_layers = 0
    while f"encoder_{n_layers}" in params:
        n_layers += 1
    for i in range(n_layers):
        put(f"encoder_{i}", f"encoder.{i}")
        put(f"decoder_{i}", f"decoder.{i}")
        put(f"decoder_inv_{i}", f"decoder_inv.{i}")
    i = 0
    while f"ed_expansion_{i}" in params:
        put(f"ed_expansion_{i}", f"ED_expansion.{i}")
        i += 1

    def put_res(name, tkey):
        p = params[name]
        _x_conv(sd, f"{tkey}.convolution1", p["convolution1"])
        _x_conv(sd, f"{tkey}.convolution2", p["convolution2"])
        _x_norm(sd, f"{tkey}.batch_norm1", p["bn1"])
        _x_norm(sd, f"{tkey}.batch_norm2", p["bn2"])
        _x_bn_stats(sd, f"{tkey}.batch_norm1", bs[name]["bn1"])
        _x_bn_stats(sd, f"{tkey}.batch_norm2", bs[name]["bn2"])

    idx = 0
    for l in range(n_layers):
        put_res(f"res_{l}_0", f"res_nets.{idx}")
        idx += 1
    j = 0
    while f"res_neck_{j}" in params:
        put_res(f"res_neck_{j}", f"res_nets.{idx}")
        idx += 1
        j += 1
    return sd


# --- unet (and the wdno denoiser, which shares its structure) ---------------


_GAMMA_5D = True  # reference unet.py:173 — gamma shape (1, dim, 1, 1, 1)


def _x_unet_norm(sd, pre, p):
    sd[f"{pre}.fn.norm.gamma"] = p["gamma"].reshape(1, -1, 1, 1, 1)


def _x_unet_resnet(sd, pre, p):
    _x_conv(sd, f"{pre}.block1.proj", p["block1"]["proj"])
    _x_norm(sd, f"{pre}.block1.norm", p["block1"]["norm"])
    _x_conv(sd, f"{pre}.block2.proj", p["block2"]["proj"])
    _x_norm(sd, f"{pre}.block2.norm", p["block2"]["norm"])
    if "mlp" in p:
        _x_dense(sd, f"{pre}.mlp.1", p["mlp"])
    if "res_conv" in p:
        _x_conv(sd, f"{pre}.res_conv", p["res_conv"])


def _x_unet_temporal(sd, pre, norm_p, attn_p):
    _x_unet_norm(sd, pre, norm_p)
    _x_dense(sd, f"{pre}.fn.fn.fn.to_qkv", attn_p["to_qkv"])
    _x_dense(sd, f"{pre}.fn.fn.fn.to_out", attn_p["to_out"])


def _x_unet_spatial_linear(sd, pre, norm_p, attn_p):
    _x_unet_norm(sd, pre, norm_p)
    _x_conv(sd, f"{pre}.fn.fn.to_qkv", attn_p["to_qkv"])
    _x_conv(sd, f"{pre}.fn.fn.to_out", attn_p["to_out"])


@register_exporter("unet")
def export_unet(params, model_state, bundle=None):
    p = params
    sd = {}
    _x_conv(sd, "init_conv", p["init_conv"])
    _x_unet_temporal(sd, "init_temporal_attn", p["init_attn_norm"],
                     p["init_temporal_attn"])
    sd["time_rel_pos_bias.relative_attention_bias.weight"] = (
        p["time_rel_pos_bias"]["embedding"])
    _x_dense(sd, "time_mlp.1", p["time_mlp_1"])
    _x_dense(sd, "time_mlp.3", p["time_mlp_2"])

    i = 0
    while f"down_{i}_block1" in p:
        pre = f"downs.{i}"
        _x_unet_resnet(sd, f"{pre}.0", p[f"down_{i}_block1"])
        _x_unet_resnet(sd, f"{pre}.1", p[f"down_{i}_block2"])
        if f"down_{i}_spatial_attn" in p:
            _x_unet_spatial_linear(sd, f"{pre}.2", p[f"down_{i}_spatial_norm"],
                                   p[f"down_{i}_spatial_attn"])
        _x_unet_temporal(sd, f"{pre}.3", p[f"down_{i}_temporal_norm"],
                         p[f"down_{i}_temporal_attn"])
        if f"down_{i}_downsample" in p:
            _x_conv(sd, f"{pre}.4", p[f"down_{i}_downsample"])
        i += 1

    _x_unet_resnet(sd, "mid_block1", p["mid_block1"])
    sd["mid_spatial_attn.fn.norm.gamma"] = (
        p["mid_spatial_norm"]["gamma"].reshape(1, -1, 1, 1, 1))
    _x_dense(sd, "mid_spatial_attn.fn.fn.fn.to_qkv",
             p["mid_spatial_attn"]["to_qkv"])
    _x_dense(sd, "mid_spatial_attn.fn.fn.fn.to_out",
             p["mid_spatial_attn"]["to_out"])
    _x_unet_temporal(sd, "mid_temporal_attn", p["mid_temporal_norm"],
                     p["mid_temporal_attn"])
    _x_unet_resnet(sd, "mid_block2", p["mid_block2"])

    i = 0
    while f"up_{i}_block1" in p:
        pre = f"ups.{i}"
        _x_unet_resnet(sd, f"{pre}.0", p[f"up_{i}_block1"])
        _x_unet_resnet(sd, f"{pre}.1", p[f"up_{i}_block2"])
        if f"up_{i}_spatial_attn" in p:
            _x_unet_spatial_linear(sd, f"{pre}.2", p[f"up_{i}_spatial_norm"],
                                   p[f"up_{i}_spatial_attn"])
        _x_unet_temporal(sd, f"{pre}.3", p[f"up_{i}_temporal_norm"],
                         p[f"up_{i}_temporal_attn"])
        if f"up_{i}_upsample" in p:
            _x_conv_transpose(sd, f"{pre}.4", p[f"up_{i}_upsample"])
        i += 1

    _x_unet_resnet(sd, "final_conv.0", p["final_block"])
    _x_conv(sd, "final_conv.1", p["final_conv"])
    return sd


@register_exporter("wdno")
def export_wdno(params, model_state, bundle=None):
    """Backbone keys get the reference WDNO 'model.' prefix (wdno.py:167);
    the DDPM schedule buffers (wdno.py:221-247) are recomputed from the
    module's beta schedule so the exported dict loads into the reference
    WDNO with a complete buffer set. The rescaler is NOT a state-dict entry
    in the reference (find_rescaler caches it to its own file)."""
    backbone = export_unet(params, model_state)
    sd = {f"model.{k}": v for k, v in backbone.items()}
    pipe = getattr(bundle, "pipeline", None)
    if pipe is not None:
        sch = pipe.schedule
        for k in ("betas", "alphas_cumprod", "alphas_cumprod_prev",
                  "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
                  "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
                  "posterior_variance", "posterior_log_variance_clipped",
                  "posterior_mean_coef1", "posterior_mean_coef2"):
            sd[k] = np.asarray(getattr(sch, k), np.float32)
        sd["log_one_minus_alphas_cumprod"] = np.log(
            1.0 - np.asarray(sch.alphas_cumprod, np.float64)
        ).astype(np.float32)
    return sd


# --- CLI: `realpdebench_tpu export-torch` -----------------------------------


def main():
    """Export a framework checkpoint (orbax dir) to a reference `.pth`.

    realpdebench_tpu export-torch --config configs/cylinder/fno.yaml \
        --checkpoint_path results/.../ckpt --out fno_cylinder.pth \
        [--shape_in 20,64,128,3 --shape_out 20,64,128,3]

    Shapes default to the config's dataset probe when --dataset_root is
    reachable; pass --shape_in/--shape_out to export without data.
    """
    import jax

    from realpdebench_tpu.config import make_arg_parser, merge_config
    from realpdebench_tpu.models.registry import build_model
    from realpdebench_tpu.train.loop import load_reference_or_orbax_checkpoint
    from realpdebench_tpu.train.train_step import TrainState, build_optimizer

    parser = make_arg_parser("Export a checkpoint to the reference "
                             ".pth format")
    parser.add_argument("--checkpoint_path", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--shape_in", type=str, default=None,
                        help="T,H,W,C window shape (skips the dataset probe)")
    parser.add_argument("--shape_out", type=str, default=None)
    args = parser.parse_args()
    cfg = merge_config(args)

    if cfg.get("shape_in"):
        si = tuple(int(v) for v in str(cfg.shape_in).split(","))
        so = (tuple(int(v) for v in str(cfg.shape_out).split(","))
              if cfg.get("shape_out") else si)
    else:
        from realpdebench_tpu.train.loop import _dataset_class

        cls = _dataset_class(cfg.dataset_name,
                             bool(cfg.get("use_hf_dataset", False)))
        ds = cls(mode="train",
                 dataset_type=cfg.get("train_data_type", "numerical"),
                 dataset_name=cfg.dataset_name,
                 dataset_root=cfg.dataset_root)
        x0, y0 = ds[0]
        si, so = tuple(x0.shape), tuple(y0.shape)

    bundle = build_model(shapes=(si, so), **cfg.to_dict())
    variables = bundle.init(jax.random.PRNGKey(0),
                            np.zeros((1, *si), np.float32))
    params, model_state = bundle.split_variables(variables)
    state = TrainState.create(params, model_state, build_optimizer(cfg))
    state = load_reference_or_orbax_checkpoint(cfg.checkpoint_path, state,
                                               bundle)
    out = save_torch_checkpoint(args.out, bundle, state.params,
                                state.model_state,
                                iteration=int(getattr(state, "step", 0)))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
