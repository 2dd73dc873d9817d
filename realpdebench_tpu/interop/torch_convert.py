"""Torch → JAX checkpoint interop.

The reference ships released checkpoints as torch ``.pth`` state dicts
(10 models × 5 scenarios × 3 paradigms, `README.md:92-113`) plus pretrained
DPOT backbones (`utils/dpot_ckpts_dl.py:14-19`). The finetune paradigm and
eval-from-released-checkpoints both require loading them into flax params.

Each model family registers a converter: torch ``state_dict`` (numpy-ified)
→ nested flax param dict matching our module layout, including:
  * Linear weight transposes (out,in) → (in,out)
  * Conv kernel layout (O,I,*K) → (*K,I,O)
  * complex spectral weights → stacked (w_real, w_imag) corner blocks
  * BatchNorm running stats → batch_stats collection
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

_CONVERTERS: Dict[str, Callable] = {}


def register_converter(name):
    def deco(fn):
        _CONVERTERS[name] = fn
        return fn

    return deco


def load_torch_state_dict(path: str) -> dict:
    """Read a torch checkpoint into a {key: np.ndarray} dict. Accepts both the
    reference's full checkpoint dict ({'model_state_dict': ...}, train.py:410)
    and a bare state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            v = v.detach().cpu()
            if v.is_complex():
                out[k] = v.resolve_conj().numpy()
            else:
                out[k] = v.numpy()
        else:
            out[k] = np.asarray(v)
    return out


def load_torch_checkpoint(path: str, bundle, params_template, model_state_template):
    """Convert a reference checkpoint for ``bundle`` into (params, model_state)
    shaped like the provided templates."""
    if bundle.name not in _CONVERTERS:
        raise NotImplementedError(
            f"No torch converter registered for model '{bundle.name}'"
        )
    sd = load_torch_state_dict(path)
    return _CONVERTERS[bundle.name](sd, params_template, model_state_template)


def _dense(sd, tkey):
    return {"kernel": sd[f"{tkey}.weight"].T, "bias": sd[f"{tkey}.bias"]}


def _dense_nobias(sd, tkey):
    return {"kernel": sd[f"{tkey}.weight"].T}


def _conv(sd, tkey):
    """torch ConvNd (O, I, *K) → flax (*K, I, O)."""
    w = sd[f"{tkey}.weight"]
    perm = tuple(range(2, w.ndim)) + (1, 0)
    out = {"kernel": np.ascontiguousarray(w.transpose(perm))}
    if f"{tkey}.bias" in sd:
        out["bias"] = sd[f"{tkey}.bias"]
    return out


def _conv_transpose(sd, tkey):
    """torch ConvTransposeNd (I, O, *K) → flax transpose_kernel=True
    layout (*K, O, I)."""
    w = sd[f"{tkey}.weight"]
    perm = tuple(range(2, w.ndim)) + (1, 0)
    out = {"kernel": np.ascontiguousarray(w.transpose(perm))}
    if f"{tkey}.bias" in sd:
        out["bias"] = sd[f"{tkey}.bias"]
    return out


def _groupnorm(sd, tkey):
    return {"scale": sd[f"{tkey}.weight"], "bias": sd[f"{tkey}.bias"]}


@register_converter("fno")
def convert_fno(sd, params_template, model_state_template):
    """FNO3d mapping (reference model/fno.py:66-143 ↔ models/fno.py)."""
    params = {
        "fc0": _dense(sd, "fc0"),
        "fc1": _dense(sd, "fc1"),
        "fc2": _dense(sd, "fc2"),
    }
    batch_stats = {}
    n_layers = len(
        {k.split(".")[1] for k in sd if k.startswith("spectral_convs.")}
    )
    for i in range(n_layers):
        # torch [Ci, Co, m1, m2, m3] per corner → channels-minor storage
        # [4, m1, m2, m3, Ci, Co] (models/fno.py::_spectral_params)
        w = np.stack(
            [sd[f"spectral_convs.{i}.weights{k}"] for k in (1, 2, 3, 4)]
        ).transpose(0, 3, 4, 5, 1, 2)
        cw = sd[f"convs.{i}.weight"][:, :, 0, 0, 0]
        params[f"layer_{i}"] = {
            "spectral": {
                "w_real": np.ascontiguousarray(w.real).astype(np.float32),
                "w_imag": np.ascontiguousarray(w.imag).astype(np.float32),
            },
            "pointwise": {"kernel": cw.T, "bias": sd[f"convs.{i}.bias"]},
            "bn": {
                "scale": sd[f"bns.{i}.weight"],
                "bias": sd[f"bns.{i}.bias"],
            },
        }
        batch_stats[f"layer_{i}"] = {
            "bn": {
                "mean": sd[f"bns.{i}.running_mean"],
                "var": sd[f"bns.{i}.running_var"],
            }
        }
    return params, {"batch_stats": batch_stats}


def _unet_resnet_block(sd, pre, has_time=True):
    out = {
        "block1": {
            "proj": _conv(sd, f"{pre}.block1.proj"),
            "norm": _groupnorm(sd, f"{pre}.block1.norm"),
        },
        "block2": {
            "proj": _conv(sd, f"{pre}.block2.proj"),
            "norm": _groupnorm(sd, f"{pre}.block2.norm"),
        },
    }
    if has_time and f"{pre}.mlp.1.weight" in sd:
        out["mlp"] = _dense(sd, f"{pre}.mlp.1")
    if f"{pre}.res_conv.weight" in sd:
        out["res_conv"] = _conv(sd, f"{pre}.res_conv")
    return out


def _unet_temporal_attn(sd, pre):
    """Residual(PreNorm(EinopsToAndFrom(Attention))) key paths
    (reference unet.py:390,405): {pre}.fn.norm.gamma, {pre}.fn.fn.fn.to_*."""
    return (
        {"gamma": sd[f"{pre}.fn.norm.gamma"].reshape(-1)},
        {
            "to_qkv": _dense_nobias(sd, f"{pre}.fn.fn.fn.to_qkv"),
            "to_out": _dense_nobias(sd, f"{pre}.fn.fn.fn.to_out"),
        },
    )


def _unet_spatial_linear_attn(sd, pre):
    return (
        {"gamma": sd[f"{pre}.fn.norm.gamma"].reshape(-1)},
        {
            "to_qkv": _conv(sd, f"{pre}.fn.fn.to_qkv"),
            "to_out": _conv(sd, f"{pre}.fn.fn.to_out"),
        },
    )


@register_converter("unet")
def convert_unet(sd, params_template, model_state_template):
    """Unet3d mapping (reference model/unet.py:360-567 ↔ models/unet.py)."""
    p = {}
    p["init_conv"] = _conv(sd, "init_conv")
    p["init_attn_norm"], p["init_temporal_attn"] = _unet_temporal_attn(
        sd, "init_temporal_attn"
    )
    p["time_rel_pos_bias"] = {
        "embedding": sd["time_rel_pos_bias.relative_attention_bias.weight"]
    }
    p["time_mlp_1"] = _dense(sd, "time_mlp.1")
    p["time_mlp_2"] = _dense(sd, "time_mlp.3")

    n_down = len({k.split(".")[1] for k in sd if k.startswith("downs.")})
    for i in range(n_down):
        pre = f"downs.{i}"
        p[f"down_{i}_block1"] = _unet_resnet_block(sd, f"{pre}.0")
        p[f"down_{i}_block2"] = _unet_resnet_block(sd, f"{pre}.1")
        if f"{pre}.2.fn.norm.gamma" in sd:
            (p[f"down_{i}_spatial_norm"],
             p[f"down_{i}_spatial_attn"]) = _unet_spatial_linear_attn(
                sd, f"{pre}.2"
            )
        (p[f"down_{i}_temporal_norm"],
         p[f"down_{i}_temporal_attn"]) = _unet_temporal_attn(sd, f"{pre}.3")
        if f"{pre}.4.weight" in sd:
            p[f"down_{i}_downsample"] = _conv(sd, f"{pre}.4")

    p["mid_block1"] = _unet_resnet_block(sd, "mid_block1")
    p["mid_spatial_norm"] = {
        "gamma": sd["mid_spatial_attn.fn.norm.gamma"].reshape(-1)
    }
    p["mid_spatial_attn"] = {
        "to_qkv": _dense_nobias(sd, "mid_spatial_attn.fn.fn.fn.to_qkv"),
        "to_out": _dense_nobias(sd, "mid_spatial_attn.fn.fn.fn.to_out"),
    }
    (p["mid_temporal_norm"],
     p["mid_temporal_attn"]) = _unet_temporal_attn(sd, "mid_temporal_attn")
    p["mid_block2"] = _unet_resnet_block(sd, "mid_block2")

    n_up = len({k.split(".")[1] for k in sd if k.startswith("ups.")})
    for i in range(n_up):
        pre = f"ups.{i}"
        p[f"up_{i}_block1"] = _unet_resnet_block(sd, f"{pre}.0")
        p[f"up_{i}_block2"] = _unet_resnet_block(sd, f"{pre}.1")
        if f"{pre}.2.fn.norm.gamma" in sd:
            (p[f"up_{i}_spatial_norm"],
             p[f"up_{i}_spatial_attn"]) = _unet_spatial_linear_attn(
                sd, f"{pre}.2"
            )
        (p[f"up_{i}_temporal_norm"],
         p[f"up_{i}_temporal_attn"]) = _unet_temporal_attn(sd, f"{pre}.3")
        if f"{pre}.4.weight" in sd:
            p[f"up_{i}_upsample"] = _conv_transpose(sd, f"{pre}.4")

    p["final_block"] = _unet_resnet_block(sd, "final_conv.0", has_time=False)
    p["final_conv"] = _conv(sd, "final_conv.1")
    return p, {}


@register_converter("dpot")
def convert_dpot(sd, params_template, model_state_template):
    """DPOT mapping (reference dpot_libs/models/dpot.py:245-403 ↔
    models/dpot.py). Accepts both wrapper checkpoints ('dpot_model.' prefix,
    dpot.py:336-346) and bare pretrained backbones (hzk17/DPOT)."""
    sd = {
        (k[len("dpot_model."):] if k.startswith("dpot_model.") else
         k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }
    net = {}
    net["pos_embed"] = sd["pos_embed"].transpose(0, 2, 3, 1)  # (1,C,h,w)→(1,h,w,C)
    net["patch_proj1"] = _conv(sd, "patch_embed.proj.0")
    net["patch_proj2"] = _conv(sd, "patch_embed.proj.2")
    net["time_agg_w"] = sd["time_agg_layer.w"]
    if "time_agg_layer.gamma" in sd:
        net["time_agg_gamma"] = sd["time_agg_layer.gamma"]
    if "scale_feats_mu.weight" in sd:
        net["scale_feats_mu"] = _dense(sd, "scale_feats_mu")
        net["scale_feats_sigma"] = _dense(sd, "scale_feats_sigma")
    depth = len({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    for i in range(depth):
        pre = f"blocks.{i}"
        net[f"block_{i}"] = {
            "norm1": _groupnorm(sd, f"{pre}.norm1"),
            "norm2": _groupnorm(sd, f"{pre}.norm2"),
            "filter": {
                "w1": sd[f"{pre}.filter.w1"], "b1": sd[f"{pre}.filter.b1"],
                "w2": sd[f"{pre}.filter.w2"], "b2": sd[f"{pre}.filter.b2"],
            },
            "mlp1": _conv(sd, f"{pre}.mlp.0"),
            "mlp2": _conv(sd, f"{pre}.mlp.2"),
        }
    for dst, src in (("cls1", "cls_head.0"), ("cls2", "cls_head.2"),
                     ("cls3", "cls_head.4")):
        net[dst] = _dense(sd, src)
    net["out_deconv"] = _conv_transpose(sd, "out_layer.0")
    net["out_conv1"] = _conv(sd, "out_layer.2")
    net["out_conv2"] = _conv(sd, "out_layer.4")
    return {"dpot_model": net}, {}


@register_converter("deeponet")
def convert_deeponet(sd, params_template, model_state_template):
    """DeepONet mapping (reference model/deeponet.py:9-151)."""
    branch = {}
    bs = {}
    for i, stage in enumerate(("conv1", "conv2", "conv3", "conv4")):
        branch[f"Conv_{i}"] = _conv(sd, f"branch.{stage}.0")
        branch[f"BatchNorm_{i}"] = _groupnorm(sd, f"branch.{stage}.1")
        bs[f"BatchNorm_{i}"] = {
            "mean": sd[f"branch.{stage}.1.running_mean"],
            "var": sd[f"branch.{stage}.1.running_var"],
        }
    # branch.fc.0 consumes the flattened pooled features: torch flattens the
    # channels-first tensor [B, 256, 1, 4, 4] in (C, spatial) order while the
    # flax branch flattens channels-last (spatial, C) — permute the weight's
    # input dimension accordingly. (At tiny debug shapes the adaptive pool
    # upsamples and repeats values, which masked this; real shapes diverge.)
    w0 = sd["branch.fc.0.weight"]  # [512, 256*1*4*4]
    cdim, spatial = 256, w0.shape[1] // 256
    w0 = w0.reshape(w0.shape[0], cdim, spatial)
    w0 = np.ascontiguousarray(w0.transpose(0, 2, 1)).reshape(w0.shape[0], -1)
    branch["Dense_0"] = {"kernel": w0.T, "bias": sd["branch.fc.0.bias"]}
    branch["Dense_1"] = _dense(sd, "branch.fc.3")
    trunk = {
        f"Dense_{i}": _dense(sd, src)
        for i, src in enumerate(("trunk.fc.0", "trunk.fc.2", "trunk.fc.4"))
    }
    params = {
        "branch": branch,
        "trunk": trunk,
        "out_fc1": _dense(sd, "output_net.0"),
        "out_fc2": _dense(sd, "output_net.3"),
        "out_fc3": _dense(sd, "output_net.6"),
    }
    return params, {"batch_stats": {"branch": bs}}


@register_converter("transolver")
def convert_transolver(sd, params_template, model_state_template):
    """Transolver mapping (reference TRANSOLVER_libs ↔ models/transolver.py)."""
    params = {
        "placeholder": sd["placeholder"],
        "preprocess": {
            "Dense_0": _dense(sd, "preprocess.linear_pre.0"),
            "Dense_1": _dense(sd, "preprocess.linear_post"),
        },
    }
    n_blocks = len({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    for i in range(n_blocks):
        pre = f"blocks.{i}"
        blk = {}
        for ln in ("ln_1", "ln_2", "ln_3"):
            if f"{pre}.{ln}.weight" in sd:
                blk[ln] = {"scale": sd[f"{pre}.{ln}.weight"],
                           "bias": sd[f"{pre}.{ln}.bias"]}
        attn = {"temperature": sd[f"{pre}.Attn.temperature"]}
        for conv in ("in_project_fx", "in_project_x"):
            attn[conv] = _conv(sd, f"{pre}.Attn.{conv}")
        attn["in_project_slice"] = _dense(sd, f"{pre}.Attn.in_project_slice")
        for qkv in ("to_q", "to_k", "to_v"):
            attn[qkv] = _dense_nobias(sd, f"{pre}.Attn.{qkv}")
        attn["to_out"] = _dense(sd, f"{pre}.Attn.to_out.0")
        blk["attn"] = attn
        blk["mlp"] = {
            "Dense_0": _dense(sd, f"{pre}.mlp.linear_pre.0"),
            "Dense_1": _dense(sd, f"{pre}.mlp.linear_post"),
        }
        if f"{pre}.mlp2.weight" in sd:
            blk["mlp2"] = _dense(sd, f"{pre}.mlp2")
        params[f"block_{i}"] = blk
    return params, {}


def _spectral_corners(sd, prefix):
    # torch [Ci, Co, m...] per corner → channels-minor [4, m..., Ci, Co]
    w = np.stack([sd[f"{prefix}{k}"] for k in (1, 2, 3, 4)])
    w = w.transpose(0, 3, 4, 5, 1, 2)
    return {"w_real": np.ascontiguousarray(w.real).astype(np.float32),
            "w_imag": np.ascontiguousarray(w.imag).astype(np.float32)}


@register_converter("galerkin_transformer")
def convert_galerkin(sd, params_template, model_state_template):
    """GK-Transformer mapping (reference galerkin_transformer_libs ↔
    models/galerkin_transformer.py, benchmark configuration)."""
    params = {
        "downscaler": {"kernel": sd["downscaler.id.weight"].T,
                       "bias": sd["downscaler.id.bias"]},
    }
    n_enc = len({k.split(".")[1] for k in sd if k.startswith("encoder_layers.")})
    # head count = number of per-head norm modules: keys look like
    # encoder_layers.{i}.attn.norm_K.{h}.weight → the head index is the
    # segment after "norm_K"
    n_head = None
    for k in sd:
        if k.endswith("attn.norm_K.0.weight"):
            parts = k.split(".")
            h_idx = parts.index("norm_K") + 1
            n_head = len({kk.split(".")[h_idx] for kk in sd
                          if "attn.norm_K." in kk and kk.endswith(".weight")})
            break
    for i in range(n_enc):
        pre = f"encoder_layers.{i}"
        enc = {"attn": {}}
        for dst, src in (("q", 0), ("k", 1), ("v", 2)):
            enc["attn"][dst] = _dense(sd, f"{pre}.attn.linears.{src}")
        for which in ("K", "V"):
            enc["attn"][f"norm_{which}"] = {
                "scale": np.stack([sd[f"{pre}.attn.norm_{which}.{h}.weight"]
                                   for h in range(n_head)]),
                "bias": np.stack([sd[f"{pre}.attn.norm_{which}.{h}.bias"]
                                  for h in range(n_head)]),
            }
        enc["ff1"] = _dense(sd, f"{pre}.ff.lr1")
        enc["ff2"] = _dense(sd, f"{pre}.ff.lr2")
        for ln in ("layer_norm1", "layer_norm2"):
            if f"{pre}.{ln}.weight" in sd:
                enc[ln] = {"scale": sd[f"{pre}.{ln}.weight"],
                           "bias": sd[f"{pre}.{ln}.bias"]}
        params[f"encoder_{i}"] = enc

    reg = {"fc": _dense(sd, "regressor.fc")}
    bs_reg = {}
    n_spec = len({k.split(".")[2] for k in sd
                  if k.startswith("regressor.spectral_conv.")})
    for i in range(n_spec):
        reg[f"spectral_{i}"] = _spectral_corners(
            sd, f"regressor.spectral_conv.{i}.weights"
        )
        cw = sd[f"regressor.convs.{i}.weight"][:, :, 0, 0, 0]
        reg[f"pointwise_{i}"] = {"kernel": cw.T,
                                 "bias": sd[f"regressor.convs.{i}.bias"]}
        reg[f"bn_{i}"] = _groupnorm(sd, f"regressor.bns.{i}")
        bs_reg[f"bn_{i}"] = {
            "mean": sd[f"regressor.bns.{i}.running_mean"],
            "var": sd[f"regressor.bns.{i}.running_var"],
        }
    reg["regressor1"] = _dense(sd, "regressor.regressor1")
    reg["regressor2"] = _dense(sd, "regressor.regressor2")
    params["regressor"] = reg
    return params, {"batch_stats": {"regressor": bs_reg}}


@register_converter("mwt")
def convert_mwt(sd, params_template, model_state_template):
    """MWT mapping (reference MWT_libs/models.py:715-785 ↔ models/mwt.py).
    Note: the reference's BN list and CZ filter buffers are unused/recomputed
    and therefore skipped."""
    params = {
        "Lk": _dense(sd, "Lk"),
        "Lc0": _dense(sd, "Lc0"),
        "Lc1": _dense(sd, "Lc1"),
    }
    n_cz = len({k.split(".")[1] for k in sd if k.startswith("MWT_CZ.")})
    for i in range(n_cz):
        pre = f"MWT_CZ.{i}"
        cz = {"A": _spectral_corners(sd, f"{pre}.A.weights")}
        cz["A"]["Lo"] = _dense(sd, f"{pre}.A.Lo")
        for mod in ("B", "C"):
            cz[mod] = {
                "conv": _conv(sd, f"{pre}.{mod}.conv.0"),
                "Lo": _dense(sd, f"{pre}.{mod}.Lo"),
            }
        cz["T0"] = _dense(sd, f"{pre}.T0")
        params[f"cz_{i}"] = cz
    return params, {}


def _cno_block(sd, tkey, has_bn=True):
    out = {"convolution": _conv(sd, f"{tkey}.convolution")}
    bs = {}
    if has_bn and f"{tkey}.batch_norm.weight" in sd:
        out["bn"] = _groupnorm(sd, f"{tkey}.batch_norm")
        bs["bn"] = {"mean": sd[f"{tkey}.batch_norm.running_mean"],
                    "var": sd[f"{tkey}.batch_norm.running_var"]}
    return out, bs


@register_converter("cno")
def convert_cno(sd, params_template, model_state_template):
    """CNO mapping (reference model/cno.py:235-528 ↔ models/cno.py)."""
    params = {}
    batch_stats = {}

    for dst, tkey in (("lift", "lift"), ("project", "project")):
        params[dst] = {
            "inter": {"convolution": _conv(sd, f"{tkey}.inter_CNOBlock.convolution")},
            "convolution": _conv(sd, f"{tkey}.convolution"),
        }

    def put(name, tkey):
        p, b = _cno_block(sd, tkey)
        params[name] = p
        if b:
            batch_stats[name] = b

    n_layers = len({k.split(".")[1] for k in sd if k.startswith("encoder.")})
    for i in range(n_layers):
        put(f"encoder_{i}", f"encoder.{i}")
        put(f"decoder_{i}", f"decoder.{i}")
        put(f"decoder_inv_{i}", f"decoder_inv.{i}")
    n_ed = len({k.split(".")[1] for k in sd if k.startswith("ED_expansion.")})
    for i in range(n_ed):
        put(f"ed_expansion_{i}", f"ED_expansion.{i}")

    # residual blocks: construction order is level blocks then neck blocks
    n_res_total = len({k.split(".")[1] for k in sd if k.startswith("res_nets.")})
    n_level = n_layers  # N_res per level is 1 in the shipped configuration
    idx = 0
    for l in range(n_level):
        params[f"res_{l}_0"], bs = _cno_res(sd, f"res_nets.{idx}")
        batch_stats[f"res_{l}_0"] = bs
        idx += 1
    j = 0
    while idx < n_res_total:
        params[f"res_neck_{j}"], bs = _cno_res(sd, f"res_nets.{idx}")
        batch_stats[f"res_neck_{j}"] = bs
        idx += 1
        j += 1
    return params, {"batch_stats": batch_stats}


def _cno_res(sd, tkey):
    p = {
        "convolution1": _conv(sd, f"{tkey}.convolution1"),
        "convolution2": _conv(sd, f"{tkey}.convolution2"),
        "bn1": _groupnorm(sd, f"{tkey}.batch_norm1"),
        "bn2": _groupnorm(sd, f"{tkey}.batch_norm2"),
    }
    b = {
        "bn1": {"mean": sd[f"{tkey}.batch_norm1.running_mean"],
                "var": sd[f"{tkey}.batch_norm1.running_var"]},
        "bn2": {"mean": sd[f"{tkey}.batch_norm2.running_mean"],
                "var": sd[f"{tkey}.batch_norm2.running_var"]},
    }
    return p, b


@register_converter("wdno")
def convert_wdno(sd, params_template, model_state_template):
    """WDNO backbone mapping: the denoiser is the same video-diffusion Unet3d
    (reference wdno_libs/unet.py == model/unet.py structure), so reuse the
    unet converter after stripping the 'model.' prefix the WDNO wrapper adds
    (wdno.py:167)."""
    stripped = {
        (k[len("model."):] if k.startswith("model.") else k): v
        for k, v in sd.items()
        if not k.startswith(("betas", "alphas", "sqrt_", "log_",
                             "posterior_", "rescaler"))
    }
    return convert_unet(stripped, params_template, model_state_template)
