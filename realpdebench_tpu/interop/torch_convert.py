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
        w = np.stack(
            [sd[f"spectral_convs.{i}.weights{k}"] for k in (1, 2, 3, 4)]
        )
        cw = sd[f"convs.{i}.weight"][:, :, 0, 0, 0]
        params[f"layer_{i}"] = {
            "spectral": {
                "w_real": w.real.astype(np.float32),
                "w_imag": w.imag.astype(np.float32),
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
