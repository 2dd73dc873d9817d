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
