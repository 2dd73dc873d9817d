"""Download DPOT pretrained backbones (Ti/S/M/L/H) from hzk17/DPOT.

Reference: `realpdebench/utils/dpot_ckpts_dl.py:13-108`. The downloaded torch
checkpoints are loaded into the JAX DPOT via the interop converter
(`realpdebench_tpu/interop/torch_convert.py::convert_dpot`).
"""

from __future__ import annotations

import argparse
import os
import shutil

DPOT_MODELS = {
    "model_Ti.pth": "90.5 MB",
    "model_S.pth": "370 MB",
    "model_M.pth": "1.47 GB",
    "model_L.pth": "6.11 GB",
    "model_H.pth": "12.4 GB",
}


def download_dpot_models(output_dir="dpot_ckpts", models=None):
    from huggingface_hub import hf_hub_download

    os.makedirs(output_dir, exist_ok=True)
    models = models or list(DPOT_MODELS.keys())
    downloaded = []
    for name in models:
        if name not in DPOT_MODELS:
            print(f"Unknown model: {name} (choices: {list(DPOT_MODELS)})")
            continue
        out_path = os.path.join(output_dir, name)
        if os.path.exists(out_path):
            print(f"{name} ({DPOT_MODELS[name]}) already exists, skipping")
            downloaded.append(out_path)
            continue
        print(f"Downloading {name} ({DPOT_MODELS[name]})...")
        path = hf_hub_download(repo_id="hzk17/DPOT", filename=name)
        shutil.copy(path, out_path)
        downloaded.append(out_path)
        print(f"  -> {out_path}")
    return downloaded


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output-dir", default="dpot_ckpts")
    parser.add_argument("--models", nargs="+", default=None,
                        choices=list(DPOT_MODELS.keys()))
    args = parser.parse_args()
    download_dpot_models(args.output_dir, args.models)


if __name__ == "__main__":
    main()
