"""Config system: YAML merged over argparse-style defaults, CLI wins.

Schema-compatible with the reference (`realpdebench/utils/utils.py:13-22` merge
semantics and `realpdebench/configs/{scenario}/{model}.yaml` keys), so reference
config files run unmodified. Keys set explicitly on the command line take
precedence over YAML values; YAML fills everything else.
"""

from __future__ import annotations

import argparse
import os
from types import SimpleNamespace

import yaml


class Config(SimpleNamespace):
    """Attribute-style config. ``get`` mirrors dict.get for optional keys."""

    def get(self, key, default=None):
        return getattr(self, key, default)

    def to_dict(self):
        return dict(vars(self))

    def replace(self, **kwargs):
        d = self.to_dict()
        d.update(kwargs)
        return Config(**d)


def resolve_config_path(path: str) -> str:
    """Resolve a config path: as-is, relative to this package, or relative to
    the repo-root ``configs/`` tree (mirrors reference train.py:58-61)."""
    if os.path.exists(path):
        return path
    pkg_dir = os.path.dirname(__file__)
    for candidate in (
        os.path.join(pkg_dir, path),
        os.path.join(pkg_dir, "configs", path),
        os.path.join(os.path.dirname(pkg_dir), path),
    ):
        if os.path.exists(candidate):
            return candidate
    return path


def load_yaml(path: str) -> dict:
    with open(path) as f:
        data = yaml.safe_load(f)
    return data or {}


def merge_config(args: argparse.Namespace, explicit_keys=None) -> Config:
    """Merge a YAML config file into parsed args.

    Reference semantics (`utils/utils.py:13-22`): every YAML key that is *not*
    already an attribute of ``args`` is added. Keys the user passed explicitly
    on the CLI always win. ``explicit_keys`` (if given) lists CLI-provided keys;
    YAML then overrides parser *defaults* but not explicit CLI values — this is
    a strict superset of the reference behavior (the reference never overrides
    any argparse key, even defaults, because its parser only defines keys that
    are not in YAML).
    """
    cfg_path = resolve_config_path(args.config)
    data = load_yaml(cfg_path)
    out = dict(vars(args))
    out["config"] = cfg_path
    existing = set(out.keys()) if explicit_keys is None else set(explicit_keys)
    for key, value in data.items():
        # YAML fills keys argparse doesn't know, and keys argparse left at
        # None (e.g. --checkpoint_path not passed on the CLI).
        if key not in existing or out.get(key) is None:
            out[key] = value
    return Config(**out)


def load_config(path: str, **overrides) -> Config:
    """Programmatic entry: YAML file + keyword overrides (overrides win)."""
    data = load_yaml(resolve_config_path(path))
    data["config"] = resolve_config_path(path)
    data.update(overrides)
    return Config(**data)


def make_arg_parser(description="RealPDEBench-TPU") -> argparse.ArgumentParser:
    """Shared CLI flags (mirrors reference train.py:24-53 / eval.py:25-54)."""
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config", type=str, default="configs/cylinder/fno.yaml")
    parser.add_argument("--train_data_type", type=str, default="numerical",
                        help="numerical | real")
    parser.add_argument("--is_finetune", action="store_true",
                        help="enable finetuning mode")
    parser.add_argument("--use_hf_dataset", action="store_true",
                        help="Use the HuggingFace Arrow-backed dataset source")
    parser.add_argument("--hf_auto_download", action="store_true")
    parser.add_argument("--hf_repo_id", type=str,
                        default="AI4Science-WestlakeU/RealPDEBench")
    parser.add_argument("--hf_endpoint", type=str, default=None)
    parser.add_argument("--hf_revision", type=str, default=None)
    # TPU-specific knobs (new, no reference counterpart)
    parser.add_argument("--mesh_shape", type=str, default=None,
                        help="e.g. 'dp=8' or 'dp=4,mp=2'; default: all devices on dp")
    parser.add_argument("--compute_dtype", type=str, default=None,
                        help="bfloat16 | float32 (default per-model policy)")
    return parser
