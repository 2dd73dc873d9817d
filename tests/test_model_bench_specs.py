"""Guard: tools/model_bench.py specs must match the reference cylinder
configs (mirrored in realpdebench_tpu/configs/cylinder/*.yaml) — the bench's
"reference scale" claim is only as good as this mapping. Round-3 found three
silent divergences (cno N_res_neck, galerkin encoder/regressor layers,
transolver ref/mlp_ratio); this test prevents recurrence."""

import os
import sys

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

CFG_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "realpdebench_tpu", "configs", "cylinder")

# bench family → cylinder yaml stem
YAML_OF = {
    "fno": "fno", "deeponet": "deeponet", "unet": "unet", "cno": "cno",
    "mwt": "mwt", "galerkin_transformer": "galerkin_transformer",
    "transolver": "trainsolver", "dpot": "dpot_s", "dpot_l": "dpot_l",
    "wdno": "wdno",
}

# documented spec-vs-yaml deviations (key → reason)
EXEMPT = {
    "compute_dtype",   # bench measures the bf16 MXU path (f32 is parity's)
    "remat",           # memory/speed point chosen per 16G chip, not a model hp
    "model_name",      # dpot_s/dpot_l yamls both use model_name dpot
    "n_cls",           # reference pretrain header (12 datasets); output head
                       # size only, no effect on the benched step cost
    "timesteps",       # wdno model default (not in the yaml)
}


def _norm(v):
    if isinstance(v, str):
        v = v.rstrip(",").strip()
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                pass
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return v


def test_bench_specs_match_reference_configs():
    from model_bench import MODELS

    problems = []
    for family, spec in MODELS.items():
        path = os.path.join(CFG_DIR, YAML_OF[family] + ".yaml")
        with open(path) as f:
            cfg = {k: _norm(v) for k, v in yaml.safe_load(f).items()}
        if spec["batch"] != cfg["train_batch_size"]:
            problems.append(
                f"{family}: batch {spec['batch']} != yaml "
                f"train_batch_size {cfg['train_batch_size']}")
        for k, v in spec["kw"].items():
            if k in EXEMPT or k not in cfg:
                continue
            if _norm(v) != cfg[k]:
                problems.append(
                    f"{family}: kw {k}={v!r} != yaml {cfg[k]!r}")
    assert not problems, "\n".join(problems)
