"""RealPDEBench-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for benchmarking
neural PDE surrogates on paired real-world and simulated physical data.

Re-designed from scratch for TPU hardware with the same capabilities as the
reference `realpdebench` package (see /root/reference, `realpdebench/__init__.py:7`):

  * 5 physical scenarios: cylinder, controlled_cylinder, fsi, foil, combustion
  * 10 baseline model families (FNO, U-Net, CNO, WDNO, DeepONet, MWT,
    Galerkin-Transformer, Transolver, DPOT, DMD)
  * 3 training paradigms: train-on-numerical, train-on-real,
    finetune-numerical-on-real
  * 13-scalar evaluation metric suite + probe diagnostics
  * HDF5 and HuggingFace-Arrow data sources with identical split semantics

The compute path is pure JAX (jit/pjit over a `jax.sharding.Mesh`, `lax.scan`
rollouts, Pallas kernels for hot ops); the host path (data loading, prefetch)
is a threaded double-buffered pipeline feeding sharded device buffers.
"""

__version__ = "0.2.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor JAX_PLATFORMS even on hosts whose sitecustomize force-registers
    # an accelerator platform after env parsing (jax then ignores the env
    # var; pinning via jax.config restores standard behavior).
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - jax absent or locked
        pass

# Dataset artifact versioning (parity with reference realpdebench/__init__.py:10-71:
# a version.json in the dataset root gates code/data compatibility).
MIN_DATA_VERSION = "0.2.0"


def _parse_version(v):
    parts = []
    for p in str(v).split("."):
        num = ""
        for ch in p:
            if ch.isdigit():
                num += ch
            else:
                break
        parts.append(int(num) if num else 0)
    while len(parts) < 3:
        parts.append(0)
    return tuple(parts[:3])


def check_data_version(dataset_root):
    """Validate `version.json` under ``dataset_root`` against this package.

    Mirrors the reference semantics (realpdebench/__init__.py:10-71): the file
    carries ``{"data_version": ..., "min_code_version": ...}``; we refuse to
    run when the installed code is older than ``min_code_version``. A missing
    file is tolerated (local/synthetic data trees).

    Returns a dict with keys ``ok``, ``data_version``, ``min_code_version``,
    ``message``.
    """
    import json
    import os

    path = os.path.join(dataset_root, "version.json")
    if not os.path.exists(path):
        return {
            "ok": True,
            "data_version": None,
            "min_code_version": None,
            "message": "no version.json found; skipping data-version check",
        }
    with open(path) as f:
        info = json.load(f)
    data_version = info.get("data_version")
    min_code = info.get("min_code_version", "0.0.0")
    ok = _parse_version(__version__) >= _parse_version(min_code)
    msg = (
        f"data_version={data_version}, requires code >= {min_code}; "
        f"installed {__version__} -> {'OK' if ok else 'TOO OLD'}"
    )
    if not ok:
        raise RuntimeError(
            f"Dataset at {dataset_root} requires realpdebench_tpu >= {min_code}, "
            f"but {__version__} is installed. Please upgrade."
        )
    return {
        "ok": ok,
        "data_version": data_version,
        "min_code_version": min_code,
        "message": msg,
    }
