"""Test environment: force an 8-device virtual CPU platform so that mesh /
sharding / collective logic is exercised without TPU hardware (the standard
JAX trick; see SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# Some environments force-register an accelerator platform from sitecustomize,
# overriding JAX_PLATFORMS; pin CPU explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

# Module names the reference-parity tests may stub into sys.modules when the
# real package is absent. A stub is a bare types.ModuleType (its __spec__ is
# None); leaving one installed poisons later imports — e.g. `datasets` probes
# torchvision with importlib.util.find_spec, which raises
# "ValueError: torchvision.__spec__ is None" on a leftover stub. Real
# installed packages always carry a spec and are never touched.
_STUBBABLE = ("torchvision", "PIL", "pkg_resources", "timm", "einops_exts",
              "rotary_embedding_torch", "torchinfo", "psutil", "ptwt")


@pytest.fixture(autouse=True)
def _remove_import_stubs():
    """Uninstall parity-test import stubs after every test so execution order
    cannot leak them into unrelated subsystems (one-process suite hygiene)."""
    yield
    import sys

    for name in list(sys.modules):
        if name.split(".")[0] in _STUBBABLE:
            mod = sys.modules[name]
            if mod is None or getattr(mod, "__spec__", None) is None:
                del sys.modules[name]


@pytest.fixture
def rng():
    return np.random.default_rng(0)
