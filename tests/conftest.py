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


def assert_bf16_close(build_kwargs, shapes, rng, rel_tol=0.1):
    """Shared bf16-vs-f32 closeness check: compute_dtype='bfloat16' must keep
    f32 params, return f32 outputs, and track the f32 forward within
    ``rel_tol`` relative L2 (bf16 carries ~3 decimal digits)."""
    import jax
    import jax.numpy as jnp

    from realpdebench_tpu.models.registry import build_model

    x = rng.normal(size=(2, *shapes[0])).astype(np.float32)
    b32 = build_model(shapes=shapes, **build_kwargs)
    v = b32.init(jax.random.PRNGKey(0), x)
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(v["params"]))
    b16 = build_model(shapes=shapes, compute_dtype="bfloat16", **build_kwargs)
    o32 = np.asarray(b32.predict(v, x))
    o16_dev = b16.predict(v, x)
    assert o16_dev.dtype == jnp.float32  # eval/H5 writers need f32 outputs
    o16 = np.asarray(o16_dev, np.float32)
    rel = np.linalg.norm(o16 - o32) / np.linalg.norm(o32)
    assert rel < rel_tol, rel
