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


@pytest.fixture
def rng():
    return np.random.default_rng(0)
