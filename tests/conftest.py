"""Test environment: force an 8-device virtual CPU platform so that mesh /
sharding / collective logic is exercised without TPU hardware (the standard
JAX trick; see SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
