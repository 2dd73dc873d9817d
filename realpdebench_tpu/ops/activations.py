"""Activation helpers with a platform-aware GELU.

The reference uses torch's exact (erf-based) GELU everywhere. On some TPU
runtimes (notably the remote-compile path used in this environment) `erf`
fails to lower; the tanh approximation is numerically within ~1e-3 relative
and universally supported. Resolution order:

  * env ``REALPDEBENCH_GELU`` = ``exact`` | ``tanh`` forces a variant;
  * otherwise exact erf on CPU/GPU (bit-parity with the reference in tests)
    and tanh on TPU backends.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp


@lru_cache(maxsize=1)
def _use_approximate() -> bool:
    forced = os.environ.get("REALPDEBENCH_GELU")
    if forced == "exact":
        return False
    if forced == "tanh":
        return True
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return platform not in ("cpu", "gpu", "cuda", "rocm")


def gelu(x):
    return jax.nn.gelu(x, approximate=_use_approximate())
