"""Profiling / tracing hooks — a subsystem the reference lacks entirely
(SURVEY §5: only tqdm + wall-clock deltas, train.py:303,420-421).

Provides:
  * `StepTimer` — per-step wall-clock stats with warmup exclusion;
    steps/sec/chip is the framework's north-star metric (BASELINE.md);
  * `maybe_trace` — wraps a window of training steps in a `jax.profiler`
    trace (XPlane format, viewable in TensorBoard / xprof / Perfetto) when
    the config sets `profile_dir`.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

import jax


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._last = None
        self._count = 0

    def tick(self):
        now = time.perf_counter()
        self._count += 1
        if self._last is not None and self._count > self.warmup:
            self.times.append(now - self._last)
        self._last = now

    @property
    def steps_per_sec(self) -> Optional[float]:
        if not self.times:
            return None
        return len(self.times) / sum(self.times)

    def summary(self) -> dict:
        if not self.times:
            return {}
        import numpy as np

        arr = np.asarray(self.times)
        n_dev = jax.device_count()
        return {
            "steps_per_sec": float(1.0 / arr.mean()),
            "steps_per_sec_per_chip": float(1.0 / arr.mean() / n_dev),
            "step_ms_p50": float(np.percentile(arr, 50) * 1e3),
            "step_ms_p95": float(np.percentile(arr, 95) * 1e3),
        }


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str], enabled: bool = True):
    """Trace the enclosed steps with jax.profiler when profile_dir is set."""
    if profile_dir and enabled:
        logging.info(f"jax.profiler trace → {profile_dir}")
        with jax.profiler.trace(profile_dir):
            yield True
    else:
        yield False
