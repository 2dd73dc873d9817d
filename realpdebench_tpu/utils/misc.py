"""Seeding, logging, small host-side helpers.

Reference counterparts: `realpdebench/utils/utils.py:26-60` (set_seed,
setup_logging, cycle). JAX determinism comes from explicit PRNG keys threaded
through the program, so ``set_seed`` only needs to pin the *host-side* numpy
RNG used by the data pipeline (noise injection, shuffles, mask_prob draws).
"""

from __future__ import annotations

import logging
import os
import random as _py_random
import zlib

import numpy as np


def env_flag(name: str, default: bool = False) -> bool:
    """Boolean env-var switch with forgiving parsing.

    Only explicit falsy spellings ("0", "false", "no", "off", "") opt out;
    explicit truthy spellings ("1", "true", "yes", "on") opt in; anything
    else logs a warning and keeps the default, so a typo like
    ``REALPDEBENCH_FNO_ALIGNED=ture`` cannot silently drop a default-on
    perf lever (advisor finding, round 3)."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    v = raw.strip().lower()
    if v in ("0", "false", "no", "off", ""):
        return False
    if v in ("1", "true", "yes", "on"):
        return True
    logging.warning("env %s=%r not understood; keeping default %s",
                    name, raw, default)
    return default


def env_choice(name: str, choices, default):
    """String env-var switch restricted to a known value set.

    Unknown values (typos like ``vpu `` or ``MXU``) log a warning and keep
    the default instead of crashing later at trace time or — worse —
    silently measuring the default path in an A/B run (advisor findings,
    round 4). Matching is case/whitespace-insensitive."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    v = raw.strip().lower()
    if v in choices:
        return v
    logging.warning("env %s=%r not in %s; keeping default %r",
                    name, raw, sorted(choices), default)
    return default


def set_seed(seed: int):
    """Pin host-side RNGs. Device-side randomness uses jax.random keys derived
    from the same seed (see train/loop.py)."""
    np.random.seed(seed)
    _py_random.seed(seed)


def derive_seed(seed: int, *parts) -> int:
    """Mix string/int tags into a base seed with a PROCESS-STABLE digest.

    Python's built-in ``hash()`` on strings is salted per interpreter
    (PYTHONHASHSEED), so ``seed + hash((mode, type))`` gives a different
    noise/mask draw sequence in every process — breaking cross-run
    determinism for the data pipeline.  crc32 is stable everywhere."""
    tag = "\x1f".join(str(p) for p in parts).encode()
    return (seed + zlib.crc32(tag)) % 2**31


def setup_logging(exp_path: str, is_use_tb: bool = False, is_train: bool = True):
    """File+console logging, optional TensorBoard writer (reference
    `utils/utils.py:33-55`)."""
    log_filename = os.path.join(
        exp_path, "training.log" if is_train else "eval.log"
    )
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
        handlers=[logging.FileHandler(log_filename), logging.StreamHandler()],
        force=True,
    )
    logging.info(f"Logging initialized at {log_filename}")

    writer = None
    if is_use_tb:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(log_dir=exp_path)
            logging.info(f"Tensorboard writer initialized at {writer.log_dir}")
        except Exception as e:  # tensorboard optional
            logging.warning(f"TensorBoard unavailable ({e}); continuing without")
    return writer


def cycle(iterable):
    """Infinite generator over a re-iterable (reference `utils/utils.py:57-60`)."""
    while True:
        for x in iterable:
            yield x
