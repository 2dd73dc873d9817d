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

import numpy as np


def set_seed(seed: int):
    """Pin host-side RNGs. Device-side randomness uses jax.random keys derived
    from the same seed (see train/loop.py)."""
    np.random.seed(seed)
    _py_random.seed(seed)


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
