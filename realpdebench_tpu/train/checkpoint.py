"""Checkpoint / resume via Orbax.

Reference checkpoints are torch dicts saved every num_update/50 iterations
(`realpdebench/train.py:410-418`) with model weights + loss history + best-
iteration metadata (optimizer state is NOT saved — resume restarts Adam,
`SURVEY.md §5`). Here we save strictly more: params, mutable model state,
optimizer state, step counter, and the same metadata — async, atomic, and
restartable (orbax) — while `load_checkpoint(..., load_opt_state=False)`
reproduces the reference finetune paradigm (weights only, fresh Adam).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state, metadata: Optional[dict] = None):
        payload = {
            "params": state.params,
            "model_state": state.model_state,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        args = {"state": ocp.args.StandardSave(payload)}
        if metadata is not None:
            args["metadata"] = ocp.args.JsonSave(_jsonable(metadata))
        self._mgr.save(step, args=ocp.args.Composite(**args))

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state, step: Optional[int] = None,
                load_opt_state: bool = True):
        """Restore into the structure of ``state``; returns (state, metadata)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint under {self.directory}")
        template = {
            "params": state.params,
            "model_state": state.model_state,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template)
            ),
        )["state"]
        new_state = state.replace(
            params=restored["params"],
            model_state=restored["model_state"],
            step=jax.numpy.asarray(restored["step"]),
        )
        if load_opt_state:
            new_state = new_state.replace(opt_state=restored["opt_state"])
        metadata = self.load_metadata(step)
        return new_state, metadata

    def load_metadata(self, step: int):
        try:
            return self._mgr.restore(
                step, args=ocp.args.Composite(metadata=ocp.args.JsonRestore())
            )["metadata"]
        except Exception:
            return None

    def close(self):
        self._mgr.close()


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if hasattr(obj, "item") and getattr(obj, "ndim", 1) == 0:
        return obj.item()
    return obj
