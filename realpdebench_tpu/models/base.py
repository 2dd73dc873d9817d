"""Model contract for the framework.

Reference contract (`realpdebench/model/model.py:4-26`): forward maps
``[B, T_in, H, W, C_in] → [B, T_out, H, W, C_out]``; ``train_loss`` defaults to
elementwise MSE; checkpoints round-trip through a state-dict-like mapping.

TPU-native design: models are stateless Flax modules; parameters and mutable
collections (batch_stats) live in a pytree owned by the caller, so one jitted
train step covers every model. ``ModelBundle`` wraps a module with:

  * ``init(rng, sample_x)``     → variables
  * ``predict(variables, x)``   → deterministic forward (eval path)
  * ``loss(variables, x, y, rng, train)`` → (scalar loss, new mutable state)

Stochastic models (WDNO diffusion) override ``loss``/``predict`` with
rng-consuming versions; everything else gets MSE for free.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def _host_cpu():
    try:
        return jax.devices("cpu")[0]
    except Exception:
        return None


def _dropout_stream(rng):
    """Dropout PRNG stream for stochastic models.

    Threefry bit generation dominates dropout-heavy TPU steps — the
    galerkin profile (bench_results/r5/profile_galerkin_r5.log) shows the
    mask generation + select chains as the top step cost. The ``rbg``
    implementation lowers to XLA's RngBitGenerator (Philox) instead of a
    software hash chain. The rbg key is derived deterministically from the
    incoming threefry key, so seeded runs stay reproducible; rbg bits may
    differ across backends/shardings, which is acceptable for dropout
    noise (never used for parameter init). Set
    ``REALPDEBENCH_DROPOUT_IMPL=threefry`` to restore the old stream.
    """
    if rng is None:
        return None
    from realpdebench_tpu.utils.misc import env_choice

    if env_choice("REALPDEBENCH_DROPOUT_IMPL", ("rbg", "threefry"),
                  "rbg") != "rbg":
        return rng
    data = rng
    if not jnp.issubdtype(jnp.asarray(data).dtype, jnp.integer):
        data = jax.random.key_data(rng)
    data = jnp.asarray(data, jnp.uint32).reshape(-1)
    return jax.random.wrap_key_data(
        jnp.concatenate([data, data])[:4], impl="rbg")


@dataclasses.dataclass
class ModelBundle:
    name: str
    module: Any  # flax linen module
    mutable: tuple = ()  # e.g. ("batch_stats",)
    needs_train_flag: bool = True
    stochastic: bool = False  # loss/predict consume rng (diffusion models)
    # Optional overrides
    loss_fn: Optional[Callable] = None
    predict_fn: Optional[Callable] = None
    # Non-trainable host models (DMD) bypass the train loop entirely
    trainable: bool = True
    _predict_jit: Any = dataclasses.field(default=None, repr=False,
                                          compare=False)
    _predict_jit_rng: Any = dataclasses.field(default=None, repr=False,
                                              compare=False)

    def init(self, rng, sample_x):
        if not self.trainable:
            return {"params": {}}
        kwargs = {"train": False} if self.needs_train_flag else {}
        # Initialize on host CPU when available: deterministic across
        # backends and avoids burning accelerator time on a one-off trace.
        cpu = _host_cpu()
        if cpu is not None:
            with jax.default_device(cpu):
                return self.module.init(rng, jnp.asarray(sample_x), **kwargs)
        # No host CPU platform (e.g. the axon remote-compile TPU tunnel,
        # which registers only the accelerator): JIT the init — the eager
        # op-by-op dispatch path is incomplete on such runtimes (FFT ops
        # raise UNIMPLEMENTED outside compiled programs).
        return jax.jit(
            lambda r, xx: self.module.init(r, xx, **kwargs)
        )(rng, jnp.asarray(sample_x))

    def split_variables(self, variables):
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return params, model_state

    def predict(self, variables, x, rng=None):
        if self.predict_fn is not None:
            return self.predict_fn(self.module, variables, x, rng)
        if not self.trainable:  # host-side model (DMD): plain call, no jit
            return jnp.asarray(self.module(x))
        # jit the eval forward: one fused program instead of op-by-op eager
        # dispatch (faster, and some TPU runtimes only support certain ops
        # inside compiled programs). Cached per bundle; re-traces only on
        # shape change.
        if self._predict_jit is None:
            kwargs = {"train": False} if self.needs_train_flag else {}
            apply = self.module.apply
            self._predict_jit = jax.jit(
                lambda v, xx: apply(v, xx, **kwargs)
            )
            # stochastic-eval variant (e.g. GKT reference_eval_dropout):
            # same program but with a dropout rng stream threaded through
            self._predict_jit_rng = jax.jit(
                lambda v, xx, r: apply(
                    v, xx, rngs={"dropout": _dropout_stream(r)}, **kwargs)
            )
        if (
            self.stochastic
            and rng is not None
            and getattr(self.module, "reference_eval_dropout", False)
        ):
            return self._predict_jit_rng(variables, x, rng)
        return self._predict_jit(variables, x)

    def _rngs(self, rng, train):
        if self.stochastic and train and rng is not None:
            return {"rngs": {"dropout": _dropout_stream(rng)}}
        return {}

    def loss(self, variables, x, y, rng, train: bool = True):
        """Returns (loss, new_model_state)."""
        if self.loss_fn is not None:
            return self.loss_fn(self.module, variables, x, y, rng, train)
        kwargs = {"train": train} if self.needs_train_flag else {}
        kwargs.update(self._rngs(rng, train))
        if self.mutable and train:
            pred, new_state = self.module.apply(
                variables, x, mutable=list(self.mutable), **kwargs
            )
            return mse(pred, y), new_state
        pred = self.module.apply(variables, x, **kwargs)
        return mse(pred, y), {}

    def param_count(self, variables) -> int:
        return sum(
            p.size for p in jax.tree_util.tree_leaves(variables.get("params", {}))
        )
