"""Jitted, sharded training/eval steps + optimizer construction.

Reference loop body: `realpdebench/train.py:321-343` — Adam + Step/Cosine LR,
optional global-norm grad clipping, normalizer preprocess on the way in.

TPU-native design:
  * ONE compiled step for all models: forward+backward+update fused by XLA,
    donated state buffers (no reallocation per step);
  * data parallelism comes from sharding the batch leading axis over the
    mesh's ``dp`` axis — GSPMD auto-inserts the gradient ``psum`` over ICI;
    params/opt-state are replicated (sufficient at benchmark model sizes);
  * normalization happens inside the jitted step (stats are tiny device
    constants; XLA fuses the affine into adjacent ops);
  * LR schedule is an optax schedule evaluated on the device step counter —
    no host sync per step.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from realpdebench_tpu.core.mesh import MeshContext


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    model_state: Any  # mutable collections (batch_stats, ...)
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, model_state, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            model_state=model_state,
            opt_state=tx.init(params),
            tx=tx,
        )


def build_schedule(cfg) -> optax.Schedule:
    """cosine → CosineAnnealingLR(T_max=num_update, eta_min=0);
    step → StepLR(step_size, gamma=0.5). Reference train.py:291-296."""
    name = cfg.get("scheduler", "cosine")
    lr = float(cfg.lr)
    if name == "cosine":
        return optax.cosine_decay_schedule(lr, decay_steps=int(cfg.num_update))
    if name == "step":
        return optax.exponential_decay(
            lr,
            transition_steps=int(cfg.step_size),
            decay_rate=0.5,
            staircase=True,
        )
    raise ValueError(f"Scheduler {name} not supported")


def build_optimizer(cfg) -> optax.GradientTransformation:
    """Adam (torch defaults) + optional global-norm clip (train.py:290,330-331)."""
    schedule = build_schedule(cfg)
    chain = []
    clip = float(cfg.get("clip_grad_norm", 0.0) or 0.0)
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*chain)


def make_train_step(
    bundle,
    normalizer,
    mesh_ctx: Optional[MeshContext] = None,
    grad_accum: int = 1,
):
    """Build the jitted data-parallel train step.

    step(state, x, y, rng) -> (new_state, loss). x/y arrive batch-sharded on
    dp (the loader places them); state is replicated.

    ``grad_accum`` > 1 splits the batch into that many microbatches processed
    by a `lax.scan` with gradient averaging before one optimizer update —
    activation memory scales with the microbatch.

    BatchNorm caveat (documented deviation): under accumulation, BN batch
    statistics are computed per microbatch, while the reference normalizes
    over the full batch (train.py:321-343 runs the whole bs-32 batch in one
    pass). Exact full-batch statistics are not recoverable without a second
    full forward pass (layer l+1's statistics depend on layer l's normalized
    output), so for BN models (FNO/CNO/MWT/GKT) grad_accum > 1 trains with
    ghost-batch normalization over bs/grad_accum samples. The deviation is
    quantified in tests/test_end_to_end.py::test_grad_accum_bn_deviation;
    use grad_accum=1 where reference-exact training curves matter.
    """

    def _loss_and_grad(params, model_state, xn, yn, rng):
        def loss_fn(p):
            variables = {"params": p, **model_state}
            loss, new_ms = bundle.loss(variables, xn, yn, rng, train=True)
            return loss, new_ms

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def _step(state: TrainState, x, y, rng):
        if mesh_ctx is not None:
            x = jax.lax.with_sharding_constraint(
                x, mesh_ctx.sharding("dp", *([None] * (x.ndim - 1)))
            )
            y = jax.lax.with_sharding_constraint(
                y, mesh_ctx.sharding("dp", *([None] * (y.ndim - 1)))
            )
        xn, yn = normalizer.preprocess(x, y)

        if grad_accum <= 1:
            (loss, new_ms), grads = _loss_and_grad(
                state.params, state.model_state, xn, yn, rng
            )
        else:
            k = grad_accum
            b = xn.shape[0]
            assert b % k == 0, f"batch {b} not divisible by grad_accum {k}"
            if mesh_ctx is not None:
                # STRIDED microbatch composition (rows {r*k + i} form
                # microbatch i): every device's dp shard contributes rows to
                # every microbatch, so the scan's per-iteration slice of the
                # UNSHARDED leading axis is communication-free. The naive
                # contiguous reshape(k, b//k) makes microbatch i coincide
                # with device i's shard, and GSPMD then all-gathers the FULL
                # global batch into every device each step (755 MB/device at
                # reference fno scale — caught by
                # tests/test_multichip_lowering.py's collective audit).
                # Gradient/loss averages are composition-invariant; ghost-
                # batch BN statistics change composition only (documented
                # deviation unchanged).
                if (b // k) % mesh_ctx.dp_size:
                    # communication-free only while the microbatch axis
                    # (b//k) still shards evenly over dp; below that GSPMD
                    # must reshard every step — loud, not silent
                    import warnings

                    warnings.warn(
                        f"microbatch size {b}//{k}={b // k} is not a "
                        f"multiple of dp={mesh_ctx.dp_size}: the strided "
                        "grad-accum split will insert per-step resharding "
                        "collectives; lower grad_accum or raise the batch")
                xm = xn.reshape(b // k, k, *xn.shape[1:]).swapaxes(0, 1)
                ym = yn.reshape(b // k, k, *yn.shape[1:]).swapaxes(0, 1)
                mb_spec = lambda t: mesh_ctx.sharding(
                    None, "dp", *([None] * (t.ndim - 2)))
                xm = jax.lax.with_sharding_constraint(xm, mb_spec(xm))
                ym = jax.lax.with_sharding_constraint(ym, mb_spec(ym))
            else:
                xm = xn.reshape(k, b // k, *xn.shape[1:])
                ym = yn.reshape(k, b // k, *yn.shape[1:])
            rngs = jax.random.split(rng, k)

            def micro(carry, inp):
                ms, grad_acc, loss_acc = carry
                xb, yb, kb = inp
                (loss, new_ms), grads = _loss_and_grad(
                    state.params, ms, xb, yb, kb
                )
                grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
                return (new_ms if new_ms else ms, grad_acc, loss_acc + loss), None

            zero_grads = jax.tree_util.tree_map(
                jnp.zeros_like, state.params
            )
            (new_ms, grads, loss_sum), _ = jax.lax.scan(
                micro, (state.model_state, zero_grads, 0.0), (xm, ym, rngs)
            )
            grads = jax.tree_util.tree_map(lambda g: g / k, grads)
            loss = loss_sum / k

        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            model_state=new_ms if new_ms else state.model_state,
            opt_state=new_opt_state,
        )
        return new_state, loss

    return jax.jit(_step, donate_argnums=(0,))


def make_eval_step(bundle, normalizer, c: Optional[int] = None,
                   mesh_ctx: Optional[MeshContext] = None):
    """Jitted validation step: normalized MSE on the first ``c`` channels +
    physical-unit prediction/target (reference train.py:350-365).

    Returns step(state_variables, x, y, rng) ->
      (normalized_mse, pred_phys, target_phys).
    """

    def _step(variables, x, y, rng):
        if mesh_ctx is not None:
            x = jax.lax.with_sharding_constraint(
                x, mesh_ctx.sharding("dp", *([None] * (x.ndim - 1)))
            )
        xn, yn = normalizer.preprocess(x, y)
        pred = bundle.predict(variables, xn, rng=rng)
        cc = c if c is not None else y.shape[-1]
        nmse = jnp.mean((pred[..., :cc] - yn[..., :cc]) ** 2)
        _, pred_phys = normalizer.postprocess(xn, pred)
        _, target_phys = normalizer.postprocess(xn, yn)
        return nmse, pred_phys, target_phys

    return jax.jit(_step)
