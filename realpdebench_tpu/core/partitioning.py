"""Parameter partitioning rules — tensor parallelism over the ``mp`` axis.

The benchmark models are parameter-heavy in specific places (an FNO3d at
width 64 / modes (4,12,16) carries ~100M spectral parameters → ~1.2 GB with
Adam moments in f32), so sharding weights over a model-parallel mesh axis is
the difference between replicating >1 GB per chip and scaling it out. GSPMD
propagates from the input shardings: weights stay resident sharded, the
channel contractions become partial matmuls with an all-reduce on ICI.

Rules (matched on the flattened param path):
  * spectral corner weights ``w_real``/``w_imag`` [4, m..., Cin, Cout]
    (channels-minor storage, models/fno.py::_spectral_params) — shard Cout
    (last axis): each mp shard owns a slice of output channels;
  * Dense/Conv ``kernel`` leaves — shard the output-feature (last) axis;
  * everything else (biases, norms, scalars) replicated.
A dimension that does not divide the mp size stays replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from realpdebench_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, MeshContext


def _leaf_spec(path: str, leaf, mp: int) -> P:
    ndim = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())
    if mp <= 1 or ndim < 2:
        return P()
    if ("w_real" in path or "w_imag" in path) and ndim >= 3:
        if shape[-1] % mp == 0:
            return P(*([None] * (ndim - 1) + [MODEL_AXIS]))
        return P()
    if path.endswith("kernel']") or path.endswith("kernel]"):
        if shape[-1] % mp == 0:
            return P(*([None] * (ndim - 1) + [MODEL_AXIS]))
        return P()
    return P()


def param_shardings(params, mesh_ctx: MeshContext):
    """Pytree of NamedShardings matching ``params``."""
    mp = mesh_ctx.mp_size

    def one(path, leaf):
        spec = _leaf_spec(jax.tree_util.keystr(path), leaf, mp)
        return NamedSharding(mesh_ctx.mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def train_state_shardings(state, mesh_ctx: MeshContext):
    """NamedSharding pytree matching a TrainState (concrete or abstract):
    params (and the Adam moments that mirror the param tree) per the rules,
    everything else replicated. Usable both for ``jax.device_put`` placement
    and for attaching shardings to ``ShapeDtypeStruct``s in AOT lowering
    (tests/test_multichip_lowering.py)."""
    p_shard = param_shardings(state.params, mesh_ctx)

    def repl_like(node):
        return jax.tree_util.tree_map(lambda _: mesh_ctx.replicated, node)

    def opt_shard(node):
        # optax adam state mirrors the param tree (mu/nu); shard those the
        # same way, replicate scalars/schedules
        try:
            same_tree = (
                jax.tree_util.tree_structure(node)
                == jax.tree_util.tree_structure(state.params)
            )
        except Exception:
            same_tree = False
        return p_shard if same_tree else repl_like(node)

    if hasattr(state.opt_state, "__len__"):
        opt_state = tuple(
            type(s)(*[opt_shard(getattr(s, f)) for f in s._fields])
            if hasattr(s, "_fields") else repl_like(s)
            for s in state.opt_state
        )
    else:
        opt_state = repl_like(state.opt_state)

    return state.replace(
        params=p_shard,
        model_state=repl_like(state.model_state),
        opt_state=opt_state,
        step=mesh_ctx.replicated,
    )


def shard_train_state(state, mesh_ctx: MeshContext):
    """Place a TrainState per ``train_state_shardings``."""
    sh = train_state_shardings(state, mesh_ctx)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def token_constraint(x, mesh, token_axis: int = 1):
    """Sequence parallelism: shard the token axis of ``x`` over ``mp``.

    Galerkin attention is ``Q · (LN(K)ᵀLN(V)/N)`` — the only cross-token
    coupling is the N-contraction in the scores, which GSPMD turns into a
    per-shard partial matmul + an ICI ``psum`` when the token axis is sharded
    (reference counterpart: the full-token attention in
    galerkin_transformer_libs/layers.py:708-734, single-device). LayerNorms
    are per-token, FFNs per-token, so everything else stays local.

    No-op when ``mesh`` is None or has no model axis.
    """
    mp = 1 if mesh is None else mesh.shape.get(MODEL_AXIS, 1)
    if mesh is None or mp <= 1 or x.shape[token_axis] % mp != 0:
        return x
    spec = [None] * x.ndim
    spec[token_axis] = MODEL_AXIS
    # keep the leading batch axis on dp: a None there would FORCE the batch
    # replicated (all-gather), and the SPMD conv weight-gradient then psums
    # dp-replicated contributions — grads come out dp× too large
    dp = mesh.shape.get(DATA_AXIS, 1)
    if dp > 1 and token_axis != 0 and x.shape[0] % dp == 0:
        spec[0] = DATA_AXIS
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
