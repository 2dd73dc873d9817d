"""Autoregressive rollout — the evaluation hot loop, as one compiled scan.

Reference semantics (`realpdebench/eval.py:296-325`): starting from the
normalized input window, repeat N_autoregressive times:
    p = model(window)                          # normalized prediction
    p_phys = postprocess_target(p)             # back to physical units
    if control: p_phys = cat(p_phys, raw control channels)   (eval.py:317)
    window = preprocess_input(p_phys)          # re-normalize input-side
collect the N normalized windows, strip control channels, and ALSO produce
physical-unit pred/target via target-side postprocess (eval.py:321-326).

TPU design: the whole rollout is one `lax.scan` inside jit — weights stay in
HBM/VMEM across steps, no host round-trips; the scan carry is the normalized
window. vmap over batch is implicit (everything is batched already).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def make_rollout_fn(bundle, normalizer, n_steps: int, para_c: int = 0):
    """Build rollout(variables, x_raw, y_raw, rng) ->
        (normalized_mse_pred, pred_phys, target_phys)

    where pred_phys/target_phys: [B, n_steps*T_out, H, W, C_target].
    ``para_c`` > 0 enables control-channel re-injection (controlled_cylinder:
    input has para_c more channels than the target, eval.py:306-318).
    """

    def rollout(variables, x_raw, y_raw, rng):
        x_raw = x_raw.astype(jnp.float32)
        y_raw = y_raw.astype(jnp.float32)
        para_input = x_raw[..., x_raw.shape[-1] - para_c :] if para_c else None

        xn, yn = normalizer.preprocess(x_raw, y_raw)

        def body(carry, step_rng):
            window = carry
            p = bundle.predict(variables, window, rng=step_rng)
            _, p_phys = normalizer.postprocess(window, p)
            if para_c:
                p_phys = jnp.concatenate([p_phys, para_input], axis=-1)
            p_next, _ = normalizer.preprocess(p_phys, yn)
            return p_next, p_next

        rngs = jax.random.split(rng, n_steps)
        _, preds = jax.lax.scan(body, xn, rngs)
        # preds: [n_steps, B, T_out, H, W, C_in]; time-concat along axis 1
        preds = jnp.moveaxis(preds, 0, 1)  # [B, n_steps, T_out, ...]
        B = preds.shape[0]
        pred = preds.reshape(B, -1, *preds.shape[3:])
        if para_c:
            pred = pred[..., :-para_c]
        return pred, xn, yn

    return jax.jit(rollout)


def make_host_rollout_fn(bundle, normalizer, n_steps: int, para_c: int = 0):
    """Un-jitted rollout with identical semantics, for host-side models
    (DMD — numpy SVD/eig have no TPU path)."""

    def rollout(variables, x_raw, y_raw, rng):
        x_raw = jnp.asarray(x_raw, jnp.float32)
        y_raw = jnp.asarray(y_raw, jnp.float32)
        para_input = x_raw[..., x_raw.shape[-1] - para_c :] if para_c else None
        xn, yn = normalizer.preprocess(x_raw, y_raw)
        window = xn
        preds = []
        for _ in range(n_steps):
            p = bundle.predict(variables, window, rng=rng)
            # host models may emit fewer channels (DMD: input_feature only);
            # postprocess/preprocess slice stats accordingly
            _, p_phys = normalizer.postprocess(window[..., : p.shape[-1]], p)
            if para_c:
                p_phys = jnp.concatenate([p_phys, para_input], axis=-1)
            window, _ = normalizer.preprocess(p_phys, yn)
            preds.append(window)
        pred = jnp.concatenate(preds, axis=1)
        if para_c:
            pred = pred[..., :-para_c]
        return pred, xn, yn

    return rollout


def finalize_rollout(normalizer, pred_norm, xn, yn, c: int):
    """normalized MSE on first c channels + physical pred/target
    (reference eval.py:323-326)."""
    nmse = jnp.mean((pred_norm[..., :c] - yn[..., :c]) ** 2)
    _, pred_phys = normalizer.postprocess(xn, pred_norm)
    _, target_phys = normalizer.postprocess(xn, yn)
    return nmse, pred_phys, target_phys
