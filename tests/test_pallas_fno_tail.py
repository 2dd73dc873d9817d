"""K3 fused tail+loss kernel parity (interpret mode on CPU).

The fused path's loss-in-module (FNO3d.__call__ with ``y``) must return the
same scalar as mse(pred, y) on the same fused forward, and the same parameter
gradients — K3 only reorganizes the crop+fc1+gelu+fc2+MSE computation
(ops/pallas/fno_tail.py), it does not change the math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realpdebench_tpu.models.fno import FNO3d
from realpdebench_tpu.ops.pallas.fno_tail import pack_target_lane_major

# W and W+padding even (fused-path requirement); small but non-square
B, T, H, W, CIN = 2, 3, 10, 12, 3
COUT, MULT = 3, 2
SHAPE_IN = (T, H, W, CIN)
SHAPE_OUT = (T * MULT, H, W, COUT)


def _build(**kw):
    return FNO3d(
        modes1=2, modes2=3, modes3=4, n_layers=2, width=8,
        shape_in=SHAPE_IN, shape_out=SHAPE_OUT, padding=6,
        use_pallas=True, pallas_interpret=True, **kw)


def _data(seed=0):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(size=(B, *SHAPE_IN)).astype(np.float32))
    y = jnp.asarray(r.normal(size=(B, *SHAPE_OUT)).astype(np.float32))
    return x, y


def test_pack_target_lane_major_layout():
    """Every valid element of y lands at the (bt, lane=(p·F+f... ), row)
    position matching the forward output's packed layout."""
    r = np.random.default_rng(1)
    Tp, Hr, Jr = T + 6, 16, 8  # J0 = 6 -> Jr multiple of 8
    y = r.normal(size=(B, T * MULT, H, W, COUT)).astype(np.float32)
    y_lm = np.asarray(pack_target_lane_major(
        jnp.asarray(y), B=B, T=T, H=H, W=W, c_out=COUT, mult=MULT,
        Tp=Tp, Hr=Hr, Jr=Jr))
    F2 = 2 * COUT * MULT
    assert y_lm.shape == (B * Tp, -(-F2 // 8) * 8, Hr * Jr)
    # forward packing: pred_flat[bt, h*Jr + j, p*F + c*MULT + m]
    #   == pred[b, t*MULT + m, h, 2j + p, c]
    for _ in range(50):
        b, t, h = (r.integers(B), r.integers(T), r.integers(H))
        j, p, c, m = (r.integers(W // 2), r.integers(2), r.integers(COUT),
                      r.integers(MULT))
        lane = p * (COUT * MULT) + c * MULT + m
        got = y_lm[b * Tp + t, lane, h * Jr + j]
        want = y[b, t * MULT + m, h, 2 * j + p, c]
        np.testing.assert_allclose(got, want)
    # invalid rows are zero
    assert np.all(y_lm[:, :, H * Jr:] == 0.0)
    assert np.all(y_lm.reshape(B, Tp, -1)[:, T:] == 0.0)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_k3_loss_value_matches_xla_tail(monkeypatch, dtype):
    """Same fused layers, K3 on vs off: the loss scalar must agree."""
    module = _build(compute_dtype=jnp.dtype(dtype))
    x, y = _data()
    variables = module.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("REALPDEBENCH_FNO_FUSED_LOSS", "0")
    loss_off = module.apply(variables, x, y=y, train=False)
    monkeypatch.setenv("REALPDEBENCH_FNO_FUSED_LOSS", "1")
    loss_on = module.apply(variables, x, y=y, train=False)
    tol = 1e-5 if dtype == "float32" else 2e-2
    np.testing.assert_allclose(
        np.asarray(loss_on), np.asarray(loss_off), rtol=tol, atol=tol)
    # and both equal mse(pred, y) of the plain forward
    pred = module.apply(variables, x, train=False)
    mse = float(jnp.mean((pred - y) ** 2))
    np.testing.assert_allclose(np.asarray(loss_off), mse, rtol=tol, atol=tol)


def test_k3_grads_match_xla_tail(monkeypatch):
    """Parameter gradients (including BN affine + batch_stats updates)
    through K3 must match the XLA tail to float tolerance."""
    module = _build(compute_dtype=jnp.float32)
    x, y = _data(seed=2)
    variables = module.init(jax.random.PRNGKey(1), x)
    params = variables["params"]
    stats = {"batch_stats": variables["batch_stats"]}

    def loss_fn(p):
        loss, new_state = module.apply(
            {"params": p, **stats}, x, y=y, train=True,
            mutable=["batch_stats"])
        return loss, new_state

    monkeypatch.setenv("REALPDEBENCH_FNO_FUSED_LOSS", "0")
    (l0, ms0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params)
    monkeypatch.setenv("REALPDEBENCH_FNO_FUSED_LOSS", "1")
    (l1, ms1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(params)

    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=1e-5, atol=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    assert len(flat0) == len(flat1)
    for path, leaf0 in flat0:
        leaf1 = flat1[path]
        # atol floor 1e-6: grads that are analytically zero (e.g. pointwise
        # bias — BN normalization cancels it) are pure float noise ~1e-8
        np.testing.assert_allclose(
            np.asarray(leaf1), np.asarray(leaf0), rtol=2e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
    for (p0, s0), (p1, s1) in zip(
            jax.tree_util.tree_leaves_with_path(ms0),
            jax.tree_util.tree_leaves_with_path(ms1)):
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                                   rtol=1e-5, atol=1e-6)


def test_bundle_loss_uses_module_loss():
    """registry loss_fn routes through the module's loss-in-module path and
    still returns (scalar, new_state) with updated batch_stats."""
    from realpdebench_tpu.models.registry import build_model

    bundle = build_model(
        shapes=(SHAPE_IN, SHAPE_OUT), model_name="fno",
        modes1=2, modes2=3, modes3=4, n_layers=2, width=8,
        use_pallas=True, pallas_interpret=True)
    x, y = _data(seed=3)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    loss, new_state = bundle.loss(variables, x, y, None, train=True)
    assert loss.ndim == 0 and jnp.isfinite(loss)
    assert "batch_stats" in new_state
    # eval-mode loss returns no state
    loss_e, st = bundle.loss(variables, x, y, None, train=False)
    assert st == {} and jnp.isfinite(loss_e)
