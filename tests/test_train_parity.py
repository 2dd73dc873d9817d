"""Cross-framework TRAINING-equivalence (VERDICT r4 missing-1 / next-3).

The checkpoint closed loops prove *static* parity (same weights -> same
forward). This file proves the *dynamics*: starting from converted-identical
inits, the reference torch training loop (Adam + CosineAnnealingLR + optional
global-norm clip + mse train_loss, `reference/realpdebench/train.py:290-334`)
and our jitted train step produce loss trajectories that track step for step
over ~200 updates on identical synthetic batches — so optimizer, scheduler,
BatchNorm-in-training, and loss semantics cannot silently drift. Together
with static parity this largely de-risks the blocked-on-egress "Rel-L2
within 1% vs released checkpoints" target: equal inits + equal dynamics on
equal data => equal checkpoints.

Covered families: FNO (BatchNorm + the fused-kernel train path), UNet and
DPOT (the finetune paradigm's actual users).
"""

import os
import sys

import jax
import numpy as np
import pytest

# XLA:CPU's default matmul precision is reduced; trajectory comparison needs
# true f32 GEMMs (same rationale as tests/test_checkpoint_parity.py:19-22)
jax.config.update("jax_default_matmul_precision", "highest")

from realpdebench_tpu.config import Config
from realpdebench_tpu.data.normalizer import IdentityNormalizer
from realpdebench_tpu.models.registry import build_model
from realpdebench_tpu.train.train_step import (
    TrainState,
    build_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)

sys.path.insert(0, "/root/reference")
torch = pytest.importorskip("torch")


@pytest.fixture(autouse=True)
def _stubs():
    from tests.test_checkpoint_parity import _install_import_stubs

    _install_import_stubs()
    yield


def _torch_trajectory(tm, xs, ys, lr, n_steps, clip=0.0):
    """The reference loop body verbatim (train.py:290-334): Adam, cosine
    T_max=n_steps, scheduler.step() after optimizer.step()."""
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=n_steps)
    tm.train()
    losses = []
    for i in range(n_steps):
        opt.zero_grad()
        loss = tm.train_loss(torch.from_numpy(xs[i]),
                             torch.from_numpy(ys[i])).mean()
        loss.backward()
        if clip > 0:
            torch.nn.utils.clip_grad_norm_(tm.parameters(), clip)
        opt.step()
        sched.step()
        losses.append(float(loss.item()))
    tm.eval()
    return np.asarray(losses)


def _jax_trajectory(bundle, ckpt_path, x0, xs, ys, lr, n_steps, clip=0.0):
    from realpdebench_tpu.train.loop import load_reference_or_orbax_checkpoint

    variables = bundle.init(jax.random.PRNGKey(0), x0)
    params, model_state = bundle.split_variables(variables)
    cfg = Config(lr=lr, scheduler="cosine", num_update=n_steps,
                 clip_grad_norm=clip)
    state = TrainState.create(params, model_state, build_optimizer(cfg))
    state = load_reference_or_orbax_checkpoint(ckpt_path, state, bundle)
    step = make_train_step(bundle, IdentityNormalizer(), grad_accum=1)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(n_steps):
        key, k = jax.random.split(key)
        state, loss = step(state, xs[i], ys[i], k)
        losses.append(float(np.asarray(jax.device_get(loss))))
    return np.asarray(losses), state


def _train_parity(tmp_path, tm, bundle, si, so, name, n_steps=200,
                  batch=2, lr=1e-3, rtol_loss=2e-3, rtol_metric=2e-2,
                  clip=0.0):
    from tests.test_checkpoint_parity import _save_reference_ckpt

    from realpdebench_tpu.eval.metrics import eval_metrics_dict

    rng = np.random.default_rng(7)
    xs = rng.normal(size=(n_steps, batch, *si)).astype(np.float32)
    ys = rng.normal(size=(n_steps, batch, *so)).astype(np.float32) * 0.1
    x0 = xs[0, :1]

    ckpt = _save_reference_ckpt(tmp_path, tm, name)
    jl, state = _jax_trajectory(bundle, ckpt, x0, xs, ys, lr, n_steps, clip)
    tl = _torch_trajectory(tm, xs, ys, lr, n_steps, clip)

    # step-for-step tracking; a drifting optimizer/schedule/BN shows up as
    # a widening gap, so assert the WHOLE trajectory, not just the end
    np.testing.assert_allclose(
        jl, tl, rtol=rtol_loss, atol=1e-5,
        err_msg=f"{name}: train-loss trajectories diverged")
    # and loss must actually fall (the comparison is meaningless on a
    # flat-lined trajectory)
    assert tl[-5:].mean() < tl[:5].mean(), f"{name}: torch loss did not fall"

    # post-training val-metric sweep: both frameworks' predictions on a
    # held-out batch must agree on all 13 scalars
    xv = rng.normal(size=(batch, *si)).astype(np.float32)
    loaded = {"params": state.params, **state.model_state}
    got = np.asarray(bundle.predict(loaded, xv))
    with torch.no_grad():
        want = tm(torch.from_numpy(xv)).numpy()
    tgt = (0.9 * want + 0.05).astype(np.float32)
    m_jax = eval_metrics_dict(got, tgt, got.shape[-1])
    m_torch = eval_metrics_dict(want, tgt, want.shape[-1])
    assert len(m_jax) >= 13
    for k in m_jax:
        np.testing.assert_allclose(
            float(m_jax[k]), float(m_torch[k]), rtol=rtol_metric, atol=1e-4,
            err_msg=f"{name}: post-training val metric {k} diverged")


def test_fno_train_parity(tmp_path):
    from realpdebench.model.fno import FNO3d as TorchFNO3d

    si = so = (4, 12, 12, 3)
    torch.manual_seed(0)
    tm = TorchFNO3d(modes1=2, modes2=3, modes3=3, n_layers=2, width=8,
                    shape_in=si, shape_out=so)
    bundle = build_model(shapes=(si, so), model_name="fno", modes1=2,
                         modes2=3, modes3=3, n_layers=2, width=8)
    _train_parity(tmp_path, tm, bundle, si, so, "fno")


def test_fno_train_parity_with_clip(tmp_path):
    """Global-norm clipping path (train.py:330-331) — tighter lr so the
    clip actually engages on early steps."""
    from realpdebench.model.fno import FNO3d as TorchFNO3d

    si = so = (4, 8, 8, 3)
    torch.manual_seed(1)
    tm = TorchFNO3d(modes1=2, modes2=2, modes3=2, n_layers=1, width=8,
                    shape_in=si, shape_out=so)
    bundle = build_model(shapes=(si, so), model_name="fno", modes1=2,
                         modes2=2, modes3=2, n_layers=1, width=8)
    _train_parity(tmp_path, tm, bundle, si, so, "fno", n_steps=60,
                  lr=3e-3, clip=0.05, rtol_loss=5e-3)


def test_unet_train_parity(tmp_path):
    from tests.test_unet import _install_shims

    _install_shims(torch)
    from realpdebench.model.unet import Unet3d as TorchUnet3d

    si = so = (4, 16, 16, 3)
    torch.manual_seed(0)
    tm = TorchUnet3d(dim=si[1], out_channels=so[-1], dim_mults=(1, 2),
                     channels=si[-1], in_time=si[0], out_time=so[0])
    bundle = build_model(shapes=(si, so), model_name="unet", dim_mults=[1, 2])
    _train_parity(tmp_path, tm, bundle, si, so, "unet", n_steps=80,
                  rtol_loss=5e-3, rtol_metric=5e-2)


def test_dpot_train_parity(tmp_path):
    from realpdebench.model.dpot import DPOT as TorchDPOT

    si = so = (4, 16, 16, 3)
    kw = dict(img_size=16, in_channels=4, out_channels=4, in_timesteps=4,
              out_timesteps=4, patch_size=4, embed_dim=16, depth=2,
              n_blocks=4, modes=4, mlp_ratio=1, out_layer_dim=8,
              normalize=False, act="gelu", time_agg="exp_mlp", n_cls=2)
    torch.manual_seed(0)
    tm = TorchDPOT(shape_in=si, shape_out=so, model_type="dpot",
                   checkpoint_path=None, **kw)
    bundle = build_model(shapes=(si, so), model_name="dpot", **kw)
    _train_parity(tmp_path, tm, bundle, si, so, "dpot", n_steps=80,
                  rtol_loss=5e-3, rtol_metric=5e-2)
