"""torch_export is the exact inverse of torch_convert.

For every family: build a tiny bundle, randomize params + batch stats,
export to a reference-layout torch state dict, run it back through the
*forward* converter (the code path already proven against the reference
torch models by tests/test_checkpoint_parity.py), and assert the recovered
tree is bit-identical. When the reference repo is mounted, additionally
load the exported FNO dict into the real torch module with strict key
checking and compare forward outputs.
"""

import os

import jax
import numpy as np
import pytest

from realpdebench_tpu.interop.torch_convert import _CONVERTERS
from realpdebench_tpu.interop.torch_export import export_torch_state_dict
from realpdebench_tpu.models.registry import build_model

SI = SO = (4, 16, 16, 3)

CASES = {
    "fno": (SI, dict(model_name="fno", modes1=2, modes2=3, modes3=3,
                     n_layers=2, width=8)),
    "unet": (SI, dict(model_name="unet", dim_mults=[1, 2])),
    "deeponet": ((8, 16, 16, 3), dict(model_name="deeponet", p=16,
                                      dropout_rate=0.0)),
    "transolver": ((4, 8, 8, 3), dict(
        model_name="transolver", space_dim=3, n_layers=2, n_hidden=16,
        n_head=2, H=8, W=8, D=4, fun_dim=0, out_dim=3, ref=4, dropout=0.0,
        act="gelu", mlp_ratio=2, slice_num=8)),
    "galerkin_transformer": ((4, 8, 8, 3), dict(
        model_name="galerkin_transformer", n_hidden=32,
        num_encoder_layers=2, n_head=4, dim_feedforward=32,
        fourier_modes_x=3, fourier_modes_y=3, fourier_modes_t=2,
        num_regressor_layers=2, freq_dim=16, encoder_dropout=0.0)),
    "mwt": ((4, 8, 16, 3), dict(model_name="mwt", k=3, alpha=2, c=2, nCZ=2,
                                L=0, base="legendre")),
    "cno": (SI, dict(model_name="cno", N_layers=2, N_res=1, N_res_neck=2,
                     channel_multiplier=8, latent_lift_proj_dim=8,
                     activation="LeakyReLU")),
    "dpot": (SI, dict(model_name="dpot", img_size=16, in_channels=4,
                      out_channels=4, in_timesteps=4, out_timesteps=4,
                      patch_size=4, embed_dim=16, depth=2, n_blocks=4,
                      modes=4, mlp_ratio=1, out_layer_dim=8, normalize=False,
                      act="gelu", time_agg="exp_mlp", n_cls=2)),
    "wdno": ((4, 8, 8, 3), dict(model_name="wdno", dim=8, dim_mults=[1, 2],
                                wave_type="bior1.1", pad_mode="zero",
                                beta_schedule="sigmoid", timesteps=20,
                                sampling_timesteps=4, ddim_sampling_eta=1.0)),
}


def _randomized(tree, seed):
    """Fill every leaf with fresh random values (init batch_stats are
    all-zero/one — a roundtrip over them would not prove key mapping)."""
    r = np.random.default_rng(seed)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = [np.asarray(r.normal(size=np.shape(leaf)), np.float32)
           for leaf in leaves]
    return jax.tree_util.tree_unflatten(treedef, out)


def _assert_tree_equal(got, want, path=""):
    assert type(got) is type(want) or (
        isinstance(got, dict) and isinstance(want, dict)), path
    if isinstance(want, dict):
        assert set(got) == set(want), (
            f"{path}: keys {sorted(got)} != {sorted(want)}")
        for k in want:
            _assert_tree_equal(got[k], want[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            err_msg=path)


@pytest.mark.parametrize("name", sorted(CASES))
def test_export_convert_roundtrip(name):
    si, kw = CASES[name]
    so = si
    bundle = build_model(shapes=(si, so), **kw)
    x = np.zeros((1, *si), np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    params, model_state = bundle.split_variables(variables)
    params = _randomized(params, 1)
    model_state = _randomized(model_state, 2)

    sd = export_torch_state_dict(bundle, params, model_state)
    got_params, got_state = _CONVERTERS[name](sd, params, model_state)

    _assert_tree_equal(got_params, params, f"{name}/params")
    if name == "wdno":
        return  # the converter returns only the backbone (schedule buffers
        # are reference-side constants, validated in the strict-load test)
    want_state = {k: v for k, v in model_state.items() if k == "batch_stats"}
    if want_state:
        _assert_tree_equal(got_state, want_state, f"{name}/state")


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_export_fno_strict_load_forward_parity(tmp_path, rng):
    import sys

    sys.path.insert(0, "/root/reference")
    import torch

    from realpdebench.model.fno import FNO3d as TorchFNO3d

    from realpdebench_tpu.interop.torch_export import save_torch_checkpoint

    si = so = SI
    bundle = build_model(shapes=(si, so), **CASES["fno"][1])
    x = rng.normal(size=(2, *si)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    params, model_state = bundle.split_variables(variables)

    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(path, bundle, params, model_state, iteration=7)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["iteration"] == 7
    tm = TorchFNO3d(modes1=2, modes2=3, modes3=3, n_layers=2, width=8,
                    shape_in=si, shape_out=so)
    tm.load_state_dict(ckpt["model_state_dict"], strict=True)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(bundle.predict(variables, x), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_export_wdno_covers_reference_buffers():
    """The reference WDNO wrapper cannot be instantiated here (ptwt is not
    installed), so check buffer-key completeness against its *source*: every
    ``register_buffer('<name>', ...)`` in reference wdno.py must be present
    in the exported dict (reference wdno.py:221-247), alongside the
    'model.'-prefixed backbone keys."""
    import re

    si, kw = CASES["wdno"]
    bundle = build_model(shapes=(si, si), **kw)
    x = np.zeros((1, *si), np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    params, model_state = bundle.split_variables(variables)
    sd = export_torch_state_dict(bundle, params, model_state)

    src = open("/root/reference/realpdebench/model/wdno.py").read()
    ref_buffers = set(re.findall(r"register_buffer\('(\w+)'", src))
    assert ref_buffers, "reference register_buffer parse failed"
    missing = ref_buffers - set(sd)
    assert not missing, missing
    assert any(k.startswith("model.") for k in sd)
    # buffer values follow the reference formulas (wdno.py:221-247)
    betas = np.asarray(sd["betas"], np.float64)
    ac = np.cumprod(1.0 - betas)
    # exported buffers are f32; the recompute here is f64 — f32-ulp slack
    np.testing.assert_allclose(sd["alphas_cumprod"], ac, rtol=1e-4)
    np.testing.assert_allclose(sd["sqrt_one_minus_alphas_cumprod"],
                               np.sqrt(1 - ac), rtol=1e-4)


def test_export_torch_cli_end_to_end(tmp_path):
    """`realpdebench_tpu export-torch --shape_in ...` — orbax dir → .pth."""
    import sys

    import torch

    from realpdebench_tpu.cli import main as cli_main
    from realpdebench_tpu.config import Config
    from realpdebench_tpu.train.checkpoint import CheckpointManager
    from realpdebench_tpu.train.train_step import (
        TrainState, build_optimizer,
    )

    si, kw = CASES["fno"]
    bundle = build_model(shapes=(si, si), **kw)
    variables = bundle.init(jax.random.PRNGKey(0),
                            np.zeros((1, *si), np.float32))
    params, model_state = bundle.split_variables(variables)
    cfg = Config(lr=1e-4, scheduler="cosine", num_update=10)
    state = TrainState.create(params, model_state, build_optimizer(cfg))
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(3, state)
    mgr.wait()
    mgr.close()

    cfg_path = tmp_path / "fno.yaml"
    cfg_path.write_text(
        "model_name: fno\nmodes1: 2\nmodes2: 3\nmodes3: 3\n"
        "n_layers: 2\nwidth: 8\nlr: 0.0001\nscheduler: cosine\n"
        "num_update: 10\n")
    out = str(tmp_path / "export.pth")
    shp = ",".join(map(str, si))
    with pytest.raises(SystemExit) as e:
        cli_main(["export-torch", "--config", str(cfg_path),
                  "--checkpoint_path", ckpt_dir, "--out", out,
                  "--shape_in", shp, "--shape_out", shp])
    assert e.value.code == 0
    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"]
    assert "spectral_convs.0.weights1" in sd
    assert sd["spectral_convs.0.weights1"].dtype == torch.complex64
    got = sd["fc0.weight"].numpy()
    np.testing.assert_array_equal(
        got, np.asarray(state.params["fc0"]["kernel"]).T)
