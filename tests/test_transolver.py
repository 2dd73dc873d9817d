"""Transolver tests: shapes + numerical parity vs reference torch model."""

import os
import sys

import jax
import numpy as np
import pytest

from realpdebench_tpu.models.registry import build_model

# tiny mesh: T=4, H=8, W=8 → model mesh (H,W,D)=(8,8,4) so H*W*D = N
SHAPE_IN = (4, 8, 8, 3)
SHAPE_OUT = (4, 8, 8, 3)
KW = dict(
    model_name="transolver", space_dim=3, n_layers=2, n_hidden=16, n_head=2,
    H=8, W=8, D=4, fun_dim=0, out_dim=3, ref=4, dropout=0.0, act="gelu",
    mlp_ratio=2, slice_num=8,
)


def test_forward_shape(rng):
    bundle = build_model(shapes=(SHAPE_IN, SHAPE_OUT), **KW)
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    out = bundle.predict(variables, x)
    assert out.shape == (2, *SHAPE_OUT)
    assert np.isfinite(np.asarray(out)).all()


def test_bf16_compute_close_to_f32(rng):
    from conftest import assert_bf16_close

    assert_bf16_close(KW, (SHAPE_IN, SHAPE_OUT), rng)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)
def test_parity_with_reference_torch(rng):
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    # the reference imports timm only for trunc_normal_; shim it if absent
    if "timm" not in sys.modules:
        import types

        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = models
        models.layers = layers
        sys.modules.update(
            {"timm": timm, "timm.models": models, "timm.models.layers": layers}
        )
    try:
        from realpdebench.model.TRANSOLVER_libs.Transolver_Structured_Mesh_3D import (
            Model as TorchTransolver,
        )
    except ImportError as e:
        pytest.skip(f"reference transolver not importable: {e}")

    torch.manual_seed(0)
    tm = TorchTransolver(
        space_dim=3, n_layers=2, n_hidden=16, n_head=2, H=8, W=8, D=4,
        fun_dim=0, out_dim=3, ref=4, dropout=0.0, act="gelu", mlp_ratio=2,
        slice_num=8, Time_Input=False, unified_pos=False,
    ).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    bundle = build_model(shapes=(SHAPE_IN, SHAPE_OUT), **KW)
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    def dense(dst_tree, dst, src, bias=True):
        dst_tree[dst]["kernel"] = sd[f"{src}.weight"].T
        if bias:
            dst_tree[dst]["bias"] = sd[f"{src}.bias"]

    params["placeholder"] = sd["placeholder"]
    dense(params["preprocess"], "Dense_0", "preprocess.linear_pre.0")
    dense(params["preprocess"], "Dense_1", "preprocess.linear_post")

    for i in range(2):
        blk = params[f"block_{i}"]
        pre = f"blocks.{i}"
        for ln in ("ln_1", "ln_2") + (("ln_3",) if i == 1 else ()):
            blk[ln] = {"scale": sd[f"{pre}.{ln}.weight"],
                       "bias": sd[f"{pre}.{ln}.bias"]}
        a = blk["attn"]
        a["temperature"] = sd[f"{pre}.Attn.temperature"]
        for conv in ("in_project_fx", "in_project_x"):
            a[conv]["kernel"] = sd[f"{pre}.Attn.{conv}.weight"].transpose(
                2, 3, 4, 1, 0
            )
            a[conv]["bias"] = sd[f"{pre}.Attn.{conv}.bias"]
        dense(a, "in_project_slice", f"{pre}.Attn.in_project_slice")
        for qkv in ("to_q", "to_k", "to_v"):
            a[qkv]["kernel"] = sd[f"{pre}.Attn.{qkv}.weight"].T
        dense(a, "to_out", f"{pre}.Attn.to_out.0")
        dense(blk["mlp"], "Dense_0", f"{pre}.mlp.linear_pre.0")
        dense(blk["mlp"], "Dense_1", f"{pre}.mlp.linear_post")
        if i == 1:
            dense(blk, "mlp2", f"{pre}.mlp2")

    variables = {"params": params}
    got = np.asarray(bundle.predict(variables, x))
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
