"""CNO3d tests: shapes + torch parity (plain-LeakyReLU path, as shipped in
every benchmark config — configs/*/cno.yaml activation: 'LeakyReLU')."""

import os
import sys

import jax
import numpy as np
import pytest

from realpdebench_tpu.models.registry import build_model

SHAPE_IN = (4, 16, 16, 3)
SHAPE_OUT = (4, 16, 16, 3)
KW = dict(
    model_name="cno", N_layers=2, N_res=1, N_res_neck=2,
    channel_multiplier=8, latent_lift_proj_dim=8, activation="LeakyReLU",
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


def test_time_upsampling(rng):
    bundle = build_model(shapes=((4, 16, 16, 3), (8, 16, 16, 3)), **KW)
    x = rng.normal(size=(1, 4, 16, 16, 3)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    out = bundle.predict(variables, x)
    assert out.shape == (1, 8, 16, 16, 3)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)
def test_parity_with_reference_torch(rng):
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    if "pkg_resources" not in sys.modules:  # removed in modern setuptools
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            import types

            from packaging.version import parse as parse_version

            stub = types.ModuleType("pkg_resources")
            stub.parse_version = parse_version
            sys.modules["pkg_resources"] = stub
    try:
        from realpdebench.model.cno import CNO3d as TorchCNO3d
    except ImportError as e:
        pytest.skip(f"reference CNO not importable: {e}")

    torch.manual_seed(0)
    tm = TorchCNO3d(
        in_dim=3, in_size=16, N_layers=2, N_res=1, N_res_neck=2,
        channel_multiplier=8, latent_lift_proj_dim=8, out_dim=3,
        out_dim_mult=1, activation="LeakyReLU",
    ).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    bundle = build_model(shapes=(SHAPE_IN, SHAPE_OUT), **KW)
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    bs = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def conv(tkey):
        w = sd[f"{tkey}.weight"]
        return {"kernel": w.transpose(2, 3, 4, 1, 0), "bias": sd[f"{tkey}.bias"]}

    def put_bn(tree_p, tree_b, name, tkey):
        tree_p[name] = {"scale": sd[f"{tkey}.weight"], "bias": sd[f"{tkey}.bias"]}
        tree_b[name] = {"mean": sd[f"{tkey}.running_mean"],
                        "var": sd[f"{tkey}.running_var"]}

    def cno_block(dst, tkey, has_bn=True):
        p = params
        b = bs
        for part in dst[:-1]:
            p = p[part]
            b = b.setdefault(part, {}) if isinstance(b, dict) else b
        name = dst[-1]
        p[name]["convolution"] = conv(f"{tkey}.convolution")
        if has_bn:
            put_bn(p[name], b.setdefault(name, {}), "bn", f"{tkey}.batch_norm")

    # lift / project (batch_norm=False inside)
    for dst, tkey in (("lift", "lift"), ("project", "project")):
        params[dst]["inter"]["convolution"] = conv(f"{tkey}.inter_CNOBlock.convolution")
        params[dst]["convolution"] = conv(f"{tkey}.convolution")

    # encoder / decoder / ed_expansion / decoder_inv blocks
    for i in range(2):
        cno_block(("encoder_%d" % i,), f"encoder.{i}")
        cno_block(("decoder_%d" % i,), f"decoder.{i}")
        cno_block(("decoder_inv_%d" % i,), f"decoder_inv.{i}")
    for i in range(3):
        cno_block(("ed_expansion_%d" % i,), f"ED_expansion.{i}")

    # residual blocks: level resnets then neck resnets, construction order
    def res_block(name, tkey):
        params[name]["convolution1"] = conv(f"{tkey}.convolution1")
        params[name]["convolution2"] = conv(f"{tkey}.convolution2")
        put_bn(params[name], bs.setdefault(name, {}), "bn1", f"{tkey}.batch_norm1")
        put_bn(params[name], bs.setdefault(name, {}), "bn2", f"{tkey}.batch_norm2")

    res_block("res_0_0", "res_nets.0")
    res_block("res_1_0", "res_nets.1")
    res_block("res_neck_0", "res_nets.2")
    res_block("res_neck_1", "res_nets.3")

    variables = {"params": params, "batch_stats": bs}
    got = np.asarray(bundle.predict(variables, x))
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)
