"""Unet3d tests: shapes, rotary math, torch parity via the interop converter.

The reference's external deps (rotary_embedding_torch, einops_exts) are not in
this environment; the test shims them with faithful minimal implementations
(the rotary shim reproduces rotary_embedding_torch's interleaved 'lang'
frequencies, which is also what models/unet.py implements).
"""

import os
import sys
import types

import jax
import numpy as np
import pytest

from realpdebench_tpu.models.registry import build_model

SHAPE_IN = (4, 16, 16, 3)
SHAPE_OUT = (4, 16, 16, 3)
KW = dict(model_name="unet", dim_mults=[1, 2])


def _bundle(shape_in=SHAPE_IN, shape_out=SHAPE_OUT):
    return build_model(shapes=(shape_in, shape_out), **KW)


def test_forward_shape(rng):
    bundle = _bundle()
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    out = bundle.predict(variables, x)
    assert out.shape == (2, *SHAPE_OUT)
    assert np.isfinite(np.asarray(out)).all()


def test_bf16_compute_close_to_f32(rng):
    from conftest import assert_bf16_close

    assert_bf16_close(KW, (SHAPE_IN, SHAPE_OUT), rng)


def test_time_upsampling(rng):
    bundle = _bundle(shape_in=(4, 16, 16, 3), shape_out=(8, 16, 16, 2))
    x = rng.normal(size=(1, 4, 16, 16, 3)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    out = bundle.predict(variables, x)
    assert out.shape == (1, 8, 16, 16, 2)


def _install_shims(torch):
    """Minimal stand-ins for rotary_embedding_torch and einops_exts."""
    from einops import rearrange

    if "rotary_embedding_torch" not in sys.modules:
        mod = types.ModuleType("rotary_embedding_torch")

        class RotaryEmbedding:
            def __init__(self, dim, theta=10000.0):
                self.inv_freq = 1.0 / (
                    theta ** (torch.arange(0, dim, 2).float() / dim)
                )

            def rotate_queries_or_keys(self, t, seq_dim=-2):
                n = t.shape[seq_dim]
                freqs = torch.einsum(
                    "i,j->ij", torch.arange(n).float(), self.inv_freq
                )
                freqs = torch.repeat_interleave(freqs, 2, dim=-1)
                rot_dim = freqs.shape[-1]
                t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
                x1 = t_rot[..., 0::2]
                x2 = t_rot[..., 1::2]
                rotated = torch.stack((-x2, x1), dim=-1).reshape(t_rot.shape)
                out = t_rot * freqs.cos() + rotated * freqs.sin()
                return torch.cat((out, t_pass), dim=-1)

        mod.RotaryEmbedding = RotaryEmbedding
        sys.modules["rotary_embedding_torch"] = mod

    if "einops_exts" not in sys.modules:
        mod = types.ModuleType("einops_exts")
        mod.check_shape = lambda t, pattern, **kw: t
        mod.rearrange_many = lambda ts, pattern, **kw: [
            rearrange(t, pattern, **kw) for t in ts
        ]
        sys.modules["einops_exts"] = mod

    # torchvision/PIL imports at unet.py module top
    for name in ("torchvision", "PIL"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                stub = types.ModuleType(name)
                if name == "torchvision":
                    stub.transforms = types.SimpleNamespace(T=None)
                    stub.utils = types.SimpleNamespace()
                    sys.modules["torchvision"] = stub
                    sys.modules["torchvision.transforms"] = types.ModuleType(
                        "torchvision.transforms"
                    )
                    sys.modules["torchvision.utils"] = types.ModuleType(
                        "torchvision.utils"
                    )
                else:
                    stub.Image = types.SimpleNamespace()
                    sys.modules["PIL"] = stub


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)
def test_parity_with_reference_torch(rng):
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    _install_shims(torch)
    from realpdebench.model.unet import Unet3d as TorchUnet3d

    from realpdebench_tpu.interop.torch_convert import convert_unet

    torch.manual_seed(0)
    tm = TorchUnet3d(
        dim=SHAPE_IN[1], out_channels=SHAPE_OUT[-1], dim_mults=(1, 2),
        channels=SHAPE_IN[-1], in_time=SHAPE_IN[0], out_time=SHAPE_OUT[0],
    ).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    bundle = _bundle()
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    params, _ = convert_unet(sd, variables["params"], {})

    # tree structures must agree
    want_keys = jax.tree_util.tree_structure(variables["params"])
    got_keys = jax.tree_util.tree_structure(params)
    assert want_keys == got_keys, f"\n{want_keys}\nvs\n{got_keys}"

    got = np.asarray(bundle.predict({"params": params}, x))
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)
