"""MWT tests: filter-bank exactness vs reference, model shapes, torch parity."""

import os
import sys

import jax
import numpy as np
import pytest

from realpdebench_tpu.models.registry import build_model
from realpdebench_tpu.ops.multiwavelet import cz_matrices, get_filter

# tiny: T=4, H=8, W=16 (rectangular to exercise shape_multiplier=2)
SHAPE_IN = (4, 8, 16, 3)
SHAPE_OUT = (4, 8, 16, 3)
KW = dict(model_name="mwt", k=3, alpha=2, c=2, nCZ=2, L=0, base="legendre")


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)
@pytest.mark.parametrize("base,k", [("legendre", 3), ("legendre", 4),
                                    ("chebyshev", 3), ("chebyshev", 4)])
def test_filters_match_reference(base, k):
    sys.path.insert(0, "/root/reference")
    pytest.importorskip("torch")
    from realpdebench.model.MWT_libs.utils_MWT import get_filter as ref_get_filter

    ref = ref_get_filter(base, k)
    got = get_filter(base, k)
    for name, r, g in zip(("H0", "H1", "G0", "G1", "PHI0", "PHI1"), ref, got):
        np.testing.assert_allclose(g, r, atol=1e-9, err_msg=f"{base} {k} {name}")


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
    from realpdebench.model.MWT_libs.models import MWT3d as TorchMWT3d

    torch.manual_seed(0)
    tm = TorchMWT3d(
        k=3, alpha=2, c=2, nCZ=2, L=0, base="legendre",
        shape_in=SHAPE_IN, shape_out=SHAPE_OUT,
    ).eval()
    sd = {k_: v.numpy() for k_, v in tm.state_dict().items()}

    bundle = build_model(shapes=(SHAPE_IN, SHAPE_OUT), **KW)
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    def dense(tree, name, tkey):
        tree[name] = {"kernel": sd[f"{tkey}.weight"].T,
                      "bias": sd[f"{tkey}.bias"]}

    dense(params, "Lk", "Lk")
    dense(params, "Lc0", "Lc0")
    dense(params, "Lc1", "Lc1")
    for i in range(2):
        cz = params[f"cz_{i}"]
        pre = f"MWT_CZ.{i}"
        w = np.stack([sd[f"{pre}.A.weights{j}"] for j in (1, 2, 3, 4)]
                     ).transpose(0, 3, 4, 5, 1, 2)  # channels-minor storage
        cz["A"]["w_real"] = w.real.astype(np.float32)
        cz["A"]["w_imag"] = w.imag.astype(np.float32)
        dense(cz["A"], "Lo", f"{pre}.A.Lo")
        for mod in ("B", "C"):
            cz[mod]["conv"] = {
                "kernel": sd[f"{pre}.{mod}.conv.0.weight"].transpose(2, 3, 4, 1, 0),
                "bias": sd[f"{pre}.{mod}.conv.0.bias"],
            }
            dense(cz[mod], "Lo", f"{pre}.{mod}.Lo")
        dense(cz, "T0", f"{pre}.T0")

    got = np.asarray(bundle.predict({"params": params}, x))
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_cz_matrices_shapes():
    mats = cz_matrices("legendre", 3)
    assert mats[0].shape == (36, 9)  # ec_s: 4k² × k²
    assert mats[2].shape == (18, 9)  # rc_ee: 2k² × k²
