"""Galerkin Transformer tests: shapes + torch parity (score-dropout patched
out of the reference — it unconditionally applies F.dropout(p=0.5) even in
eval, layers.py:730-732, which would make the oracle stochastic)."""

import os
import sys

import jax
import numpy as np
import pytest

from realpdebench_tpu.models.registry import build_model

SHAPE_IN = (4, 8, 8, 3)
SHAPE_OUT = (4, 8, 8, 3)
KW = dict(
    model_name="galerkin_transformer", n_hidden=32, num_encoder_layers=2,
    n_head=4, dim_feedforward=32, attention_type="galerkin",
    layer_norm=False, attn_norm=True, norm_eps=1e-7,
    fourier_modes_x=3, fourier_modes_y=3, fourier_modes_t=2,
    num_regressor_layers=2, freq_dim=16, encoder_dropout=0.0,
    xavier_init=1e-2, diagonal_weight=1e-2,
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
    bundle = build_model(shapes=((4, 8, 8, 3), (8, 8, 8, 2)), **KW)
    x = rng.normal(size=(1, 4, 8, 8, 3)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    assert bundle.predict(variables, x).shape == (1, 8, 8, 8, 2)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)
def test_parity_with_reference_torch(rng):
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    import types

    for name in ("torchinfo", "psutil"):  # import-time-only deps of the libs
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                stub = types.ModuleType(name)
                stub.summary = lambda *a, **k: None
                sys.modules[name] = stub
    try:
        from realpdebench.model import galerkin_transformer_libs as libs
    except ImportError as e:
        pytest.skip(f"reference galerkin libs not importable: {e}")
    from realpdebench.model.galerkin_transformer import GalerkinTransformer3d

    # neutralize the reference's always-on functional dropout on attention
    # scores so the oracle is deterministic
    orig_dropout = libs.layers.F.dropout
    libs.layers.F.dropout = lambda x, *a, **k: x
    try:
        torch.manual_seed(0)
        cfg = dict(
            node_feats=3, n_targets=3, shape_in=SHAPE_IN, shape_out=SHAPE_OUT,
            pos_dim=1, n_hidden=32, num_encoder_layers=2, n_head=4,
            dim_feedforward=32, attention_type="galerkin", xavier_init=1e-2,
            diagonal_weight=1e-2, symmetric_init=False, layer_norm=False,
            attn_norm=True, norm_eps=1e-7, batch_norm=False,
            return_attn_weight=False, return_latent=False,
            decoder_type="ifft2", spacial_dim=3, spacial_fc=True,
            freq_dim=16, num_regressor_layers=2, fourier_modes_x=3,
            fourier_modes_y=3, fourier_modes_t=2, regressor_activation="silu",
            dropout=0.0, encoder_dropout=0.0, ffn_dropout=0.0,
            decoder_dropout=0.0, downscaler_dropout=0.0, upscaler_dropout=0.0,
            feat_extract_type=None, upsample_mode="interp",
            downsample_mode="interp", num_feat_layers=0, last_activation=True,
            boundary_condition=None, debug=False,
        )
        tm = GalerkinTransformer3d(**cfg).eval()
    finally:
        libs.layers.F.dropout = orig_dropout
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    bundle = build_model(shapes=(SHAPE_IN, SHAPE_OUT), **KW)
    x = rng.normal(size=(2, *SHAPE_IN)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    batch_stats = {}

    params["downscaler"] = {
        "kernel": sd["downscaler.id.weight"].T, "bias": sd["downscaler.id.bias"]
    }
    n_head, d_k = 4, 8
    for i in range(2):
        enc = params[f"encoder_{i}"]
        pre = f"encoder_layers.{i}"
        for dst, src in (("q", 0), ("k", 1), ("v", 2)):
            enc["attn"][dst] = {
                "kernel": sd[f"{pre}.attn.linears.{src}.weight"].T,
                "bias": sd[f"{pre}.attn.linears.{src}.bias"],
            }
        for which in ("K", "V"):
            enc["attn"][f"norm_{which}"] = {
                "scale": np.stack([
                    sd[f"{pre}.attn.norm_{which}.{h}.weight"] for h in range(n_head)
                ]),
                "bias": np.stack([
                    sd[f"{pre}.attn.norm_{which}.{h}.bias"] for h in range(n_head)
                ]),
            }
        enc["ff1"] = {"kernel": sd[f"{pre}.ff.lr1.weight"].T,
                      "bias": sd[f"{pre}.ff.lr1.bias"]}
        enc["ff2"] = {"kernel": sd[f"{pre}.ff.lr2.weight"].T,
                      "bias": sd[f"{pre}.ff.lr2.bias"]}

    reg = params["regressor"]
    reg["fc"] = {"kernel": sd["regressor.fc.weight"].T,
                 "bias": sd["regressor.fc.bias"]}
    bs_reg = {}
    for i in range(2):
        w = np.stack([
            sd[f"regressor.spectral_conv.{i}.weights{k}"] for k in (1, 2, 3, 4)
        ]).transpose(0, 3, 4, 5, 1, 2)  # channels-minor storage
        reg[f"spectral_{i}"] = {
            "w_real": w.real.astype(np.float32),
            "w_imag": w.imag.astype(np.float32),
        }
        cw = sd[f"regressor.convs.{i}.weight"][:, :, 0, 0, 0]
        reg[f"pointwise_{i}"] = {
            "kernel": cw.T, "bias": sd[f"regressor.convs.{i}.bias"]
        }
        reg[f"bn_{i}"] = {
            "scale": sd[f"regressor.bns.{i}.weight"],
            "bias": sd[f"regressor.bns.{i}.bias"],
        }
        bs_reg[f"bn_{i}"] = {
            "mean": sd[f"regressor.bns.{i}.running_mean"],
            "var": sd[f"regressor.bns.{i}.running_var"],
        }
    reg["regressor1"] = {"kernel": sd["regressor.regressor1.weight"].T,
                         "bias": sd["regressor.regressor1.bias"]}
    reg["regressor2"] = {"kernel": sd["regressor.regressor2.weight"].T,
                         "bias": sd["regressor.regressor2.bias"]}
    batch_stats["regressor"] = bs_reg

    variables = {"params": params, "batch_stats": batch_stats}
    got = np.asarray(bundle.predict(variables, x))

    libs.layers.F.dropout = lambda x, *a, **k: x
    try:
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
    finally:
        libs.layers.F.dropout = orig_dropout
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_reference_eval_dropout_compat_flag(rng):
    """`reference_eval_dropout: true` reproduces the reference's always-on
    stochastic score dropout at eval (layers.py:730-732 calls F.dropout with
    training defaults even in model.eval()). Bit-parity with torch's RNG is
    impossible; the semantic contract is: (a) eval is stochastic across rng
    keys, (b) deterministic for a fixed key, (c) unbiased — the mean over
    keys approaches the dropout-free output (inverted scaling), and (d) the
    default flag-off path stays deterministic."""
    x = rng.normal(size=(1, *SHAPE_IN)).astype(np.float32)

    base = build_model(shapes=(SHAPE_IN, SHAPE_OUT), **KW)
    variables = base.init(jax.random.PRNGKey(0), x)
    clean = np.asarray(base.predict(variables, x, rng=jax.random.PRNGKey(7)))

    compat = build_model(shapes=(SHAPE_IN, SHAPE_OUT),
                         **{**KW, "reference_eval_dropout": True})
    # identical params: same init key and identical module param structure
    v2 = compat.init(jax.random.PRNGKey(0), x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables, v2,
    )

    p1 = np.asarray(compat.predict(v2, x, rng=jax.random.PRNGKey(1)))
    p1b = np.asarray(compat.predict(v2, x, rng=jax.random.PRNGKey(1)))
    p2 = np.asarray(compat.predict(v2, x, rng=jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(p1, p1b)        # (b) fixed key → same
    assert np.abs(p1 - p2).max() > 1e-6           # (a) stochastic across keys
    assert np.abs(p1 - clean).max() > 1e-6        # dropout actually active

    mean = np.mean(
        [np.asarray(compat.predict(v2, x, rng=jax.random.PRNGKey(k)))
         for k in range(40)], axis=0)
    # (c) unbiasedness: mean over keys contracts toward the clean output
    assert np.abs(mean - clean).mean() < 0.5 * np.abs(p1 - clean).mean()

    # (d) default stays deterministic even when an rng is supplied
    d1 = np.asarray(base.predict(variables, x, rng=jax.random.PRNGKey(1)))
    d2 = np.asarray(base.predict(variables, x, rng=jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(d1, d2)
