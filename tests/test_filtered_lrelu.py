"""Filtered-lrelu / upfirdn2d tests vs the reference pure-PyTorch fallbacks
(`CNO_libs/local_torch_utils/ops/{upfirdn2d,filtered_lrelu}.py` `_ref`
implementations — the stated functional spec, SURVEY §7.3)."""

import os
import sys
import types

import numpy as np
import pytest

from realpdebench_tpu.ops.filtered_lrelu import (
    design_lowpass_filter,
    filtered_lrelu_2d,
    filtered_lrelu_3d,
    lrelu_geometry,
    upfirdn2d,
)


def _import_ref():
    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            from packaging.version import parse as parse_version

            stub = types.ModuleType("pkg_resources")
            stub.parse_version = parse_version
            sys.modules["pkg_resources"] = stub
    from realpdebench.model.CNO_libs.local_torch_utils.ops import (
        filtered_lrelu as ref_fl,
        upfirdn2d as ref_up,
    )

    return torch, ref_up, ref_fl


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)
@pytest.mark.parametrize(
    "up,down,padding",
    [(1, 1, (0, 0, 0, 0)), (2, 1, (3, 2, 3, 2)), (1, 2, (2, 2, 2, 2)),
     (2, 2, (5, 4, 5, 4)), (2, 1, (-1, 3, 2, -2))],
)
def test_upfirdn2d_matches_reference(rng, up, down, padding):
    torch, ref_up, _ = _import_ref()
    x = rng.normal(size=(2, 12, 14, 3)).astype(np.float32)
    f = design_lowpass_filter(6, 0.35, 0.2, 2.0)

    got = np.asarray(
        upfirdn2d(x, f, up=up, down=down, padding=padding, gain=up**2)
    )
    with torch.no_grad():
        want = ref_up._upfirdn2d_ref(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(np.asarray(f)),
            up=up, down=down,
            padding=list(padding), gain=up**2,
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)
def test_filtered_lrelu_matches_reference(rng):
    torch, _, ref_fl = _import_ref()
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    b = rng.normal(size=(4,)).astype(np.float32)
    up, down = 2, 2
    fu = design_lowpass_filter(12, 0.4, 0.3, 4.0)
    fd = design_lowpass_filter(12, 0.4, 0.3, 4.0)
    padding = (11, 11, 11, 11)

    got = np.asarray(filtered_lrelu_2d(x, fu, fd, b, up, down, padding))
    with torch.no_grad():
        want = ref_fl._filtered_lrelu_ref(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            fu=torch.from_numpy(np.asarray(fu)),
            fd=torch.from_numpy(np.asarray(fd)),
            b=torch.from_numpy(b), up=up, down=down,
            padding=list(padding),
        ).permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lrelu_geometry_resampling():
    # CNO D-block 16 → 8: output spatial size must be exactly out_size
    up, down, fu, fd, padding = lrelu_geometry(
        16, 8, 16 / 2.0001, 8 / 2.0001,
        0.8 * 16 - 16 / 2.0001, 0.8 * 8 - 8 / 2.0001,
    )
    x = np.random.default_rng(0).normal(size=(1, 4, 16, 16, 2)).astype(
        np.float32
    )
    out = np.asarray(filtered_lrelu_3d(
        x, in_size=16, out_size=8, in_cutoff=16 / 2.0001,
        out_cutoff=8 / 2.0001, in_half_width=0.8 * 16 - 16 / 2.0001,
        out_half_width=0.8 * 8 - 8 / 2.0001,
    ))
    assert out.shape == (1, 4, 8, 8, 2)
    assert np.isfinite(out).all()


def test_cno_filtered_path_forward(rng):
    """CNO3d with activation='lrelu' (the anti-aliased multi-resolution path
    the reference cannot run on 3-D data) produces the right shapes."""
    import jax

    from realpdebench_tpu.models.registry import build_model

    bundle = build_model(
        shapes=((4, 16, 16, 3), (4, 16, 16, 3)), model_name="cno",
        N_layers=2, N_res=1, N_res_neck=1, channel_multiplier=8,
        latent_lift_proj_dim=8, activation="lrelu",
    )
    x = rng.normal(size=(1, 4, 16, 16, 3)).astype(np.float32)
    variables = bundle.init(jax.random.PRNGKey(0), x)
    out = bundle.predict(variables, x)
    assert out.shape == (1, 4, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
