"""dpot_l converter roundtrip at FULL Large-backbone shapes.

The reference finetune flagship is the Large DPOT backbone
(`/root/reference/realpdebench/configs/cylinder/dpot_l.yaml`: embed 1536,
depth 24, n_blocks 16, mlp_ratio 4, out_layer_dim 1536, n_cls 12 — 673M
params; downloaded via `utils/dpot_ckpts_dl.py:14-19`). The small-shape
roundtrip (tests/test_torch_export.py) proves the key mapping; this test
proves it at the real 1536-dim/depth-24 tensor shapes, where layout
transposes, block-diagonal AFNO weights, and channel-pad conventions can
break in ways tiny shapes hide.

Params are constructed from the ABSTRACT tree (jax.eval_shape over init +
random fill) so no 673M-param forward pass runs on the test CPU — the
roundtrip itself is pure layout work (~11 GB RAM peak, ~1 min).
"""

import jax
import jax.numpy as jnp
import numpy as np

from realpdebench_tpu.interop.torch_convert import _CONVERTERS
from realpdebench_tpu.interop.torch_export import export_torch_state_dict
from realpdebench_tpu.models.registry import build_model

SI = SO = (20, 64, 128, 3)  # cylinder window

L_KW = dict(model_name="dpot", img_size=128, in_channels=4, out_channels=4,
            in_timesteps=20, out_timesteps=20, patch_size=8, embed_dim=1536,
            depth=24, n_blocks=16, modes=32, mlp_ratio=4, out_layer_dim=1536,
            normalize=False, act="gelu", time_agg="exp_mlp", n_cls=12,
            remat=True)


def _randomized_from_abstract(tree, seed):
    r = np.random.default_rng(seed)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = [np.asarray(r.standard_normal(np.shape(leaf)), np.float32)
           for leaf in leaves]
    return jax.tree_util.tree_unflatten(treedef, out)


def test_dpot_l_export_convert_roundtrip_full_shapes():
    bundle = build_model(shapes=(SI, SO), **L_KW)
    v_abs = jax.eval_shape(
        bundle.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, *SI), jnp.float32))
    params_abs, ms_abs = bundle.split_variables(v_abs)

    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params_abs))
    # the reference Large backbone is ~673M params (model_L.pth, 6.11 GB
    # f32+opt — utils/dpot_ckpts_dl.py:14-19); pin the scale so a silently
    # mis-built config cannot pass as "L"
    assert 6.5e8 < n_params < 7.2e8, n_params

    params = _randomized_from_abstract(params_abs, 1)
    model_state = _randomized_from_abstract(ms_abs, 2)

    sd = export_torch_state_dict(bundle, params, model_state)
    got_params, _ = _CONVERTERS["dpot"](sd, params, model_state)

    flat_want = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_got = dict(jax.tree_util.tree_flatten_with_path(got_params)[0])
    assert set(flat_got) == set(flat_want)
    for k, want in flat_want.items():
        got = flat_got[k]
        assert got.shape == want.shape, k
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=str(k))
