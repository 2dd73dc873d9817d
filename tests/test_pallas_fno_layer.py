"""Fused FNO-layer kernel parity: pallas (interpret mode on CPU) vs the
pure-jnp oracle built on ops/spectral.truncated_spectral_conv3d_dft (which is
itself golden-tested against rfftn/irfftn and the torch reference).

Layout under test: packed lanes (w-parity, channel) — x is
[B*Tp, Hp*(Wp//2), 2C]; per-(parity, channel) BN statistics [2, 2C] fold to
per-channel by summing the halves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realpdebench_tpu.ops.pallas.fno_layer import (
    flatten_cw,
    fused_fno_layer,
    reference_fused_fno_layer,
    unflatten_cw,
)

# small but non-square dims to catch axis mixups; Wp must be even
B, Tp, Hp, Wp, C = 2, 6, 10, 12, 8
M1, M2, M3 = 2, 3, 4
DIMS = (B, Tp, Hp, Wp, C)
NPOS = B * Tp * Hp * Wp


def _fold(stats):
    return stats[:, :C] + stats[:, C:]


def _inputs(seed=0):
    r = np.random.default_rng(seed)
    x = r.normal(size=(B * Tp, Hp * (Wp // 2), 2 * C)).astype(np.float32)
    a = (1.0 + 0.1 * r.normal(size=(1, C))).astype(np.float32)
    b = (0.1 * r.normal(size=(1, C))).astype(np.float32)
    wr = (0.2 * r.normal(size=(4, M1, M2, M3, C, C))).astype(np.float32)
    wi = (0.2 * r.normal(size=(4, M1, M2, M3, C, C))).astype(np.float32)
    wp = (0.3 * r.normal(size=(C, C))).astype(np.float32)
    bp = (0.1 * r.normal(size=(1, C))).astype(np.float32)
    return tuple(map(jnp.asarray, (x, a, b, wr, wi, wp, bp)))


def test_flatten_roundtrip(rng):
    x5 = rng.normal(size=(B, Tp, Hp, Wp, C)).astype(np.float32)
    flat = flatten_cw(jnp.asarray(x5))
    assert flat.shape == (B * Tp, Hp * (Wp // 2), 2 * C)
    back = unflatten_cw(flat, *DIMS)
    np.testing.assert_array_equal(np.asarray(back), x5)


@pytest.mark.parametrize("act", ["none", "tanh", "exact"])
def test_fused_layer_forward_parity(act):
    args = _inputs()
    s, stats = fused_fno_layer(*args, dims=DIMS, act=act, interpret=True)
    s_ref, stats_ref = reference_fused_fno_layer(*args, dims=DIMS, act=act)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(_fold(stats)),
                               np.asarray(_fold(stats_ref)),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("act", ["none", "tanh"])
def test_fused_layer_grad_parity(act):
    args = _inputs(seed=1)

    def loss(fn):
        def run(*a):
            s, stats = fn(*a)
            ch = _fold(stats)
            mean = ch[0] / NPOS
            var = ch[1] / NPOS - mean**2
            return jnp.sum(s * s) * 1e-3 + jnp.sum(var) + jnp.sum(mean**2)
        return run

    fused = loss(lambda *a: fused_fno_layer(*a, dims=DIMS, act=act,
                                            interpret=True))
    ref = loss(lambda *a: reference_fused_fno_layer(*a, dims=DIMS, act=act))
    gf = jax.grad(fused, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    gr = jax.grad(ref, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    names = ["x", "a", "b", "w_real", "w_imag", "wp", "bp"]
    for n, f, r in zip(names, gf, gr):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), rtol=2e-3, atol=2e-3,
            err_msg=f"grad mismatch for {n}")


def test_fused_layer_chained_two_layers():
    """Two chained fused layers with BN folding between them — the actual
    usage pattern inside FNO3d (folded stats of layer 0 become the input
    affine of layer 1)."""
    args = _inputs(seed=2)
    x, a, b, wr, wi, wp, bp = args
    gamma = jnp.asarray(np.random.default_rng(3).normal(size=(C,)) * 0.1 + 1,
                        jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)

    def chain(l1, l2):
        def run(x):
            s, stats = l1(x, a, b, wr, wi, wp, bp)
            ch = _fold(stats)
            mean = ch[0] / NPOS
            var = ch[1] / NPOS - mean**2
            a2 = (gamma / jnp.sqrt(var + 1e-5))[None]
            b2 = (beta - mean * a2[0])[None]
            s2, _ = l2(s, a2, b2, wr, wi, wp, bp)
            return jnp.mean(s2**2), s2
        return run

    f1 = lambda *q: fused_fno_layer(*q, dims=DIMS, act="none", interpret=True)
    f2 = lambda *q: fused_fno_layer(*q, dims=DIMS, act="tanh", interpret=True)
    r1 = lambda *q: reference_fused_fno_layer(*q, dims=DIMS, act="none")
    r2 = lambda *q: reference_fused_fno_layer(*q, dims=DIMS, act="tanh")

    (lf, sf), gx_f = jax.value_and_grad(chain(f1, f2), has_aux=True)(x)
    (lr, sr), gx_r = jax.value_and_grad(chain(r1, r2), has_aux=True)(x)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sf), np.asarray(sr),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=2e-3, atol=2e-3)


def test_fno3d_fused_path_matches_unfused():
    """Full-module parity: FNO3d with use_pallas=True (interpret) against the
    reference XLA path — identical param tree, matching train-mode outputs,
    BN running-stat updates, and eval-mode outputs."""
    from realpdebench_tpu.models.fno import FNO3d

    si = so = (4, 12, 12, 3)
    kw = dict(modes1=2, modes2=3, modes3=3, n_layers=2, width=8,
              shape_in=si, shape_out=so, padding=6)
    m_ref = FNO3d(**kw, use_pallas=False, remat=False)
    m_fus = FNO3d(**kw, use_pallas=True, pallas_interpret=True)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(2, *si)).astype(np.float32))
    v = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    v2 = m_fus.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))

    o1, upd1 = m_ref.apply(v, x, True, mutable=["batch_stats"])
    o2, upd2 = m_fus.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-3, atol=2e-3)
    for lyr in ("layer_0", "layer_1"):
        for stat in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(upd1["batch_stats"][lyr]["bn"][stat]),
                np.asarray(upd2["batch_stats"][lyr]["bn"][stat]),
                rtol=2e-3, atol=2e-4, err_msg=f"{lyr}/{stat}")

    e1 = m_ref.apply(v, x, False)
    e2 = m_fus.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               rtol=2e-3, atol=2e-3)


def test_fno3d_fused_grad_matches_unfused():
    """Gradient parity of the full module (train mode), fused vs unfused."""
    from realpdebench_tpu.models.fno import FNO3d

    si = so = (4, 12, 12, 3)
    kw = dict(modes1=2, modes2=3, modes3=3, n_layers=2, width=8,
              shape_in=si, shape_out=so, padding=6)
    m_ref = FNO3d(**kw, use_pallas=False, remat=False)
    m_fus = FNO3d(**kw, use_pallas=True, pallas_interpret=True)
    r = np.random.default_rng(1)
    x = jnp.asarray(r.normal(size=(2, *si)).astype(np.float32))
    y = jnp.asarray(r.normal(size=(2, *si)).astype(np.float32))
    v = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    params = v["params"]
    bs = {"batch_stats": v["batch_stats"]}

    def loss(m):
        def f(p):
            out, _ = m.apply({"params": p, **bs}, x, True,
                             mutable=["batch_stats"])
            return jnp.mean((out - y) ** 2)
        return f

    l1, g1 = jax.value_and_grad(loss(m_ref))(params)
    l2, g2 = jax.value_and_grad(loss(m_fus))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-3)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat2[path]), rtol=5e-3, atol=5e-3,
            err_msg=str(path))


def test_fused_layer_bf16_mxu_parity():
    """bf16 layer IO selects bf16 MXU multiplies (f32 accumulation) inside
    the kernels; outputs must track the f32 oracle to bf16-class tolerance."""
    args = _inputs()
    x16 = args[0].astype(jnp.bfloat16)
    s, stats = fused_fno_layer(x16, *args[1:], dims=DIMS, act="tanh",
                               interpret=True)
    assert s.dtype == jnp.bfloat16
    s_ref, stats_ref = reference_fused_fno_layer(*args, dims=DIMS, act="tanh")
    scale = float(np.abs(np.asarray(s_ref)).max())
    np.testing.assert_allclose(
        np.asarray(s, np.float32), np.asarray(s_ref),
        atol=0.05 * scale, rtol=0.05)
    f = np.asarray(_fold(stats))
    f_ref = np.asarray(_fold(stats_ref))
    np.testing.assert_allclose(f, f_ref, rtol=0.05,
                               atol=0.05 * np.abs(f_ref).max())


def test_mid_spectral_bf16_flag_close(monkeypatch):
    """REALPDEBENCH_FNO_MID=bf16 (opt-in) runs the mid einsums in bf16 with
    f32 accumulation — output must track the f32 path closely."""
    from realpdebench_tpu.ops.pallas.fno_layer import mid_spectral

    r = np.random.default_rng(3)
    y = jnp.asarray(r.normal(size=(B * Tp, 2 * M2 * M3, 2 * C)), jnp.float32)
    wr = jnp.asarray(0.2 * r.normal(size=(4, M1, M2, M3, C, C)), jnp.float32)
    wi = jnp.asarray(0.2 * r.normal(size=(4, M1, M2, M3, C, C)), jnp.float32)
    want = np.asarray(mid_spectral(y, wr, wi, B, Tp))
    monkeypatch.setenv("REALPDEBENCH_FNO_MID", "bf16")
    got = np.asarray(mid_spectral(y, wr, wi, B, Tp))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 3e-2, rel


def test_mid_spectral_block_corner_parity(monkeypatch):
    """The default 2x2 block-complex corner GEMM is the same math as the
    split real/imag einsums (REALPDEBENCH_FNO_CORNER=split) up to float
    rounding, including gradients."""
    from realpdebench_tpu.ops.pallas.fno_layer import mid_spectral

    r = np.random.default_rng(7)
    y = jnp.asarray(r.normal(size=(B * Tp, 2 * M2 * M3, 2 * C)), jnp.float32)
    wr = jnp.asarray(0.2 * r.normal(size=(4, M1, M2, M3, C, C)), jnp.float32)
    wi = jnp.asarray(0.2 * r.normal(size=(4, M1, M2, M3, C, C)), jnp.float32)
    ct = jnp.asarray(r.normal(size=(B * Tp, 2 * M2 * M3, 2 * C)), jnp.float32)

    def run():
        out, vjp = jax.vjp(lambda *a: mid_spectral(*a, B, Tp), y, wr, wi)
        return (np.asarray(out), *(np.asarray(g) for g in vjp(ct)))

    monkeypatch.setenv("REALPDEBENCH_FNO_CORNER", "split")
    want = run()
    monkeypatch.setenv("REALPDEBENCH_FNO_CORNER", "block")
    got = run()
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, rtol=2e-5,
                                   atol=2e-5 * np.abs(w).max())


@pytest.mark.parametrize("mid", ["f32", "bf16"])
def test_corner_gemm_custom_vjp_matches_autodiff(monkeypatch, mid):
    """The corner GEMM's direct dwr/dwi VJP (default) computes the same
    gradients as autodiff through the packed w2
    (REALPDEBENCH_FNO_CORNER_VJP=0) — same contractions, reordered, so
    f32 agrees to float rounding; bf16 differs only in the wgrad dot
    keeping dg in bf16 instead of f32 (~1e-3 rel)."""
    from realpdebench_tpu.ops.pallas.fno_layer import mid_spectral

    r = np.random.default_rng(11)
    y = jnp.asarray(r.normal(size=(B * Tp, 2 * M2 * M3, 2 * C)), jnp.float32)
    wr = jnp.asarray(0.2 * r.normal(size=(4, M1, M2, M3, C, C)), jnp.float32)
    wi = jnp.asarray(0.2 * r.normal(size=(4, M1, M2, M3, C, C)), jnp.float32)
    ct = jnp.asarray(r.normal(size=(B * Tp, 2 * M2 * M3, 2 * C)), jnp.float32)
    monkeypatch.setenv("REALPDEBENCH_FNO_MID", mid)

    def run():
        out, vjp = jax.vjp(lambda *a: mid_spectral(*a, B, Tp), y, wr, wi)
        return (np.asarray(out), *(np.asarray(g) for g in vjp(ct)))

    monkeypatch.setenv("REALPDEBENCH_FNO_CORNER_VJP", "0")
    want = run()
    monkeypatch.setenv("REALPDEBENCH_FNO_CORNER_VJP", "1")
    got = run()
    tol = 2e-5 if mid == "f32" else 6e-3
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, rtol=tol, atol=tol * np.abs(w).max())


# --- aligned (Strategy-B) layout: pre-padded [Hp8*J8, 2C] activations ------

_J = Wp // 2
_HP8, _J8 = -(-Hp // 8) * 8, -(-_J // 8) * 8


def _to_aligned(x):
    x4 = x.reshape(B * Tp, Hp, _J, 2 * C)
    x4 = jnp.pad(x4, ((0, 0), (0, _HP8 - Hp), (0, _J8 - _J), (0, 0)))
    return x4.reshape(B * Tp, _HP8 * _J8, 2 * C)


def _from_aligned(s):
    return s.reshape(B * Tp, _HP8, _J8, 2 * C)[:, :Hp, :_J].reshape(
        B * Tp, Hp * _J, 2 * C)


@pytest.mark.parametrize("act", ["none", "tanh"])
def test_fused_layer_aligned_forward_parity(act):
    """aligned=True keeps activations 8-aligned in HBM; valid rows and the
    (mask-corrected) BN statistics must match the unaligned oracle."""
    args = _inputs(seed=4)
    s_al, stats_al = fused_fno_layer(
        _to_aligned(args[0]), *args[1:], dims=DIMS, act=act,
        interpret=True, aligned=True)
    s_ref, stats_ref = reference_fused_fno_layer(*args, dims=DIMS, act=act)
    np.testing.assert_allclose(np.asarray(_from_aligned(s_al)),
                               np.asarray(s_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(_fold(stats_al)),
                               np.asarray(_fold(stats_ref)),
                               rtol=1e-4, atol=1e-3)


def test_fused_layer_aligned_grad_parity():
    """Gradients through the aligned layer (wrapped in the same pad/slice
    the model applies) match the reference — exercises the ds_eff row mask
    in K12B and the zero-row annihilation argument in K2A."""
    args = _inputs(seed=5)

    def loss(fn):
        def run(*a):
            s, stats = fn(*a)
            ch = _fold(stats)
            mean = ch[0] / NPOS
            var = ch[1] / NPOS - mean**2
            return jnp.sum(s * s) * 1e-3 + jnp.sum(var) + jnp.sum(mean**2)
        return run

    def aligned_layer(x, *rest):
        s, stats = fused_fno_layer(_to_aligned(x), *rest, dims=DIMS,
                                   act="tanh", interpret=True, aligned=True)
        return _from_aligned(s), stats

    gf = jax.grad(loss(aligned_layer), argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    gr = jax.grad(
        loss(lambda *a: reference_fused_fno_layer(*a, dims=DIMS,
                                                  act="tanh")),
        argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    for n, f, r in zip(["x", "a", "b", "w_real", "w_imag", "wp", "bp"],
                       gf, gr):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), rtol=2e-3, atol=2e-3,
            err_msg=f"grad mismatch for {n}")


def test_fno3d_aligned_env_matches_unfused(monkeypatch):
    """Full-module parity with REALPDEBENCH_FNO_ALIGNED=1: the env-gated
    aligned layout must be output-invariant (train-mode forward + BN stats)
    vs the unfused XLA path."""
    from realpdebench_tpu.models.fno import FNO3d

    monkeypatch.setenv("REALPDEBENCH_FNO_ALIGNED", "1")
    r = np.random.default_rng(11)
    shp_in, shp_out = (4, 10, 12, 3), (4, 10, 12, 3)
    kw = dict(modes1=2, modes2=3, modes3=4, n_layers=2, width=8,
              shape_in=shp_in, shape_out=shp_out, padding=2)
    x = jnp.asarray(r.normal(size=(2, 4, 10, 12, 3)), jnp.float32)
    mod_f = FNO3d(use_pallas=True, pallas_interpret=True, **kw)
    mod_r = FNO3d(use_pallas=False, **kw)
    v = mod_r.init(jax.random.PRNGKey(0), x, train=True)
    yf, mf = mod_f.apply(v, x, train=True, mutable=["batch_stats"])
    yr, mr = mod_r.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                               rtol=2e-3, atol=2e-3)
    for (ka, a_), (kb, b_) in zip(
            jax.tree_util.tree_leaves_with_path(mf),
            jax.tree_util.tree_leaves_with_path(mr)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3, err_msg=str(ka))


def test_bt_blocks_selection(monkeypatch):
    """kk (BT rows per grid block) defaults, divisibility fit, env override,
    and the unaligned-layout kk=1 pin."""
    from realpdebench_tpu.ops.pallas.fno_layer import _bt_blocks

    monkeypatch.delenv("REALPDEBENCH_FNO_BTBLK", raising=False)
    assert _bt_blocks(208, True) == (4, 4, 4, 2)
    assert _bt_blocks(13, True) == (1, 1, 1, 1)   # prime BT: nothing divides
    assert _bt_blocks(26, True) == (2, 2, 2, 2)   # fit() drops 4 -> 2
    assert _bt_blocks(208, False) == (1, 1, 1, 1)  # legacy layout pins kk=1
    monkeypatch.setenv("REALPDEBENCH_FNO_BTBLK", "8,4,4,2")
    assert _bt_blocks(208, True) == (8, 4, 4, 2)
    assert _bt_blocks(208, False) == (1, 1, 1, 1)
    monkeypatch.setenv("REALPDEBENCH_FNO_BTBLK", "6,1,1,1")
    assert _bt_blocks(208, True) == (4, 1, 1, 1)  # 6 does not divide 208
    monkeypatch.setenv("REALPDEBENCH_FNO_BTBLK", "bogus")
    with pytest.warns(UserWarning):
        assert _bt_blocks(208, True) == (4, 4, 4, 2)


def test_fused_layer_in_valid_pad_early_parity():
    """in_valid (pad-early head): rows outside the true data extent carry
    fc0-bias garbage; the kernels must zero them on read and zero dx on
    write — identical to the oracle fed explicitly-zeroed x."""
    T, Hv, Jv = Tp - 2, Hp - 3, (Wp // 2) - 2
    args = _inputs(seed=5)
    x = args[0] + 0.7  # nonzero "bias garbage" everywhere incl. pad rows

    def mask_x(xq):
        x5 = xq.reshape(B, Tp, Hp, Wp // 2, 2 * C)
        tm = (np.arange(Tp) < T).astype(np.float32)
        hm = (np.arange(Hp) < Hv).astype(np.float32)
        jm = (np.arange(Wp // 2) < Jv).astype(np.float32)
        x5 = (x5 * tm[None, :, None, None, None]
              * hm[None, None, :, None, None]
              * jm[None, None, None, :, None])
        return x5.reshape(B * Tp, Hp * (Wp // 2), 2 * C)

    def loss(fn):
        def run(xq, *rest):
            s, stats = fn(xq, *rest)
            ch = _fold(stats)
            return (jnp.sum(s * s) * 1e-3 + jnp.sum(ch[1] / NPOS)
                    + jnp.sum((ch[0] / NPOS) ** 2))
        return run

    fused = loss(lambda *q: fused_fno_layer(
        *q, dims=DIMS, act="none", interpret=True, in_valid=(T, Hv, Jv)))
    ref = loss(lambda *q: reference_fused_fno_layer(
        *q, dims=DIMS, act="none"))
    lf = fused(x, *args[1:])
    lr = ref(mask_x(x), *args[1:])
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-4)
    gx_f = jax.grad(fused)(x, *args[1:])
    gx_r = jax.grad(ref)(mask_x(x), *args[1:])
    # the oracle's grad at masked rows is zero by chain rule; the kernels
    # zero dx explicitly — both must agree everywhere
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(mask_x(gx_r)),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("variant", ["mxu", "vpu"])
def test_tstage_kernel_matches_einsum_mid(variant):
    """The pallas T-stage kernels (both in-kernel formulations) compute the
    same mid-section as the XLA einsum path — forward and gradients — so
    the spectra's t-contraction can skip XLA's full-spectrum relayout
    copies."""
    from realpdebench_tpu.ops.pallas.fno_layer import mid_spectral

    r = np.random.default_rng(13)
    y = jnp.asarray(r.normal(size=(B * Tp, 2 * M2 * M3, 2 * C)), jnp.float32)
    wr = jnp.asarray(0.2 * r.normal(size=(4, M1, M2, M3, C, C)), jnp.float32)
    wi = jnp.asarray(0.2 * r.normal(size=(4, M1, M2, M3, C, C)), jnp.float32)
    ct = jnp.asarray(r.normal(size=(B * Tp, 2 * M2 * M3, 2 * C)), jnp.float32)

    def run(ts):
        out, vjp = jax.vjp(
            lambda *a: mid_spectral(*a, B, Tp, tstage=ts, interpret=True),
            y, wr, wi)
        return (np.asarray(out), *(np.asarray(g) for g in vjp(ct)))

    want = run(None)
    got = run(variant)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=2e-5,
                                   atol=2e-5 * np.abs(w).max())


@pytest.mark.parametrize("variant", ["mxu", "vpu"])
def test_fused_layer_tstage_variants_match_oracle(monkeypatch, variant):
    """End-to-end fused layer with the T-stage kernel engaged matches the
    pure-jnp oracle (fwd + stats), aligned layout (the shipped default)."""
    monkeypatch.setenv("REALPDEBENCH_FNO_TSTAGE", variant)
    args = _inputs(17)
    s_al, stats_al = fused_fno_layer(
        _to_aligned(args[0]), *args[1:], dims=DIMS, act="tanh",
        interpret=True, aligned=True)
    s_ref, stats_ref = reference_fused_fno_layer(*args, dims=DIMS, act="tanh")
    np.testing.assert_allclose(np.asarray(_from_aligned(s_al)),
                               np.asarray(s_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(_fold(stats_al)),
                               np.asarray(_fold(stats_ref)),
                               rtol=2e-4, atol=1e-3)


def test_selfuse_fold_matches_transpose_form(monkeypatch):
    """The repack-fold (contract 2m3 on the 3-D view + parity selectors on
    dim1, REALPDEBENCH_FNO_SELFUSE default) computes the same forward AND
    gradients as the transpose+selection form (=0) — identical contractions,
    reordered."""
    args = _inputs(seed=23)
    ct_s = jnp.asarray(
        np.random.default_rng(24).normal(
            size=(B * Tp, _HP8 * _J8, 2 * C)), jnp.float32)

    def run():
        def f(*a):
            s, stats = fused_fno_layer(
                _to_aligned(a[0]), *a[1:], dims=DIMS, act="tanh",
                interpret=True, aligned=True)
            return jnp.vdot(s, ct_s) + jnp.sum(stats**2)

        val, grads = jax.value_and_grad(f, argnums=tuple(range(7)))(*args)
        return [np.asarray(val)] + [np.asarray(g) for g in grads]

    monkeypatch.setenv("REALPDEBENCH_FNO_SELFUSE", "0")
    want = run()
    monkeypatch.setenv("REALPDEBENCH_FNO_SELFUSE", "1")
    got = run()
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5,
                                   atol=1e-5 * max(1.0, np.abs(w).max()))


def test_k2alite_geometry_fallback(monkeypatch):
    """A geometry the K2A-lite structure fit rejects must fall back to the
    full-read K2A with a warning, not crash the first trace."""
    import realpdebench_tpu.ops.pallas.fno_layer as F

    def boom(*a, **k):
        raise AssertionError("forced structure-fit failure")

    monkeypatch.setattr(F, "_lite_consts", boom)
    F._make_layer.cache_clear()
    with pytest.warns(UserWarning, match="K2A-lite disabled"):
        layer = F._make_layer(1, 2, 14, 10, 8, 2, 3, 4, "tanh", True,
                              "float32", True, (1, 1, 1, 1), None, None,
                              True, True, None)
    assert layer is not None
    F._make_layer.cache_clear()
