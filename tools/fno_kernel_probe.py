"""Per-kernel timing of the REAL fused-FNO pallas calls at headline scale.

Attributes the fused-kernel portion of the headline step (~158 ms/step in
the round-3 post-Strategy-B profile) across K1 (fwd spectral), K2 (inverse
+ pointwise + BN stats), K2A (spectral cotangent) and K12B (combined dx +
weight accumulators), plus the XLA mid-section (T-DFT + corner mixing) and
its vjp — each timed in isolation with the chained-computation trick
(block_until_ready is unreliable on this runtime, NOTES.md gotcha 5).

Headline config: microbatch B=8 (bs32/accum4), Tp=26, Hp=70, Wp=134,
C=64, modes (4,12,16), bf16 IO, ALIGNED layout (the shipped default).
The per-step cost of a site is ms_per_call x 4 layers x 4 microbatches.

Usage:  python tools/fno_kernel_probe.py [n_iter] [--unaligned] [--f32]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from realpdebench_tpu.ops.pallas import fno_layer as F

B, Tp, Hp, Wp, C = 8, 26, 70, 134, 64
m1, m2, m3 = 4, 12, 16
J, C2, BT = Wp // 2, 2 * C, B * Tp
Y = 2 * m2 * m3


def build_inputs(aligned: bool, dtype):
    Hp8, J8 = -(-Hp // 8) * 8, -(-J // 8) * 8
    R = Hp8 * J8 if aligned else Hp * J
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    mk = lambda k, sh, dt: jax.jit(
        lambda kk: (0.1 * jax.random.normal(kk, sh, jnp.float32)).astype(dt)
    )(k)
    x = mk(ks[0], (BT, R, C2), dtype)
    s = mk(ks[1], (BT, R, C2), dtype)
    ds = mk(ks[2], (BT, R, C2), dtype)
    # packed spectra cross the kernel<->mid boundary at the compute dtype
    # since the round-4 traffic cut (spec_dtype in _layer_calls)
    spec_dt = dtype if dtype == jnp.bfloat16 else jnp.float32
    y = mk(ks[3], (BT, Y, C2), spec_dt)
    g = mk(ks[4], (BT, Y, C2), spec_dt)
    dy = mk(ks[5], (BT, Y, C2), spec_dt)
    a2 = jnp.ones((1, C2), jnp.float32)
    b2 = jnp.zeros((1, C2), jnp.float32)
    ds1 = 0.01 * jnp.ones((1, C2), jnp.float32)
    ds2 = 0.01 * jnp.ones((1, C2), jnp.float32)
    wp2 = mk(ks[6], (C2, C2), jnp.float32)
    bp2 = jnp.zeros((1, C2), jnp.float32)
    wr = mk(ks[7], (4, m1, m2, m3, C, C), jnp.float32)
    return dict(x=x, s=s, ds=ds, y=y, g=g, dy=dy, a2=a2, b2=b2, ds1=ds1,
                ds2=ds2, wp2=wp2, bp2=bp2, wr=wr, wi=wr)


def consts(aligned: bool):
    cst = F._ct_consts(Hp, Wp, m2, m3)
    eyeC = np.eye(C, dtype=np.float32)
    zC = np.zeros((C, C), np.float32)
    selE = np.concatenate([eyeC, zC], axis=0)
    selO = np.concatenate([zC, eyeC], axis=0)
    selET = np.concatenate([eyeC, zC], axis=1)
    selOT = np.concatenate([zC, eyeC], axis=1)
    Hp8, J8 = -(-Hp // 8) * 8, -(-J // 8) * 8
    if aligned:
        rows = np.arange(Hp8 * J8)
        mask = (((rows // J8) < Hp) & ((rows % J8) < J)).astype(
            np.float32)[:, None]
    else:
        mask = np.ones((Hp * J, 1), np.float32)
    # xmask is the pad-early input-validity column; all-ones here (tdims is
    # None in this probe, so the kernels never apply it — it is only a spec
    # placeholder after the round-4 pad-early change)
    xmask = np.ones_like(mask)
    return dict(
        k1=(cst["E67X"], cst["EhP"], xmask),
        k2=(cst["IhP"], cst["IwE2"], cst["IwO2"], selET, selOT, mask, xmask),
        k2a=(cst["IhPT"], cst["IwET"], cst["IwOT"], selE, selO),
        k12b=(cst["EhPT"], cst["E67T"], cst["E67twT"], selET, selOT, mask,
              xmask),
    )


def time_one(name, fn, feed, others, n_iter):
    """fn(feed, others) -> scalar; chain via feed = feed + 0*out.

    ``others`` (big device arrays) are passed as explicit jit ARGUMENTS —
    closure-captured arrays inline as HLO constants and blow the remote
    compiler's request limit (NOTES.md gotcha 6). Median of 3 windows:
    single windows can be skewed 2x+ by remote-service stalls."""
    f = jax.jit(lambda xi, o: xi + (0.0 * fn(xi, o)).astype(xi.dtype))
    xi = f(feed, others)
    jax.block_until_ready(xi)
    xi = f(xi, others)  # one more to settle caches
    _ = jax.device_get(jnp.sum(xi[(0,) * (xi.ndim - 1)]))
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            xi = f(xi, others)
        _ = float(np.asarray(jax.device_get(
            jnp.sum(xi[(0,) * (xi.ndim - 1)].astype(jnp.float32)))))
        rates.append((time.perf_counter() - t0) / n_iter)
    rates.sort()
    dt = rates[1]
    print(json.dumps({
        "probe": name, "ms_per_call": round(dt * 1e3, 3),
        "window_ms": [round(r * 1e3, 3) for r in rates],
        "ms_per_step_16sites": round(dt * 1e3 * 16, 1),
    }), flush=True)
    return dt


def main(n_iter=30, aligned=True, dtype=jnp.bfloat16):
    v = build_inputs(aligned, dtype)
    cs = consts(aligned)
    act = "tanh"
    kks = F._bt_blocks(BT, aligned)
    print(json.dumps({"probe": "config", "kks": list(kks)}), flush=True)
    k1, k2, k2a, k12b = F._layer_calls(
        BT, Hp, J, C2, m2, m3, act, False, str(jnp.dtype(dtype)), aligned,
        kks)

    def first(o):
        out = o[0] if isinstance(o, tuple) else o
        return jnp.sum(out[:1, :1, :1].astype(jnp.float32))

    rows = {}
    rows["k1"] = time_one(
        "K1 fwd (x->y)", lambda xi, o: first(
            k1(xi, o["a2"], o["b2"], *cs["k1"])), v["x"], v, n_iter)
    rows["k2"] = time_one(
        "K2 fwd (g,x->s,stats)", lambda xi, o: first(
            k2(o["g"], xi, o["a2"], o["b2"], o["wp2"], o["bp2"],
               *cs["k2"])), v["x"], v, n_iter)
    rows["k2a"] = time_one(
        "K2A bwd (s,ds->dg)", lambda xi, o: first(
            k2a(xi, o["ds"], o["ds1"], o["ds2"], *cs["k2a"])),
        v["s"], v, n_iter)
    rows["k12b"] = time_one(
        "K12B bwd (x,s,ds,dy->dx,dw)", lambda xi, o: first(
            k12b(xi, o["a2"], o["b2"], o["wp2"], o["s"], o["ds"],
                 o["ds1"], o["ds2"], o["dy"], *cs["k12b"])),
        v["x"], v, n_iter)

    mid = functools.partial(F.mid_spectral, B=B, Tp=Tp, mid_dtype=dtype)
    rows["mid_fwd"] = time_one(
        "mid_spectral fwd", lambda yi, o: jnp.sum(
            mid(yi, o["wr"], o["wi"])[:1, :1, :1]), v["y"], v, n_iter)

    def mid_vjp(dyi, o):
        _, vjp = jax.vjp(lambda y_, wr_, wi_: mid(y_, wr_, wi_),
                         o["y"], o["wr"], o["wi"])
        dy_, dwr, dwi = vjp(dyi)
        return jnp.sum(dy_[:1, :1, :1]) + jnp.sum(dwr[:1, :1, :1, :1, :1])
    rows["mid_vjp"] = time_one("mid_spectral vjp", mid_vjp, v["dy"], v,
                               n_iter)

    per_layer = sum(rows.values())
    print(json.dumps({
        "probe": "TOTAL per layer (fwd+bwd+mid)",
        "ms_per_call": round(per_layer * 1e3, 3),
        "ms_per_step_4layers_4micro": round(per_layer * 1e3 * 16, 1),
    }), flush=True)


if __name__ == "__main__":
    rest = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(n_iter=int(rest[0]) if rest else 30,
         aligned="--unaligned" not in sys.argv,
         dtype=jnp.float32 if "--f32" in sys.argv else jnp.bfloat16)
