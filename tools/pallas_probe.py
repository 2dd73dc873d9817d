"""Per-kernel timing probe for the fused FNO layer (one v5e chip).

The headline step (~406 ms at bs32/accum4) runs 64 pallas calls
(4 kernels x 4 layers x 4 microbatches) over a BT=208 grid each — if the
per-block in-kernel relayouts dominate, each call is ~5-6 ms and the
kernels explain essentially the whole step. This probe times each kernel
in isolation at the exact bench shape (B=8 microbatch, Tp=26, Hp=70,
Wp=134, C=64, m=(4,12,16)) with chained iterations (y = f(y)-style
barriers, NOTES gotcha 5) and prints one JSON line per kernel.

Usage:  python tools/pallas_probe.py [n_iter]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(n_iter: int = 30, interpret: bool = False):
    from realpdebench_tpu.ops.pallas import fno_layer as fl

    if interpret:  # tiny-shape CPU smoke (script correctness, not timing)
        B, Tp, Hp, Wp, C = 1, 4, 6, 8, 64
        m1, m2, m3 = 2, 2, 2
    else:
        B, Tp, Hp, Wp, C = 8, 26, 70, 134, 64
        m1, m2, m3 = 4, 12, 16
    J, C2, BT = Wp // 2, 2 * C, B * Tp
    R, Y = Hp * J, 2 * m2 * m3
    act, x_dtype = "tanh", "bfloat16"

    k1, k2, k2a, k12b = fl._layer_calls(
        BT, Hp, J, C2, m2, m3, act, interpret, x_dtype)
    cst = fl._ct_consts(Hp, Wp, m2, m3)
    eyeC = np.eye(C, dtype=np.float32)
    zC = np.zeros((C, C), np.float32)
    selE = np.concatenate([eyeC, zC], axis=0)
    selO = np.concatenate([zC, eyeC], axis=0)
    selET = np.concatenate([eyeC, zC], axis=1)
    selOT = np.concatenate([zC, eyeC], axis=1)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    mk = lambda k, shape, dt: jax.jit(
        lambda kk: (0.1 * jax.random.normal(kk, shape, jnp.float32)
                    ).astype(dt))(k)
    x = mk(ks[0], (BT, R, C2), jnp.bfloat16)
    g = mk(ks[1], (BT, Y, C2), jnp.float32)
    s = mk(ks[2], (BT, R, C2), jnp.bfloat16)
    ds = mk(ks[3], (BT, R, C2), jnp.bfloat16)
    dy = mk(ks[4], (BT, Y, C2), jnp.float32)
    a2 = jnp.ones((1, C2), jnp.float32)
    b2 = jnp.zeros((1, C2), jnp.float32)
    wp2 = mk(ks[5], (C2, C2), jnp.float32)
    bp2 = jnp.zeros((1, C2), jnp.float32)
    ds1 = jnp.zeros((1, C2), jnp.float32)
    ds2 = jnp.zeros((1, C2), jnp.float32)

    # each probe jits `arg = arg + 0*f(arg)[pick]` so iterations CHAIN —
    # an async runtime cannot overlap them and wall time is the true
    # serialized per-call cost (NOTES gotcha 5)
    def wrap(callf, out_pick):
        def f(xi, aux):
            out = callf(xi, aux)
            eps = out_pick(out).astype(xi.dtype)
            return xi + 0.0 * eps, out
        return jax.jit(f)

    k1c = (jnp.asarray(cst["E67X"]), jnp.asarray(cst["EhP"]))
    k2c = tuple(jnp.asarray(t) for t in
                (cst["IhP"], cst["IwE2"], cst["IwO2"], selET, selOT))
    k2ac = tuple(jnp.asarray(t) for t in
                 (cst["IhPT"], cst["IwET"], cst["IwOT"], selE, selO))
    k12bc = tuple(jnp.asarray(t) for t in
                  (cst["EhPT"], cst["E67T"], cst["E67twT"], selET, selOT))

    probes = {
        "k1": (wrap(lambda xi, aux: k1(xi, a2, b2, *k1c),
                    lambda y: y[0, 0, 0]), x),
        "k2": (wrap(lambda gi, aux: k2(gi, x, a2, b2, wp2, bp2, *k2c)[0],
                    lambda s_: s_[0, 0, 0]), g),
        "k2a": (wrap(lambda si, aux: k2a(si, ds, ds1, ds2, *k2ac),
                     lambda dg: dg[0, 0, 0]), s),
        "k12b": (wrap(lambda xi, aux: k12b(xi, a2, b2, wp2.T, s, ds, ds1,
                                           ds2, dy, *k12bc)[0],
                      lambda dx: dx[0, 0, 0]), x),
        "mid": (wrap(lambda yi, aux: fl.mid_spectral(
                        yi, mk(ks[6], (4, m1, m2, m3, C, C), jnp.float32),
                        mk(ks[7], (4, m1, m2, m3, C, C), jnp.float32),
                        B, Tp, mid_dtype=jnp.bfloat16),
                     lambda gg: gg[0, 0, 0]), g),
    }

    for name, (fn, arg0) in probes.items():
        arg = arg0
        # compile + warm
        arg, out = fn(arg, None)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            arg, out = fn(arg, None)
        _ = float(np.asarray(jax.device_get(
            jnp.sum(out[..., :1, :1].astype(jnp.float32)))))
        dt = (time.perf_counter() - t0) / n_iter
        print(json.dumps({
            "kernel": name, "ms_per_call": round(dt * 1e3, 3),
            "us_per_block": round(dt * 1e6 / BT, 2), "grid": BT,
        }), flush=True)


if __name__ == "__main__":
    interp = "--interpret" in sys.argv
    rest = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(rest[0]) if rest else (2 if interp else 30), interpret=interp)
