"""K1 H-stage reformulation probe (round-5 tail): can the mode transpose
(rows->lanes corner turn between the W dot and the H dot, +0.53 ms/call in
fno_stage_probe) be replaced by a sublane-contraction dot, the way the
T-stage kernels contract "off the natural row layout"?

Variants measured at the exact headline K1 geometry ([208, 5184, 128] bf16,
kk=4), end-to-end through the pack stage so layout costs downstream of the
H dot are charged to each variant:

- base      — shipped K1: modeT transpose(0,2,3,1) -> lane-contraction H
              dot -> pack transpose (the 3.297 ms/call control).
- subdot    — no modeT: dot_general contracting Xr4's Hp8 SUBLANE axis
              against EhP (the W dot already contracts a sublane axis, so
              Mosaic lowers this class) -> pack from the [kk, C, m3, M]
              result.
- subdot_b  — same contraction, but batch kk via the dot's batch dims
              instead of leaving kk in the output minor ordering.

All variants checksum their output against base (printed as max|diff|) so
a "fast" row that miscompiles is visible immediately.

Usage: python tools/fno_stage_probe2.py [n_iter]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, ".")

from realpdebench_tpu.ops.pallas.fno_layer import (  # noqa: E402
    _act,
    _blk,
    _COMPILER_PARAMS,
    _ct_consts,
    _dot,
    _full,
)

B, Tp, Hp, Wp, C = 8, 26, 70, 134, 64
m2, m3 = 12, 16
J = Wp // 2
Hp8, J8 = 72, 72
R = Hp8 * J8
C2 = 2 * C
BT = B * Tp
Y = 2 * m2 * m3
MXU = jnp.bfloat16


def k1_variant(x_ref, a2_ref, b2_ref, e67x, ehp, y_ref, *, kk, variant):
    dot = lambda a, b, c: _dot(a, b, c, MXU)
    zm = _act(x_ref[...].reshape(kk * R, C2).astype(jnp.float32)
              * a2_ref[:] + b2_ref[:], "tanh")
    z3 = zm.reshape(kk * Hp8, J8, C2)
    S = dot(z3, e67x[:], (((1,), (0,))))          # [kk*Hp8, C2, 4m3]
    Xr = S[:, :C, 0:m3] + S[:, C:, 2 * m3:3 * m3]
    Xi = S[:, :C, m3:2 * m3] + S[:, C:, 3 * m3:]

    if variant == "base":
        XrT = Xr.reshape(kk, Hp8, C, m3).transpose(0, 2, 3, 1).reshape(
            kk * C * m3, Hp8)
        XiT = Xi.reshape(kk, Hp8, C, m3).transpose(0, 2, 3, 1).reshape(
            kk * C * m3, Hp8)
        A = dot(XrT, ehp[:], (((1,), (0,))))
        Bm = dot(XiT, ehp[:], (((1,), (0,))))
        M2 = A.shape[1] // 2
        yR = A[:, :M2] - Bm[:, M2:]
        yI = A[:, M2:] + Bm[:, :M2]
        yRp = yR.reshape(kk, C, m3, M2).transpose(0, 3, 2, 1).reshape(
            kk * M2 * m3, C)
        yIp = yI.reshape(kk, C, m3, M2).transpose(0, 3, 2, 1).reshape(
            kk * M2 * m3, C)
        y_ref[...] = jnp.concatenate([yRp, yIp], axis=1).reshape(
            kk, M2 * m3, C2).astype(y_ref.dtype)
        return

    Xr4 = Xr.reshape(kk, Hp8, C, m3)
    Xi4 = Xi.reshape(kk, Hp8, C, m3)
    if variant == "subdot":
        # contract Hp8 (axis 1, a sublane axis) directly: [kk,Hp8,C,m3] x
        # [Hp8, 2M] -> [kk, C, m3, 2M]
        A = dot(Xr4, ehp[:], (((1,), (0,))))
        Bm = dot(Xi4, ehp[:], (((1,), (0,))))
    else:  # subdot_b: identical contraction expressed with ehp as LHS
        A = dot(ehp[:], Xr4, (((0,), (1,))))       # [2M, kk, C, m3]
        Bm = dot(ehp[:], Xi4, (((0,), (1,))))
        A = A.transpose(1, 2, 3, 0)                 # -> [kk, C, m3, 2M]
        Bm = Bm.transpose(1, 2, 3, 0)
    M2 = A.shape[-1] // 2
    yR = A[..., :M2] - Bm[..., M2:]                 # [kk, C, m3, M2]
    yI = A[..., M2:] + Bm[..., :M2]
    yRp = yR.transpose(0, 3, 2, 1).reshape(kk * M2 * m3, C)
    yIp = yI.transpose(0, 3, 2, 1).reshape(kk * M2 * m3, C)
    y_ref[...] = jnp.concatenate([yRp, yIp], axis=1).reshape(
        kk, M2 * m3, C2).astype(y_ref.dtype)


def _sync(v):
    return float(np.asarray(jax.device_get(jnp.sum(
        v.reshape(-1)[:4].astype(jnp.float32)))))


def best_ms(f, args, n_iter):
    o = f(*args)
    _sync(o)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            o = f(*args)
        _sync(o)
        dt = (time.perf_counter() - t0) / n_iter
        best = dt if best is None else min(best, dt)
    return best * 1e3, o


def main(n_iter=20):
    cst = _ct_consts(Hp, Wp, m2, m3)
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: (0.1 * jax.random.normal(
        k, (BT, R, C2), jnp.float32)).astype(jnp.bfloat16))(key)
    a2 = jnp.ones((1, C2), jnp.float32)
    b2 = jnp.zeros((1, C2), jnp.float32)

    import os

    interpret = os.environ.get("PROBE_INTERPRET", "0") == "1"
    kk = 4
    ref_out = None
    for variant in ("base", "subdot", "subdot_b"):
        kw = {} if interpret else {"compiler_params": _COMPILER_PARAMS}
        call = pl.pallas_call(
            functools.partial(k1_variant, kk=kk, variant=variant),
            grid=(BT // kk,),
            in_specs=[_blk(kk, R, C2), _full(), _full(), _full(), _full()],
            out_specs=_blk(kk, Y, C2),
            out_shape=jax.ShapeDtypeStruct((BT, Y, C2), jnp.bfloat16),
            interpret=interpret,
            **kw,
        )
        f = jax.jit(lambda x_, s=call: s(x_, a2, b2, cst["E67X"],
                                         cst["EhP"]))
        try:
            ms, out = best_ms(f, (x,), n_iter)
            row = {"probe": f"k1_{variant}", "ms_per_call": round(ms, 3)}
            if variant == "base":
                ref_out = np.asarray(jax.device_get(out), np.float32)
            elif ref_out is not None:
                d = np.abs(np.asarray(jax.device_get(out), np.float32)
                           - ref_out).max()
                row["max_abs_diff_vs_base"] = float(d)
            print(json.dumps(row), flush=True)
        except Exception as e:
            print(json.dumps({"probe": f"k1_{variant}",
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
