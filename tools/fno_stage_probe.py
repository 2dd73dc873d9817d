"""In-kernel stage ablation for K1/K2 (round-5: find the compute-bound ms).

The isolated-kernel probe (fno_kernel_probe) shows K1 at 3.53 ms/call vs a
1.38 ms DMA floor and K2 at 5.14 vs 2.66 — the fused kernels are bound by
IN-KERNEL work, not DMA (k2a-lite A/B proved removing a whole read is
neutral). This probe rebuilds K1/K2 with stage switches so consecutive
deltas attribute the overhead to: the affine+gelu read, the W dot, the
mode transposes, the H dot, the pack transposes, the selfuse inverse, the
pointwise dot, and the BN stats.

Rows print ms/call at the headline microbatch geometry ([208, 5184, 128]
bf16, kk1=4 / kk2=2), matching fno_kernel_probe's basis.

Usage: python tools/fno_stage_probe.py [n_iter]
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
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from realpdebench_tpu.ops.pallas.fno_layer import (  # noqa: E402
    _act,
    _blk,
    _block_diag2,
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


def k1_staged(x_ref, a2_ref, b2_ref, e67x, ehp, y_ref, *, kk, stage):
    dot = lambda a, b, c: _dot(a, b, c, MXU)
    zm = _act(x_ref[...].reshape(kk * R, C2).astype(jnp.float32)
              * a2_ref[:] + b2_ref[:], "tanh")
    if stage == "read":
        y_ref[...] = jnp.broadcast_to(
            jnp.sum(zm) * 1e-20, y_ref.shape).astype(y_ref.dtype)
        return
    z3 = zm.reshape(kk * Hp8, J8, C2)
    S = dot(z3, e67x[:], (((1,), (0,))))          # [kk*Hp8, C2, 4m3]
    Xr = S[:, :C, 0:m3] + S[:, C:, 2 * m3:3 * m3]
    Xi = S[:, :C, m3:2 * m3] + S[:, C:, 3 * m3:]
    if stage == "wdft":
        y_ref[...] = jnp.broadcast_to(
            (jnp.sum(Xr) + jnp.sum(Xi)) * 1e-20,
            y_ref.shape).astype(y_ref.dtype)
        return
    XrT = Xr.reshape(kk, Hp8, C, m3).transpose(0, 2, 3, 1).reshape(
        kk * C * m3, Hp8)
    XiT = Xi.reshape(kk, Hp8, C, m3).transpose(0, 2, 3, 1).reshape(
        kk * C * m3, Hp8)
    if stage == "modeT":
        y_ref[...] = jnp.broadcast_to(
            (jnp.sum(XrT) + jnp.sum(XiT)) * 1e-20,
            y_ref.shape).astype(y_ref.dtype)
        return
    A = dot(XrT, ehp[:], (((1,), (0,))))
    Bm = dot(XiT, ehp[:], (((1,), (0,))))
    m2x2 = A.shape[1] // 2
    yR = A[:, :m2x2] - Bm[:, m2x2:]
    yI = A[:, m2x2:] + Bm[:, :m2x2]
    if stage == "hdot":
        y_ref[...] = jnp.broadcast_to(
            (jnp.sum(yR) + jnp.sum(yI)) * 1e-20,
            y_ref.shape).astype(y_ref.dtype)
        return
    yRp = yR.reshape(kk, C, m3, m2x2).transpose(0, 3, 2, 1).reshape(
        kk * m2x2 * m3, C)
    yIp = yI.reshape(kk, C, m3, m2x2).transpose(0, 3, 2, 1).reshape(
        kk * m2x2 * m3, C)
    y_ref[...] = jnp.concatenate([yRp, yIp], axis=1).reshape(
        kk, m2x2 * m3, C2).astype(y_ref.dtype)     # == full K1


def k2_staged(g_ref, x_ref, a2_ref, b2_ref, wp2_ref, ihp, iwe2, iwo2,
              selET, selOT, s_ref, *, kk, stage):
    dot = lambda a, b, c: _dot(a, b, c, MXU)
    out = jnp.float32(0.0)
    if stage not in ("pointwise",):
        g = g_ref[...]
        m2x2 = Y // m3
        gRT = g[:, :, :C].reshape(kk, m2x2, m3, C).transpose(
            0, 2, 3, 1).reshape(kk * m3 * C, m2x2)
        gIT = g[:, :, C:].reshape(kk, m2x2, m3, C).transpose(
            0, 2, 3, 1).reshape(kk * m3 * C, m2x2)
        A = dot(gRT, ihp[:], (((1,), (0,))))
        Bm = dot(gIT, ihp[:], (((1,), (0,))))
        ihR = A[:, :Hp8] - Bm[:, Hp8:]
        ihI = Bm[:, :Hp8] + A[:, Hp8:]
        if stage == "invh":
            s_ref[...] = jnp.broadcast_to(
                (jnp.sum(ihR) + jnp.sum(ihI)) * 1e-20,
                s_ref.shape).astype(s_ref.dtype)
            return
        ihRT = ihR.reshape(kk, m3, C, Hp8).transpose(0, 3, 2, 1)
        ihIT = ihI.reshape(kk, m3, C, Hp8).transpose(0, 3, 2, 1)
        if stage == "modeT":
            s_ref[...] = jnp.broadcast_to(
                (jnp.sum(ihRT) + jnp.sum(ihIT)) * 1e-20,
                s_ref.shape).astype(s_ref.dtype)
            return
        ihC3 = jnp.concatenate([ihRT, ihIT], axis=3).reshape(
            kk * Hp8, C, 2 * m3)
        yE3 = dot(ihC3, iwe2[:], (((2,), (0,))))
        yO3 = dot(ihC3, iwo2[:], (((2,), (0,))))
        y2 = (dot(yE3, selET[:], (((1,), (0,))))
              + dot(yO3, selOT[:], (((1,), (0,)))) ).reshape(kk * R, C2)
        if stage == "invw":
            s_ref[...] = y2.reshape(kk, R, C2).astype(s_ref.dtype)
            return
        out = y2
    zm = _act(x_ref[...].reshape(kk * R, C2).astype(jnp.float32)
              * a2_ref[:] + b2_ref[:], "tanh")
    zp = dot(zm, wp2_ref[:], (((1,), (0,))))
    s = out + zp
    s_ref[...] = s.reshape(kk, R, C2).astype(s_ref.dtype)  # full minus stats


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
    return best * 1e3


def main(n_iter=20):
    cst = _ct_consts(Hp, Wp, m2, m3)
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: (0.1 * jax.random.normal(
        k, (BT, R, C2), jnp.float32)).astype(jnp.bfloat16))(key)
    g = jax.jit(lambda k: (0.1 * jax.random.normal(
        k, (BT, Y, C2), jnp.float32)).astype(jnp.bfloat16))(key)
    a2 = jnp.ones((1, C2), jnp.float32)
    b2 = jnp.zeros((1, C2), jnp.float32)
    wp2 = jnp.asarray(np.random.default_rng(0).normal(
        size=(C, C)).astype(np.float32))
    wp2 = _block_diag2(wp2)
    eyeC = np.eye(C, dtype=np.float32)
    zC = np.zeros((C, C), np.float32)
    selET = np.concatenate([eyeC, zC], axis=1)
    selOT = np.concatenate([zC, eyeC], axis=1)

    kk1, kk2 = 4, 2
    for stage in ("read", "wdft", "modeT", "hdot", "full"):
        call = pl.pallas_call(
            functools.partial(k1_staged, kk=kk1, stage=stage),
            grid=(BT // kk1,),
            in_specs=[_blk(kk1, R, C2), _full(), _full(), _full(), _full()],
            out_specs=_blk(kk1, Y, C2),
            out_shape=jax.ShapeDtypeStruct((BT, Y, C2), jnp.bfloat16),
            compiler_params=_COMPILER_PARAMS,
        )
        f = jax.jit(lambda x_, s=call: s(x_, a2, b2, cst["E67X"],
                                         cst["EhP"]))
        try:
            ms = best_ms(f, (x,), n_iter)
            print(json.dumps({"probe": f"k1_{stage}",
                              "ms_per_call": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"probe": f"k1_{stage}",
                              "error": str(e)[:200]}), flush=True)

    for stage in ("invh", "modeT", "invw", "pointwise", "full"):
        call = pl.pallas_call(
            functools.partial(k2_staged, kk=kk2, stage=stage),
            grid=(BT // kk2,),
            in_specs=[_blk(kk2, Y, C2), _blk(kk2, R, C2)] + [_full()] * 8,
            out_specs=_blk(kk2, R, C2),
            out_shape=jax.ShapeDtypeStruct((BT, R, C2), jnp.bfloat16),
            compiler_params=_COMPILER_PARAMS,
        )
        f = jax.jit(lambda g_, x_, s=call: s(
            g_, x_, a2, b2, wp2, cst["IhP"], cst["IwE2"], cst["IwO2"],
            selET, selOT))
        try:
            ms = best_ms(f, (g, x), n_iter)
            print(json.dumps({"probe": f"k2_{stage}",
                              "ms_per_call": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"probe": f"k2_{stage}",
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
