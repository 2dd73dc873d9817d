"""Mosaic relayout-cost probe: times single in-kernel ops in isolation.

Each probe kernel runs the K1-style block load ([R, 128] bf16 → f32) plus
exactly ONE suspicious operation from the fused FNO kernels, over the same
BT=208 grid as the headline bench, storing a tiny result so nothing is
dead-code-eliminated. Subtracting the `baseline` row isolates each op's
per-block cost. Prints one JSON line per probe.

Usage:  python tools/mosaic_probe.py [n_iter]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, Tp, Hp, Wp, C = 8, 26, 70, 134, 64
m2, m3 = 12, 16
J, C2, BT = Wp // 2, 2 * C, B * Tp
R = Hp * J
Hp8, J8 = 72, 72

_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _store(o_ref, val):
    # reduce to the [8, 128] output block so every probe writes the same
    # tiny tensor and the op under test cannot be eliminated
    v = val.astype(jnp.float32)
    flat = v.reshape(-1, v.shape[-1])
    o_ref[0] = jnp.sum(flat, axis=0, keepdims=True) * jnp.ones(
        (8, flat.shape[-1]), jnp.float32)[:, :128] if flat.shape[-1] >= 128 \
        else jnp.pad(jnp.sum(flat, axis=0, keepdims=True),
                     ((0, 0), (0, 128 - flat.shape[-1]))) * jnp.ones(
            (8, 128), jnp.float32)


def _mk(body, n_consts, interpret=False):
    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        consts = [r[:] for r in refs[:-1]]
        xm = x_ref[0].astype(jnp.float32)          # [R, 128]
        _store(o_ref, body(xm, *consts))

    return pl.pallas_call(
        kernel,
        grid=(BT,),
        in_specs=[pl.BlockSpec((1, R, C2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_consts,
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BT, 8, 128), jnp.float32),
        compiler_params=_PARAMS,
        interpret=interpret,
    )


def probes():
    e67x = jnp.asarray(np.random.randn(J8, 4 * m3).astype(np.float32))
    e67xw = jnp.asarray(np.random.randn(J8, 128).astype(np.float32))
    ehp = jnp.asarray(np.random.randn(Hp8, 4 * m2).astype(np.float32))

    def reshape_pad(xm):                     # the K1 head repack
        return jnp.pad(xm.reshape(Hp, J, C2),
                       ((0, Hp8 - Hp), (0, J8 - J), (0, 0)))

    def dot_w(xm, e):                        # + the W-stage dot
        z3 = reshape_pad(xm)
        return jax.lax.dot_general(
            z3.astype(jnp.bfloat16), e.astype(jnp.bfloat16),
            dimension_numbers=((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32)

    def lane_slices(xm, e):                  # Xr/Xi parity combination
        S = dot_w(xm, e)                     # [Hp8, C2, 4m3]
        Xr = S[:, :C, 0:m3] + S[:, C:, 2 * m3:3 * m3]
        Xi = S[:, :C, m3:2 * m3] + S[:, C:, 3 * m3:]
        return Xr + Xi

    def transpose_small(xm, e):              # [Hp8, C, m3] → [C*m3, Hp8]
        S = dot_w(xm, e)
        Xr = S[:, :C, 0:m3] + S[:, C:, 2 * m3:3 * m3]
        return Xr.transpose(1, 2, 0).reshape(C * m3, Hp8)

    def dot_h(xm, e, eh):                    # + the H-stage dot
        XrT = transpose_small(xm, e)
        return jax.lax.dot_general(
            XrT.astype(jnp.bfloat16), eh.astype(jnp.bfloat16),
            dimension_numbers=((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32)

    def pack_out(xm, e, eh):                 # K1 tail repack
        A = dot_h(xm, e, eh)                 # [C*m3, 4m2]
        m2x2 = A.shape[1] // 2
        yR = A[:, :m2x2]
        return yR.reshape(C, m3, m2x2).transpose(2, 1, 0).reshape(
            m2x2 * m3, C)

    return [
        ("baseline", lambda xm: xm, ()),     # load + cast + reduce only
        ("reshape_pad", reshape_pad, ()),
        ("dot_w", dot_w, (e67x,)),
        ("dot_w_wide", dot_w, (e67xw,)),
        ("lane_slices", lane_slices, (e67x,)),
        ("transpose_small", transpose_small, (e67x,)),
        ("dot_h", dot_h, (e67x, ehp)),
        ("pack_out", pack_out, (e67x, ehp)),
    ]


def _mk_aligned(body, n_consts, interpret=False):
    """Same as _mk but blocks are the ALIGNED [Hp8*J8, 128] layout (the
    Strategy-B candidate: rows pre-padded in HBM so the [72,72,128]
    reshape is tile-aligned and needs no in-kernel repack)."""
    R8 = Hp8 * J8

    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        consts = [r[:] for r in refs[:-1]]
        xm = x_ref[0].astype(jnp.float32)          # [R8, 128]
        _store(o_ref, body(xm, *consts))

    return pl.pallas_call(
        kernel,
        grid=(BT,),
        in_specs=[pl.BlockSpec((1, R8, C2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_consts,
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BT, 8, 128), jnp.float32),
        compiler_params=_PARAMS,
        interpret=interpret,
    )


def probes_aligned():
    e67x = jnp.asarray(np.random.randn(J8, 4 * m3).astype(np.float32))
    ehp = jnp.asarray(np.random.randn(Hp8, 4 * m2).astype(np.float32))

    def a_reshape(xm):                       # should be tile-aligned → free
        return xm.reshape(Hp8, J8, C2)

    def a_dot_w(xm, e):
        return jax.lax.dot_general(
            a_reshape(xm).astype(jnp.bfloat16), e.astype(jnp.bfloat16),
            dimension_numbers=((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32)

    def a_k1_core(xm, e, eh):                # full K1 spectral math, aligned
        S = a_dot_w(xm, e)                   # [Hp8, C2, 4m3]
        Xr = S[:, :C, 0:m3] + S[:, C:, 2 * m3:3 * m3]
        Xi = S[:, :C, m3:2 * m3] + S[:, C:, 3 * m3:]
        XrT = Xr.transpose(1, 2, 0).reshape(C * m3, Hp8)
        XiT = Xi.transpose(1, 2, 0).reshape(C * m3, Hp8)
        A = jax.lax.dot_general(
            XrT.astype(jnp.bfloat16), eh.astype(jnp.bfloat16),
            dimension_numbers=((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32)
        Bm = jax.lax.dot_general(
            XiT.astype(jnp.bfloat16), eh.astype(jnp.bfloat16),
            dimension_numbers=((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32)
        m2x2 = A.shape[1] // 2
        yR = A[:, :m2x2] - Bm[:, m2x2:]
        yI = A[:, m2x2:] + Bm[:, :m2x2]
        yRp = yR.reshape(C, m3, m2x2).transpose(2, 1, 0).reshape(
            m2x2 * m3, C)
        yIp = yI.reshape(C, m3, m2x2).transpose(2, 1, 0).reshape(
            m2x2 * m3, C)
        return jnp.concatenate([yRp, yIp], axis=1)

    return [
        ("aligned_baseline", lambda xm: xm, ()),
        ("aligned_reshape", a_reshape, ()),
        ("aligned_dot_w", a_dot_w, (e67x,)),
        ("aligned_k1_core", a_k1_core, (e67x, ehp)),
    ]


def main(n_iter: int = 30, interpret: bool = False):
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: (0.1 * jax.random.normal(
        k, (BT, R, C2), jnp.float32)).astype(jnp.bfloat16))(key)
    x8 = jax.jit(lambda k: (0.1 * jax.random.normal(
        k, (BT, Hp8 * J8, C2), jnp.float32)).astype(jnp.bfloat16))(key)

    results = {}
    jobs = ([(n, b, c, _mk, x) for n, b, c in probes()]
            + [(n, b, c, _mk_aligned, x8) for n, b, c in probes_aligned()])
    for name, body, consts, mk, x0 in jobs:
        call = mk(body, len(consts), interpret)
        f = jax.jit(lambda xi: xi + 0.0 * call(xi, *consts)[
            :1, :1, :1].astype(xi.dtype))
        xi = f(x0)
        jax.block_until_ready(xi)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            xi = f(xi)
        _ = float(np.asarray(jax.device_get(
            jnp.sum(xi[0, 0, :8].astype(jnp.float32)))))
        dt = (time.perf_counter() - t0) / n_iter
        results[name] = dt
        base = ("aligned_baseline" if name.startswith("aligned")
                else "baseline")
        print(json.dumps({
            "probe": name, "ms_per_call": round(dt * 1e3, 3),
            "us_per_block": round(dt * 1e6 / BT, 2),
            "us_per_block_minus_baseline": round(
                (dt - results.get(base, dt)) * 1e6 / BT, 2),
        }), flush=True)


if __name__ == "__main__":
    interp = "--interpret" in sys.argv
    rest = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(rest[0]) if rest else (1 if interp else 30), interpret=interp)
