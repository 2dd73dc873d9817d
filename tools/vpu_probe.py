"""In-kernel VPU cost attribution at headline shapes (v5e).

The round-4 K3-code profile leaves ~75 ms/step of in-kernel overhead above
the streaming floor. Candidate costs per fused-kernel block: the f32
affine+GELU element passes (sigmoid/exp transcendentals; K12B pays act AND
act_grad), and the rows↔lanes Mosaic relayouts around the stage dots. This
probe times each in isolation on the real [BT, R=5184, C2=128] bf16
activation stream:

  copy            read+write identity           (the floor)
  affine_f32      cast-up, a*x+b, cast-down     (current kernels)
  affine_bf16     a*x+b in bf16                 (packed-VPU candidate)
  gelu_f32        affine + tanh-GELU in f32     (current K1/K2 input path)
  gelu_bf16       same in bf16
  gelugrad_f32    affine + act + act_grad + mul (current K12B input path)
  gelugrad_bf16   same in bf16
  reshape_hj      [kk*R, C2] -> [kk*Hp8, J8, C2] view + force (structural
                  rows->sublanes relayout every stage dot needs)
  transpose_cj    the old K2 repack [kk,Hp8,C,J8] -> (0,1,3,2) (what the
                  selfuse fold removed — calibration reference)

Usage: python tools/vpu_probe.py [n_iter]   (writes one JSON line each)
"""

from __future__ import annotations

import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT, Hp8, J8, C2 = 208, 72, 72, 128
R = Hp8 * J8
KK = 2
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
_SQ = math.sqrt(2.0 / math.pi)
_GC = 0.044715


def _c(v, u):
    return jnp.asarray(v, u.dtype)


def _act(u):
    # tanh form (sigmoid lowers with an f32 broadcast Mosaic rejects in bf16)
    inner = _c(_SQ, u) * (u + _c(_GC, u) * u * u * u)
    t = jnp.tanh(inner)
    return u * _c(0.5, u) * (_c(1.0, u) + t)


def _act_grad(u):
    inner = _c(_SQ, u) * (u + _c(_GC, u) * u * u * u)
    t = jnp.tanh(inner)
    dinner = _c(_SQ, u) * (_c(1.0, u) + _c(3.0 * _GC, u) * u * u)
    return (_c(0.5, u) * (_c(1.0, u) + t)
            + _c(0.5, u) * u * (_c(1.0, u) - t * t) * dinner)


def make(op: str):
    def kernel(x_ref, a_ref, b_ref, o_ref):
        x = x_ref[...]
        if op == "copy":
            o_ref[...] = x
            return
        if op.endswith("_bf16"):
            a = a_ref[:].astype(jnp.bfloat16)
            b = b_ref[:].astype(jnp.bfloat16)
            xm = x.reshape(KK * R, C2)
        else:
            a = a_ref[:]
            b = b_ref[:]
            xm = x.reshape(KK * R, C2).astype(jnp.float32)
        u = xm * a + b
        if op.startswith("affine"):
            r = u
        elif op.startswith("gelugrad"):
            r = _act(u) + _act_grad(u) * u
        elif op.startswith("gelu"):
            r = _act(u)
        elif op == "reshape_hj":
            # force the rows->sublanes relayout the stage dots need, then a
            # trivial consumer so it can't be elided
            z3 = u.reshape(KK * Hp8, J8, C2)
            r = (z3 + 1.0).reshape(KK * R, C2)
        elif op == "transpose_cj":
            C = C2 // 2
            z4 = u.reshape(KK, Hp8, C, 2 * J8)
            r = z4.transpose(0, 1, 3, 2).reshape(KK * R, C2)
        else:
            raise ValueError(op)
        o_ref[...] = r.reshape(KK, R, C2).astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(BT // KK,),
        in_specs=[pl.BlockSpec((KK, R, C2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((KK, R, C2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BT, R, C2), jnp.bfloat16),
        compiler_params=_PARAMS,
    )


def main(n_iter=20):
    a = jnp.full((1, C2), 1.01, jnp.float32)
    b = jnp.full((1, C2), 0.01, jnp.float32)
    x = jax.jit(lambda k: (0.1 * jax.random.normal(
        k, (BT, R, C2), jnp.float32)).astype(jnp.bfloat16))(
        jax.random.PRNGKey(0))
    nbytes = 2 * BT * R * C2 * 2  # read+write bf16
    base_ms = None
    for op in ("copy", "affine_f32", "affine_bf16", "gelu_f32", "gelu_bf16",
               "gelugrad_f32", "gelugrad_bf16", "reshape_hj",
               "transpose_cj"):
        call = make(op)
        f = jax.jit(lambda xi: call(xi, a, b))
        xi = f(x)
        jax.block_until_ready(xi)
        xi = f(xi)
        _ = float(np.asarray(jax.device_get(
            jnp.sum(xi[0, 0, :4].astype(jnp.float32)))))
        best = None
        for _w in range(3):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                xi = f(xi)
            _ = float(np.asarray(jax.device_get(
                jnp.sum(xi[0, 0, :4].astype(jnp.float32)))))
            dt = (time.perf_counter() - t0) / n_iter
            best = dt if best is None else min(best, dt)
        ms = best * 1e3
        if op == "copy":
            base_ms = ms
        print(json.dumps({
            "probe": op, "ms_per_call": round(ms, 3),
            "gbps": round(nbytes / best / 1e9, 1),
            "ms_over_copy": round(ms - (base_ms or ms), 3),
        }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
