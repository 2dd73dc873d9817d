"""Clean speed-of-light probe for this chip/tunnel (v5e lite).

The round-4 dma_probe and vpu_probe disagree 2x on achieved copy bandwidth
at the fused-kernel block shapes (dma_probe's chained timing counts the
probe AND a chain-add pass; vpu_probe times the kernel alone). This probe
settles the environment speed-of-light with one uncontaminated timing
harness for every row:

  xla_scale        y = x * c            (XLA elementwise: read+write)
  xla_neg          y = -x               (pure unary, no constant broadcast)
  pallas_id_k{K}   identity Pallas kernel, block (K, R, 128), grid BT/K
  pallas_id2d      identity, 2-D [BT*R, 128] layout, 1 MB row blocks
  gemm_{M}         bf16 [M,4096]x[4096,4096] GEMM -> f32 (MXU ceiling)

Timing: donate the input, chain xi = f(xi) n times, fetch once; per-call
time = window / n, best of 3 windows. For GEMM rows the chain feeds the
output back as input (square shapes), so there is no hidden extra pass.

Each row prints achieved GB/s (total bytes moved, read+write) or TFLOP/s.

Usage: python tools/roofline_probe.py [n_iter]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT, R, C2 = 208, 5184, 128
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def pallas_id(k: int):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    return pl.pallas_call(
        kernel,
        grid=(BT // k,),
        in_specs=[pl.BlockSpec((k, R, C2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, R, C2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BT, R, C2), jnp.bfloat16),
        compiler_params=_PARAMS,
    )


def pallas_id2d(rows: int):
    M = BT * R

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    return pl.pallas_call(
        kernel,
        grid=(M // rows,),
        in_specs=[pl.BlockSpec((rows, C2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, C2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C2), jnp.bfloat16),
        compiler_params=_PARAMS,
    )


def _sync(xi):
    # The axon tunnel's block_until_ready returns before execution finishes
    # (the first probe run measured 43 TB/s "bandwidth" = dispatch only);
    # force a data-dependent scalar fetch like vpu_probe does.
    return float(np.asarray(jax.device_get(
        jnp.sum(xi.reshape(-1)[:4].astype(jnp.float32)))))


def best_ms(f, x, n_iter):
    # Fresh copy: f donates its argument, so chaining from the caller's x
    # would delete the shared input buffer after the first row.
    xi = f(jnp.array(x, copy=True))
    _sync(xi)
    best = None
    for _ in range(3):
        xi = f(xi)
        _sync(xi)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            xi = f(xi)
        _sync(xi)
        dt = (time.perf_counter() - t0) / n_iter
        best = dt if best is None else min(best, dt)
    return best * 1e3


def row(name, ms, gbs=None, tflops=None):
    d = {"probe": name, "ms_per_call": round(ms, 3)}
    if gbs is not None:
        d["gbps"] = round(gbs, 1)
    if tflops is not None:
        d["tflops"] = round(tflops, 1)
    print(json.dumps(d), flush=True)


def main(n_iter=30):
    x = jax.jit(lambda k: (0.1 * jax.random.normal(
        k, (BT, R, C2), jnp.float32)).astype(jnp.bfloat16))(
        jax.random.PRNGKey(0))
    moved = 2 * BT * R * C2 * 2  # read + write, bf16

    ms = best_ms(jax.jit(lambda xi: xi * jnp.bfloat16(1.0001),
                         donate_argnums=0), x, n_iter)
    row("xla_scale", ms, gbs=moved / ms / 1e6)
    ms = best_ms(jax.jit(lambda xi: -xi, donate_argnums=0), x, n_iter)
    row("xla_neg", ms, gbs=moved / ms / 1e6)

    for k in (1, 2, 4, 8):
        f = jax.jit(lambda xi, k=k: pallas_id(k)(xi), donate_argnums=0)
        ms = best_ms(f, x, n_iter)
        row(f"pallas_id_k{k}", ms, gbs=moved / ms / 1e6)

    x2 = x.reshape(BT * R, C2)
    for rows_ in (4096, 16384):
        if (BT * R) % rows_:
            continue
        f = jax.jit(lambda xi, r=rows_: pallas_id2d(r)(xi), donate_argnums=0)
        ms = best_ms(f, x2, n_iter)
        row(f"pallas_id2d_r{rows_}", ms, gbs=moved / ms / 1e6)

    # MXU ceiling: square bf16 GEMM chain (output feeds back as LHS)
    K = 4096
    w = jax.jit(lambda k: (0.05 * jax.random.normal(
        k, (K, K), jnp.float32)).astype(jnp.bfloat16))(jax.random.PRNGKey(1))
    for M in (4096, 8192):
        g = jax.jit(lambda a, w_: jnp.tanh(
            jax.lax.dot_general(a, w_, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        ).astype(jnp.bfloat16), donate_argnums=0)
        a0 = jax.jit(lambda k: (0.05 * jax.random.normal(
            k, (M, K), jnp.float32)).astype(jnp.bfloat16))(
            jax.random.PRNGKey(2))
        ms = best_ms(lambda ai: g(ai, w), a0, max(5, n_iter // 3))
        row(f"gemm_{M}x{K}x{K}", ms, tflops=2 * M * K * K / ms / 1e9)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
