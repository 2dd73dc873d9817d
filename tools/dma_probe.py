"""HBM-bandwidth roofline + Pallas block-size sweep (v5e, headline shapes).

The round-3 per-site numbers imply the fused FNO kernels stream HBM at
~16-30 GB/s — two orders below the v5e's nominal ~819 GB/s. Two hypotheses:
  (a) per-block pipeline overhead: grid=(BT=208,) of 1.3 MB blocks pays a
      fixed cost per block → folding k BT-rows per block should scale
      throughput ~k×;
  (b) the chip/toolchain itself sustains far less than nominal — then the
      pure-XLA copy roofline will show the same ceiling and the kernels are
      already near environment speed-of-light.

Probes (all on the headline [BT=208, R=5184, 128] bf16 activation tensor):
  xla_copy        y = x * 1.0001          (XLA roofline: read+write)
  xla_reduce      y = sum(x, axis=(1,2))  (XLA read-only roofline)
  pallas_copy_k{K}  identity Pallas kernel, block (K, R, 128), grid BT/K
  pallas_reduce_k{K} read-only Pallas reduce, same blocking

Prints one JSON line per probe with achieved GB/s.

Usage:  python tools/dma_probe.py [n_iter]
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

BT, R, C2 = 208, 5184, 128
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def pallas_copy(k: int):
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


def pallas_reduce(k: int):
    def kernel(x_ref, o_ref):
        i = pl.program_id(0)
        part = jnp.sum(x_ref[...].astype(jnp.float32), axis=(0, 1),
                       keepdims=False)[None]

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] = o_ref[...] + part

    return pl.pallas_call(
        kernel,
        grid=(BT // k,),
        in_specs=[pl.BlockSpec((k, R, C2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, C2), jnp.float32),
        compiler_params=_PARAMS,
    )


def time_fn(name, fn, x, bytes_moved, n_iter):
    f = jax.jit(lambda xi: xi + (0.0 * fn(xi).reshape(-1)[0]).astype(xi.dtype))
    xi = f(x)
    jax.block_until_ready(xi)
    xi = f(xi)
    _ = jax.device_get(jnp.sum(xi[0, 0, :4].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        xi = f(xi)
    _ = float(np.asarray(jax.device_get(
        jnp.sum(xi[0, 0, :4].astype(jnp.float32)))))
    dt = (time.perf_counter() - t0) / n_iter
    # each chained iteration also pays the xi+eps add (read+write 2x tensor)
    chain_bytes = 2 * BT * R * C2 * 2
    print(json.dumps({
        "probe": name, "ms_per_call": round(dt * 1e3, 3),
        "gbps_incl_chain": round((bytes_moved + chain_bytes) / dt / 1e9, 1),
        "gbps_probe_only": round(bytes_moved / dt / 1e9, 1),
    }), flush=True)
    return dt


def main(n_iter=30):
    nbytes = BT * R * C2 * 2
    x = jax.jit(lambda k: (0.1 * jax.random.normal(
        k, (BT, R, C2), jnp.float32)).astype(jnp.bfloat16))(
        jax.random.PRNGKey(0))

    # pure-chain baseline: measures the xi + eps add alone
    f = jax.jit(lambda xi: xi + jnp.bfloat16(1e-6))
    xi = f(x)
    jax.block_until_ready(xi)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        xi = f(xi)
    _ = float(np.asarray(jax.device_get(
        jnp.sum(xi[0, 0, :4].astype(jnp.float32)))))
    dt = (time.perf_counter() - t0) / n_iter
    print(json.dumps({"probe": "xla_copy", "ms_per_call": round(dt * 1e3, 3),
                      "gbps_probe_only": round(2 * nbytes / dt / 1e9, 1)}),
          flush=True)

    def xla_reduce(xi):
        return jnp.sum(xi.astype(jnp.float32), axis=(1, 2))

    time_fn("xla_reduce", xla_reduce, x, nbytes, n_iter)

    for k in (1, 2, 4, 8, 13, 26):
        if BT % k:
            continue
        time_fn(f"pallas_copy_k{k}", lambda xi, k=k: pallas_copy(k)(xi),
                x, 2 * nbytes, n_iter)
        time_fn(f"pallas_reduce_k{k}", lambda xi, k=k: pallas_reduce(k)(xi),
                x, nbytes, n_iter)


if __name__ == "__main__":
    rest = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(rest[0]) if rest else 30)
