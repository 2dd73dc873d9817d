"""Round-5 roofline follow-up: is the XLA-vs-Pallas 2x a buffer-aliasing
artifact?

roofline2 (bench_results/r5/roofline2.jsonl) showed EVERY pallas mechanism
(auto-pipeline, 2-D blocks, manual N-buffer VMEM bounce, raw HBM->HBM DMA
x16 outstanding, emit_pipeline) at ~200-216 GB/s on the headline stream,
while xla_scale hit 431. But xla_scale ran with donate_argnums=0 — XLA
aliases the output onto the input buffer (in-place), while none of the
pallas rows aliased. If in-place is the difference, the environment's true
two-buffer copy speed is ~215 GB/s, the fused kernels are already AT the
DMA roofline for their patterns, and the remaining lever is traffic +
output aliasing (K12B's dx can alias its dead ds input), not pipelining.

Rows:
  xla_scale_inplace    y = x*c, donated input (roofline2's control)
  xla_scale_twobuf     y = x*c, NO donation (distinct in/out buffers)
  xla_copy_twobuf      jnp.copy-like (x + 0), no donation
  pallas_id_k4         roofline2's auto-pipelined identity (two buffers)
  pallas_id_k4_alias   same + input_output_aliasing={0: 0} (in-place)
  manual_nbuf4_alias   manual 4-buffer VMEM bounce, aliased in/out

Usage: python tools/roofline3_probe.py [n_iter]
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

BT, R, C2 = 208, 5184, 128
M = BT * R
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def pallas_id(k: int, alias: bool):
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
        input_output_aliases={0: 0} if alias else {},
    )


def manual_pipeline(nbuf: int, rows: int, alias: bool):
    n_chunks = M // rows
    assert M % rows == 0

    def kernel(x_ref, o_ref):
        def body(scratch, in_sems, out_sems):
            def in_dma(slot, idx):
                return pltpu.make_async_copy(
                    x_ref.at[pl.ds(idx * rows, rows), :],
                    scratch.at[slot], in_sems.at[slot])

            def out_dma(slot, idx):
                return pltpu.make_async_copy(
                    scratch.at[slot],
                    o_ref.at[pl.ds(idx * rows, rows), :],
                    out_sems.at[slot])

            for i in range(min(nbuf - 1, n_chunks)):
                in_dma(i, i).start()

            def loop(idx, _):
                ahead = idx + nbuf - 1
                slot_ahead = ahead % nbuf

                @pl.when(ahead < n_chunks)
                def _():
                    @pl.when(idx >= 1)
                    def _():
                        out_dma(slot_ahead, idx - 1).wait()

                    in_dma(slot_ahead, ahead).start()

                slot = idx % nbuf
                in_dma(slot, idx).wait()
                out_dma(slot, idx).start()
                return _

            jax.lax.fori_loop(0, n_chunks, loop, None)
            for i in range(min(nbuf, n_chunks)):
                idx = n_chunks - 1 - i
                out_dma(idx % nbuf, idx).wait()

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((nbuf, rows, C2), jnp.bfloat16),
            in_sems=pltpu.SemaphoreType.DMA((nbuf,)),
            out_sems=pltpu.SemaphoreType.DMA((nbuf,)),
        )

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((M, C2), jnp.bfloat16),
        compiler_params=_PARAMS,
        input_output_aliases={0: 0} if alias else {},
    )


def _sync(xi):
    return float(np.asarray(jax.device_get(
        jnp.sum(xi.reshape(-1)[:4].astype(jnp.float32)))))


def best_ms(f, x, n_iter):
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


def row(name, ms, moved):
    print(json.dumps({"probe": name, "ms_per_call": round(ms, 3),
                      "gbps": round(moved / ms / 1e6, 1)}), flush=True)


def run(name, make, x, n_iter, moved, donate=True):
    try:
        if donate:
            f = jax.jit(lambda xi: make()(xi), donate_argnums=0)
        else:
            f = jax.jit(lambda xi: make()(xi))
        s0 = _sync(jnp.array(x, copy=True))
        ms = best_ms(f, x, n_iter)
        s1 = _sync(f(jnp.array(x, copy=True)))
        if abs(s1 - s0) > 1e-3 * (abs(s0) + 1e-6):
            print(json.dumps({"probe": name, "error":
                              f"NOT identity: {s0} -> {s1}"}), flush=True)
            return
        row(name, ms, moved)
    except Exception as e:
        print(json.dumps({"probe": name,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)


def main(n_iter=30):
    x3 = jax.jit(lambda k: (0.1 * jax.random.normal(
        k, (BT, R, C2), jnp.float32)).astype(jnp.bfloat16))(
        jax.random.PRNGKey(0))
    x2 = jax.jit(lambda k: (0.1 * jax.random.normal(
        k, (M, C2), jnp.float32)).astype(jnp.bfloat16))(jax.random.PRNGKey(1))
    moved = 2 * M * C2 * 2

    ms = best_ms(jax.jit(lambda xi: xi * jnp.bfloat16(1.0001),
                         donate_argnums=0), x3, n_iter)
    row("xla_scale_inplace", ms, moved)

    ms = best_ms(jax.jit(lambda xi: xi * jnp.bfloat16(1.0001)), x3, n_iter)
    row("xla_scale_twobuf", ms, moved)

    ms = best_ms(jax.jit(lambda xi: xi + jnp.bfloat16(0.0)), x3, n_iter)
    row("xla_copy_twobuf", ms, moved)

    run("pallas_id_k4", lambda: pallas_id(4, False), x3, n_iter, moved)
    run("pallas_id_k4_alias", lambda: pallas_id(4, True), x3, n_iter, moved)
    run("manual_nbuf4_alias",
        functools.partial(manual_pipeline, 4, 8424, True), x2, n_iter, moved)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
