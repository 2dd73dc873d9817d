"""Round-5 DMA-pipeline attack probe (VERDICT r4 next-1).

roofline_probe.jsonl (r4) showed the environment gap to close: Pallas
identity over the headline stream [208, 5184, 128] bf16 = 214-218 GB/s at
EVERY auto-pipelined block size, while plain XLA elementwise hits 323-463
GB/s on the same tensor. The fused FNO kernels (~187 of 224 ms/step) run at
that ~215 GB/s pattern, so a Pallas streaming fix is worth ~2x on the
kernels and is the whole remaining path to >=5.5 steps/s.

Hypotheses this probe separates:
  (a) Mosaic's auto-pipeline serializes the in-DMA and out-DMA of a block
      (or under-buffers) -> manual N-buffer DMA pipelines with the out-wait
      delayed N-1 iterations should recover XLA-level bandwidth.
  (b) The DMA engine itself is the limit at this transfer granularity ->
      direct HBM->HBM DMAs with N in flight should show the same ~215.
  (c) Grid/block geometry (3-D blocks, sublane padding) -> 2-D row-major
      blocks and dimension_semantics=("parallel",) variants.

Rows:
  xla_scale          y = x * c (control; r4: 463 GB/s)
  pallas_id_k4       auto-pipelined identity, block (4, R, 128) (r4: ~215)
  pallas_id_k4_par   same + dimension_semantics=("parallel",)
  pallas_id2d_rXXXX  auto-pipelined identity, 2-D [M,128] row blocks
  manual_nbufN_cROWS manual VMEM-bounce pipeline, N buffers, ROWS-row chunks
  hbm2hbm_nbufN      direct HBM->HBM chunk DMAs, N outstanding
  emitpipe_k4        pltpu.emit_pipeline identity (ANY->VMEM inner pipeline)

GB/s counts total bytes moved (read + write). Timing: donate input, chain
xi = f(xi), data-dependent scalar fetch as the only reliable barrier
(NOTES.md gotchas 5/6), best of 3 windows.

Usage: python tools/roofline2_probe.py [n_iter]
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
M = BT * R  # 1,078,272 rows of 128 lanes
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def pallas_id(k: int, parallel: bool = False):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    cp = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
        dimension_semantics=("parallel",) if parallel else None,
    )
    return pl.pallas_call(
        kernel,
        grid=(BT // k,),
        in_specs=[pl.BlockSpec((k, R, C2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, R, C2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BT, R, C2), jnp.bfloat16),
        compiler_params=cp,
    )


def pallas_id2d(rows: int):
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


def manual_pipeline(nbuf: int, rows: int):
    """Manual VMEM-bounce copy: in-DMA issued nbuf-1 chunks ahead, out-DMA
    never waited in its own iteration (the wait for out(i) happens right
    before in(i+nbuf-1) reuses the slot)."""
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

            # warmup: chunks 0..nbuf-2 in flight
            for i in range(min(nbuf - 1, n_chunks)):
                in_dma(i, i).start()

            def loop(idx, _):
                ahead = idx + nbuf - 1
                slot_ahead = ahead % nbuf

                @pl.when(ahead < n_chunks)
                def _():
                    @pl.when(idx >= 1)
                    def _():
                        # slot_ahead was used by chunk ahead-nbuf = idx-1
                        out_dma(slot_ahead, idx - 1).wait()

                    in_dma(slot_ahead, ahead).start()

                slot = idx % nbuf
                in_dma(slot, idx).wait()
                out_dma(slot, idx).start()
                return _

            jax.lax.fori_loop(0, n_chunks, loop, None)
            # drain the last nbuf-? outstanding outs
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
    )


def hbm2hbm(nbuf: int, rows: int):
    """Direct HBM->HBM chunk DMAs, nbuf outstanding — DMA-engine ceiling."""
    n_chunks = M // rows

    def kernel(x_ref, o_ref):
        def body(sems):
            def dma(slot, idx):
                return pltpu.make_async_copy(
                    x_ref.at[pl.ds(idx * rows, rows), :],
                    o_ref.at[pl.ds(idx * rows, rows), :],
                    sems.at[slot])

            for i in range(min(nbuf, n_chunks)):
                dma(i, i).start()

            def loop(idx, _):
                slot = idx % nbuf
                dma(slot, idx).wait()
                nxt = idx + nbuf

                @pl.when(nxt < n_chunks)
                def _():
                    dma(slot, nxt).start()

                return _

            jax.lax.fori_loop(0, n_chunks, loop, None)

        pl.run_scoped(body, sems=pltpu.SemaphoreType.DMA((nbuf,)))

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((M, C2), jnp.bfloat16),
        compiler_params=_PARAMS,
    )


def emitpipe(k: int):
    """Identity through pltpu.emit_pipeline (inner software pipeline)."""

    def inner(x_blk, o_blk):
        o_blk[...] = x_blk[...]

    def kernel(x_hbm, o_hbm):
        pipe = pltpu.emit_pipeline(
            inner,
            grid=(BT // k,),
            in_specs=[pl.BlockSpec((k, R, C2), lambda i: (i, 0, 0))],
            out_specs=[pl.BlockSpec((k, R, C2), lambda i: (i, 0, 0))],
        )
        pipe(x_hbm, o_hbm)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((BT, R, C2), jnp.bfloat16),
        compiler_params=_PARAMS,
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


def run(name, make, x, n_iter, moved):
    try:
        f = jax.jit(lambda xi: make()(xi), donate_argnums=0)
        # identity correctness: the chained sum must not drift
        s0 = _sync(jnp.array(x, copy=True))
        ms = best_ms(f, x, n_iter)
        s1 = _sync(f(jnp.array(x, copy=True)))
        if abs(s1 - s0) > 1e-3 * (abs(s0) + 1e-6):
            print(json.dumps({"probe": name, "error":
                              f"NOT identity: {s0} -> {s1}"}), flush=True)
            return
        row(name, ms, moved)
    except Exception as e:  # keep later rows alive on a Mosaic error
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
    row("xla_scale", ms, moved)

    run("pallas_id_k4", lambda: pallas_id(4), x3, n_iter, moved)
    run("pallas_id_k4_par", lambda: pallas_id(4, parallel=True), x3, n_iter,
        moved)

    for rows_ in (2106, 8424, 16848):
        if M % rows_ == 0:
            run(f"pallas_id2d_r{rows_}",
                functools.partial(pallas_id2d, rows_), x2, n_iter, moved)

    for nbuf, rows_ in ((2, 8424), (4, 8424), (4, 2106), (8, 2106),
                        (4, 16848)):
        run(f"manual_nbuf{nbuf}_c{rows_}",
            functools.partial(manual_pipeline, nbuf, rows_), x2, n_iter,
            moved)

    for nbuf in (4, 16):
        run(f"hbm2hbm_nbuf{nbuf}", functools.partial(hbm2hbm, nbuf, 8424),
            x2, n_iter, moved)

    run("emitpipe_k4", lambda: emitpipe(4), x3, n_iter, moved)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
