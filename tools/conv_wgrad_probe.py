"""Isolate the UNet init-conv weight-gradient cost on TPU.

The round-4 UNet trace showed the 7x7x7 init-conv WEIGHT gradient
(`f32[7,7,7,3,64]`) lowering as a VPU select+add loop fusion at 102
ms/step (`select_add_fusion.273`), and padding Cin 3->8 did not move the
step time. This probe times grad-of-conv in isolation for candidate
formulations to find which one reaches the MXU path:

  cin3    : bf16 NDHWC conv, Cin=3, padding SAME     (the shipped op)
  cin8    : same with x/kernel zero-padded to Cin=8
  valid   : x explicitly zero-padded, conv padding VALID (no select in
            the wgrad reduction)
  valid8  : VALID + Cin=8
  f32     : Cin=3 SAME in float32

Each row: median-of-3 chained windows (NOTES gotcha 5), per-call ms.
UNet's init_conv runs once per microbatch; its fwd+bwd appear 4x/step at
the bench's accum=4 spec (1x at accum=1).

Usage: python tools/conv_wgrad_probe.py [n_iter]
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

B, T, H, W = 3, 20, 64, 128
K, COUT = 7, 64
DN = ("NDHWC", "DHWIO", "NDHWC")


def conv_loss(x, w, padding):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=padding,
        dimension_numbers=DN)
    return jnp.sum((y * 1e-3).astype(jnp.float32) ** 2)


def make_case(name, cin_pad, valid, dtype):
    cin = 3
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.jit(lambda k: (0.1 * jax.random.normal(
        k, (B, T, H, W, cin), jnp.float32)).astype(dtype))(kx)
    w = jax.jit(lambda k: (0.1 * jax.random.normal(
        k, (K, K, K, cin, COUT), jnp.float32)).astype(jnp.float32))(kw)

    def loss(x_, w_):
        xq, wq = x_, w_.astype(dtype)
        if cin_pad > cin:
            xq = jnp.pad(xq, ((0, 0),) * 4 + ((0, cin_pad - cin),))
            wq = jnp.pad(wq, ((0, 0),) * 3 + ((0, cin_pad - cin), (0, 0)))
        if valid:
            p = K // 2
            xq = jnp.pad(xq, ((0, 0),) + ((p, p),) * 3 + ((0, 0),))
            return conv_loss(xq, wq, "VALID")
        return conv_loss(xq, wq, "SAME")

    grad = jax.jit(jax.grad(loss, argnums=1))
    return x, w, grad


def time_case(name, cin_pad=0, valid=False, dtype=jnp.bfloat16, n_iter=20):
    x, w, grad = make_case(name, cin_pad, valid, dtype)
    # chain through the weight so iterations serialize (gotcha 5)
    f = jax.jit(lambda x_, w_: w_ + 1e-9 * grad(x_, w_))
    w = f(x, w)
    _ = float(np.asarray(jax.device_get(jnp.sum(w[0, 0, 0, 0]))))
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            w = f(x, w)
        _ = float(np.asarray(jax.device_get(jnp.sum(w[0, 0, 0, 0]))))
        rates.append((time.perf_counter() - t0) / n_iter)
    rates.sort()
    print(json.dumps({
        "probe": name, "ms_per_call": round(rates[1] * 1e3, 3),
        "window_ms": [round(r * 1e3, 3) for r in rates],
    }), flush=True)


def main(n_iter=20):
    time_case("cin3", 0, False, jnp.bfloat16, n_iter)
    time_case("cin8", 8, False, jnp.bfloat16, n_iter)
    time_case("valid", 0, True, jnp.bfloat16, n_iter)
    time_case("valid8", 8, True, jnp.bfloat16, n_iter)
    time_case("f32", 0, False, jnp.float32, n_iter)


if __name__ == "__main__":
    rest = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(rest[0]) if rest else 20)
