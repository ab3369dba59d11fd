"""Probe: does XLA lower int8 conv to the v5e MXU's 2x int8 rate?

Gating experiment for a quantized serving path (round 3). Times a
serve-shaped gated-conv matmul body in bf16 vs s8xs8->s32, plus the
dequant/requant epilogues, and prints achieved TF/s (TOPS for int8).

Methodology follows gan_inpainting_tpu/bench.py: a pool of DISTINCT
device-resident inputs, all iterations inside one ``lax.scan`` program,
scalar readback, best-of-3 — naive per-call loops on this box hit the
remote execution layer's dedupe/overlap pathology and report ~10x
inflated rates.

Run on the TPU (foreground, nothing else touching the chip):
    python tools/probe_int8.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

DIMS = ("NHWC", "HWIO", "NHWC")
ITERS = 8


def timed_scan(body, pool, *consts):
    """Scan ``body(x, *consts)`` over the pool; returns best-of-3 sec/iter."""

    @jax.jit
    def run(pool, *consts):
        def step(acc, x):
            y = body(x, *consts)
            return acc + jnp.sum(y.astype(jnp.float32)), None
        acc, _ = lax.scan(step, jnp.float32(0.0), pool)
        return acc

    float(run(pool, *consts))  # compile + one warm execution
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(pool, *consts))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def conv_flops(b, h, w, cin, cout, k):
    return 2.0 * b * h * w * cin * cout * k * k


def main():
    print("devices:", jax.devices())
    key = jax.random.key(0)
    # serve-shaped interior conv: 64x64 map, 192ch in, gated 2F=384 out, b128
    b, h, w, cin, cout, k = 128, 64, 64, 192, 384, 3
    kx, kk = jax.random.split(key)
    xs = jax.random.normal(kx, (ITERS, b, h, w, cin), jnp.bfloat16)
    kern = jax.random.normal(kk, (k, k, cin, cout), jnp.bfloat16)
    xs = jax.block_until_ready(xs)
    fl = conv_flops(b, h, w, cin, cout, k)

    def f_bf16(x, kern):
        return lax.conv_general_dilated(
            x, kern, (1, 1), "SAME", dimension_numbers=DIMS)

    dt = timed_scan(f_bf16, xs, kern)
    print(f"bf16 conv: {dt*1e3:.2f} ms  {fl/dt/1e12:.1f} TF/s")

    xi = jax.block_until_ready((xs * 10).astype(jnp.int8))
    ki = (kern * 10).astype(jnp.int8)

    def f_int8(x, ki):
        return lax.conv_general_dilated(
            x, ki, (1, 1), "SAME", dimension_numbers=DIMS,
            preferred_element_type=jnp.int32)

    dt8 = timed_scan(f_int8, xi, ki)
    print(f"int8 conv (s32 out): {dt8*1e3:.2f} ms  {fl/dt8/1e12:.1f} TOP/s")

    # realistic quantized gated-conv block: int8 conv + dequant + bias +
    # gate epilogue + requantize to int8 for the next layer (static scales)
    scale_w = jnp.abs(kern.astype(jnp.float32)).max(axis=(0, 1, 2)) / 127.0
    bias = jnp.zeros((cout,), jnp.float32)
    s_x = jnp.float32(0.05)
    s_y = jnp.float32(0.05)

    def f_int8_block(x, ki, s_w, bias):
        y = lax.conv_general_dilated(
            x, ki, (1, 1), "SAME", dimension_numbers=DIMS,
            preferred_element_type=jnp.int32)
        yf = y.astype(jnp.float32) * (s_x * s_w) + bias
        f, g = jnp.split(yf, 2, axis=-1)
        act = jax.nn.elu(f) * jax.nn.sigmoid(g)
        return jnp.clip(jnp.round(act / s_y), -127, 127).astype(jnp.int8)

    dtb = timed_scan(f_int8_block, xi, ki, scale_w, bias)
    print(f"int8 gated block (conv+dequant+gate+requant): {dtb*1e3:.2f} ms  "
          f"{fl/dtb/1e12:.1f} TOP/s-equiv")

    # bf16 gated block for comparison
    def f_bf16_block(x, kern, bias16):
        y = lax.conv_general_dilated(
            x, kern, (1, 1), "SAME", dimension_numbers=DIMS)
        y = y + bias16
        f, g = jnp.split(y, 2, axis=-1)
        return jax.nn.elu(f) * jax.nn.sigmoid(g)

    dtbb = timed_scan(f_bf16_block, xs, kern, jnp.zeros((cout,), jnp.bfloat16))
    print(f"bf16 gated block: {dtbb*1e3:.2f} ms  {fl/dtbb/1e12:.1f} TF/s")
    print(f"block speedup int8/bf16: {dtbb/dtb:.2f}x")


if __name__ == "__main__":
    main()
