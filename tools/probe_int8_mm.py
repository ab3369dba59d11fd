"""Probe 2: int8 ceiling via matmul lowering (vs conv lowering).

probe_int8.py showed int8 CONV reaches only ~116 TOP/s (1.29x bf16) on
v5e — far from the 394 TOP/s native int8 MXU rate. This probe asks whether
the limitation is the conv lowering or the toolchain: times bf16 vs
s8xs8->s32 ``jnp.dot`` at the serve conv's im2col shape and at a large
square shape. Methodology: distinct device-resident inputs, lax.scan,
scalar readback, best-of-3 (see bench.py docstring).

Run on the TPU (foreground): python tools/probe_int8_mm.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 8


def timed_scan(body, pool, *consts):
    @jax.jit
    def run(pool, *consts):
        def step(acc, x):
            y = body(x, *consts)
            return acc + jnp.sum(y.astype(jnp.float32)), None
        acc, _ = lax.scan(step, jnp.float32(0.0), pool)
        return acc

    float(run(pool, *consts))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(pool, *consts))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def bench_mm(name, m, k, n):
    key = jax.random.key(hash(name) % (2**31))
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (ITERS, m, k), jnp.bfloat16)
    b = jax.random.normal(kb, (k, n), jnp.bfloat16)
    a = jax.block_until_ready(a)
    fl = 2.0 * m * k * n

    def f_bf16(a, b):
        return jnp.dot(a, b)

    dt = timed_scan(f_bf16, a, b)
    print(f"{name} bf16 ({m}x{k}x{n}): {dt*1e3:.2f} ms  {fl/dt/1e12:.1f} TF/s")

    ai = jax.block_until_ready((a * 10).astype(jnp.int8))
    bi = (b * 10).astype(jnp.int8)

    def f_int8(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.int32)

    dt8 = timed_scan(f_int8, ai, bi)
    print(f"{name} int8 ({m}x{k}x{n}): {dt8*1e3:.2f} ms  "
          f"{fl/dt8/1e12:.1f} TOP/s   speedup {dt/dt8:.2f}x")


def main():
    print("devices:", jax.devices())
    # serve conv as im2col: M = b*h*w = 128*64*64 (split x8 to bound mem),
    # K = 3*3*192, N = 384
    bench_mm("im2col/8", 65536, 1728, 384)
    # big square — the canonical MXU-rate shape
    bench_mm("square", 8192, 4096, 4096)


if __name__ == "__main__":
    main()
