"""Micro-bench gated-conv backends at flagship generator shapes.

Compares XLA (current auto), the implicit-GEMM direct kernel, and the
round-1 im2col kernel (where it fits) on the conv forms that dominate the
256² serve forward. Decides VERDICT r1 next #4: flip auto or close out.

Run on TPU:  python tools/bench_conv.py [batch]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def _timeit(fn, pool, iters):
    @jax.jit
    def run(pool):
        def body(acc, x):
            return acc + jnp.sum(fn(x).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), pool)
        return acc

    float(run(pool))
    float(run(pool))
    t0 = time.perf_counter()
    float(run(pool))
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = 6

    from gan_inpainting_tpu.ops.gated_conv import gated_conv_xla
    from gan_inpainting_tpu.ops.pallas.direct_conv import (
        direct_conv_supported,
        gated_conv_direct,
    )

    # (name, (H, W, Cin), features, k, dil) — flagship 256² forms
    cases = [
        ("dilated64_d2", (64, 64, 192), 192, 3, 2),
        ("dilated64_d8", (64, 64, 192), 192, 3, 8),
        ("mid64", (64, 64, 192), 192, 3, 1),
        ("dec128", (128, 128, 96), 96, 3, 1),
        ("dec256", (256, 256, 48), 24, 3, 1),
        ("stem256", (256, 256, 4), 48, 5, 1),
    ]

    results = {}
    for name, (h, w, cin), feats, k, dil in cases:
        kern = 0.1 * jax.random.normal(jax.random.key(1),
                                       (k, k, cin, 2 * feats), jnp.bfloat16)
        bias = jnp.zeros((2 * feats,), jnp.float32)
        pool = jax.random.normal(jax.random.key(0),
                                 (iters, batch, h, w, cin), jnp.bfloat16)
        jax.block_until_ready(pool)
        gf = 2 * batch * h * w * k * k * cin * 2 * feats / 1e9

        t_xla = _timeit(lambda x: gated_conv_xla(
            x, kern, bias, stride=1, dilation=dil), pool, iters)
        row = {"xla_ms": round(t_xla, 2),
               "xla_tfs": round(gf / t_xla, 1)}
        if direct_conv_supported((batch, h, w, cin), k, 1, dil,
                                 features=feats):
            t_dir = _timeit(lambda x: gated_conv_direct(
                x, kern, bias, dilation=dil), pool, iters)
            row["direct_ms"] = round(t_dir, 2)
            row["direct_tfs"] = round(gf / t_dir, 1)
            row["speedup"] = round(t_xla / t_dir, 3)
        results[name] = row
        print(name, row, flush=True)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
