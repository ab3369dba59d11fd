"""Micro-bench upsample+conv formulations at flagship decoder shapes.

Variants (identical math):
  naive   — nearest-up 2x then SAME 3x3 conv (the r1 shipping form)
  parity1 — ONE padded VALID 2x2 conv to (H+1, W+1, 4C) + sliced interleave
  parity4 — FOUR asym-padded SAME 2x2 convs + depth-to-space interleave

Run on TPU:  python tools/bench_upconv.py [batch]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


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


def naive(x, k):
    b, h, w, c = x.shape
    xu = x[:, :, None, :, None, :]
    xu = jnp.broadcast_to(xu, (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
    return lax.conv_general_dilated(xu, k, (1, 1), "SAME",
                                    dimension_numbers=DN)


def parity1(x, k):
    from gan_inpainting_tpu.ops.upsample_conv import upsample2x_conv2d

    return upsample2x_conv2d(x, k)


def _parity_kernel_groups(kernel):
    w0, w1, w2 = kernel[0], kernel[1], kernel[2]
    rows = (jnp.stack([w0, w1 + w2]), jnp.stack([w0 + w1, w2]))
    out = []
    for p in (0, 1):
        r = rows[p]
        c0, c1, c2 = r[:, 0], r[:, 1], r[:, 2]
        out.append(jnp.stack([c0, c1 + c2], axis=1))
        out.append(jnp.stack([c0 + c1, c2], axis=1))
    return out  # 4 x (2, 2, Cin, Cout)


def parity4(x, k):
    b, h, w, _ = x.shape
    cout = k.shape[-1]
    ks = _parity_kernel_groups(k.astype(jnp.float32))
    pads = {0: (1, 0), 1: (0, 1)}
    maps = []
    for p in (0, 1):
        for q in (0, 1):
            kk = ks[2 * p + q].astype(x.dtype)
            m = lax.conv_general_dilated(
                x, kk, (1, 1), (pads[p], pads[q]), dimension_numbers=DN)
            maps.append(m)
    stack = jnp.stack(maps, axis=3).reshape(b, h, w, 2, 2, cout)
    y = stack.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, cout)


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = 6
    cases = [
        ("d3_64to128", (64, 64, 192), 192),
        ("d5_128to256", (128, 128, 96), 96),
    ]
    results = {}
    for name, (h, w, cin), cout in cases:
        k = 0.1 * jax.random.normal(jax.random.key(1), (3, 3, cin, cout),
                                    jnp.bfloat16)
        pool = jax.random.normal(jax.random.key(0),
                                 (iters, batch, h, w, cin), jnp.bfloat16)
        jax.block_until_ready(pool)
        import numpy as np
        a = np.asarray(naive(pool[0][:2], k), np.float32)
        b1 = np.asarray(parity1(pool[0][:2], k), np.float32)
        c4 = np.asarray(parity4(pool[0][:2], k), np.float32)
        err1 = float(np.max(np.abs(a - b1)))
        err4 = float(np.max(np.abs(a - c4)))
        row = {"equiv_err_parity1": err1, "equiv_err_parity4": err4}
        for vname, fn in [("naive", naive), ("parity1", parity1),
                          ("parity4", parity4)]:
            row[vname + "_ms"] = round(_timeit(lambda xx: fn(xx, k), pool,
                                               iters), 2)
        results[name] = row
        print(name, row, flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
