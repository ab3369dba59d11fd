"""Micro-bench the contextual-attention op variants at flagship serve shapes.

Variants (same math, equivalence-tested elsewhere):
  fused[qr,kr]  — fully-fused kernel, row-group override
  stream        — materialized Q/K/V + streaming flash kernel
  dense         — materialized Q/K/V + XLA dense attention
plus the fold_patches overlap-add alone (to size the post-kernel cost).

Run on TPU:  python tools/bench_attention.py [batch] [feat_hw] [channels]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def _timeit(fn, pool, iters):
    @jax.jit
    def run(pool):
        def body(acc, args):
            out = fn(*args)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), pool)
        return acc

    float(run(pool))
    float(run(pool))
    t0 = time.perf_counter()
    float(run(pool))
    return (time.perf_counter() - t0) / iters * 1e3  # ms per call


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 192
    iters = 6
    ksize, rate, scale = 3, 2, 10.0

    from gan_inpainting_tpu.ops.contextual_attention import (
        _attention_inputs,
        _patch_attention_xla,
        contextual_attention,
        downscale_mask_max,
    )
    from gan_inpainting_tpu.ops.pallas.fused_attention import (
        _choose_blocks,
        _fused_vmem_bytes,
        _VMEM_BUDGET_BYTES,
        fused_patch_attention,
    )
    from gan_inpainting_tpu.ops.pallas.patch_attention import (
        patch_attention_pallas,
    )

    def make_pool(key):
        def one(k):
            f = jax.random.normal(k, (batch, hw, hw, c), jnp.bfloat16)
            m = (jax.random.uniform(jax.random.fold_in(k, 1),
                                    (batch, hw, hw, 1)) < 0.25).astype(
                jnp.bfloat16)
            return f, m
        return jax.vmap(one)(jax.random.split(key, iters))

    pool = jax.device_put(make_pool(jax.random.key(0)))
    jax.block_until_ready(pool)

    hs = hw // rate
    ws = hs
    base_qr, base_kr = _choose_blocks(hs, ws, c, rate)
    print(f"shape: b={batch} {hw}x{hw}x{c} -> hs=ws={hs}; "
          f"auto blocks qr={base_qr} kr={base_kr}", flush=True)

    results = {}

    # full op (kernel + fold), auto path — the number the generator sees
    def op_full(f, m):
        return contextual_attention(f, f, m, ksize=ksize, rate=rate,
                                    softmax_scale=scale, backend="pallas")
    results["op_full_auto"] = _timeit(op_full, pool, iters)
    print(f"op_full_auto: {results['op_full_auto']:.2f} ms", flush=True)

    # fused kernel alone at a few (qr, kr) block choices
    for qr_mult in (1, 2, 4):
        qr = base_qr * qr_mult
        if hs % qr:
            continue
        kr = base_kr
        if _fused_vmem_bytes(hs, ws, c, rate, qr, kr) > _VMEM_BUDGET_BYTES:
            print(f"fused qr={qr} kr={kr}: over VMEM budget, skipped",
                  flush=True)
            continue

        def k_fused(f, m, qr=qr, kr=kr):
            return fused_patch_attention(f, m, ksize=ksize, rate=rate,
                                         softmax_scale=scale,
                                         blocks=(qr, kr))
        key = f"fused_qr{qr}_kr{kr}"
        results[key] = _timeit(k_fused, pool, iters)
        print(f"{key}: {results[key]:.2f} ms", flush=True)

    # streaming (materialized front-end + flash kernel)
    def k_stream(f, m):
        q, k, valid, v, _ = _attention_inputs(f, f, m, ksize, rate)
        return patch_attention_pallas(q, k, valid, v, softmax_scale=scale)
    results["stream"] = _timeit(k_stream, pool, iters)
    print(f"stream: {results['stream']:.2f} ms", flush=True)

    # XLA dense
    def k_dense(f, m):
        q, k, valid, v, _ = _attention_inputs(f, f, m, ksize, rate)
        return _patch_attention_xla(q, k, valid, v, scale)
    results["dense"] = _timeit(k_dense, pool, iters)
    print(f"dense: {results['dense']:.2f} ms", flush=True)

    # fold alone (patches -> map overlap-add)
    from gan_inpainting_tpu.ops.patches import fold_patches

    def k_fold(f, m):
        yp = fused_patch_attention(f, m, ksize=ksize, rate=rate,
                                   softmax_scale=scale)
        yp = yp.reshape(batch, hs, ws, 2 * rate, 2 * rate, c)
        y, cnt = fold_patches(yp, rate, (hw, hw), "same")
        return y / jnp.maximum(cnt, 1.0).astype(y.dtype)
    results["fused_plus_fold"] = _timeit(k_fold, pool, iters)
    print(f"fused_plus_fold: {results['fused_plus_fold']:.2f} ms", flush=True)

    import json
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
