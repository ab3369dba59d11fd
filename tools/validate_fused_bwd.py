"""Hardware validation of the in-kernel fused-attention backward.

VERDICT r2 #2's done-criteria, run on the real TPU:
  1. gradient oracle comparison at the real 512² train attention shape
     (128² feature map, c = 4f = 192, batch 1) — fused in-kernel backward
     vs the dense XLA composition, f32;
  2. measured Δ vs the materialized streaming-flash backward at the same
     shape: wall time of the attention VJP (scanned, forced readback) and
     compiled temp-memory footprint (jit memory_analysis).

Prints one JSON line. ~3-6 min including compiles.

    python tools/validate_fused_bwd.py [--skip-timing]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _grad_fn(hole):
    from gan_inpainting_tpu.ops.contextual_attention import (
        contextual_attention,
    )

    def loss(f_, backend):
        return jnp.sum(jnp.sin(contextual_attention(f_, f_, hole,
                                                    backend=backend)))

    return loss


def main() -> int:
    out: dict = {"device": str(jax.devices()[0])}

    # worker health probe (CLAUDE.md: detect a wedged axon worker early)
    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((8, 128))))
    out["probe_s"] = round(time.perf_counter() - t0, 1)

    b, hw, c = 1, 128, 192  # 512² flagship train shape at the attention op
    key = jax.random.key(0)
    f32 = jax.random.normal(key, (b, hw, hw, c), jnp.float32)
    hole = (jax.random.uniform(jax.random.key(1), (b, hw, hw, 1))
            > 0.6).astype(jnp.float32)
    loss = _grad_fn(hole)

    # --- 1. oracle comparison (f32) ------------------------------------
    from gan_inpainting_tpu.ops.pallas.fused_attention_bwd import bwd_plan

    out["bwd_plan"] = bwd_plan(hw // 2, hw // 2, c, 2)
    g_ref = np.asarray(jax.jit(jax.grad(loss), static_argnums=1)(f32, "xla"))
    g_fused = np.asarray(
        jax.jit(jax.grad(loss), static_argnums=1)(f32, "pallas"))
    denom = np.abs(g_ref).max() or 1.0
    rel = np.abs(g_fused - g_ref).max() / denom
    out["oracle_max_rel_err"] = float(rel)
    out["oracle_ok"] = bool(rel < 2e-4)

    if "--skip-timing" in sys.argv:
        print(json.dumps(out))
        return 0 if out["oracle_ok"] else 1

    # --- 2. fused vs materialized backward: time + temp memory ----------
    bt = 8
    fb = jax.random.normal(key, (bt, hw, hw, c), jnp.bfloat16)
    holeb = (jax.random.uniform(jax.random.key(2), (bt, hw, hw, 1))
             > 0.6).astype(jnp.float32)
    lossb = _grad_fn(holeb)

    def timed(tag: str):
        # INPAINT_FUSED_BWD is read at trace time — retrace per setting
        grad = jax.jit(lambda x: jax.grad(lossb, argnums=0)(x, "pallas"))
        iters = 8
        pool = fb[None] + 0.001 * jnp.arange(iters, dtype=jnp.bfloat16)[
            :, None, None, None, None]

        @jax.jit
        def run(pool):
            def body(acc, x):
                g = grad(x)
                return acc + jnp.sum(g.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), pool)
            return acc

        lowered = run.lower(pool)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        jax.block_until_ready(pool)
        float(compiled(pool))                       # warm
        t0 = time.perf_counter()
        float(compiled(pool))                       # forced readback
        dt = (time.perf_counter() - t0) / iters
        out[f"{tag}_ms_per_bwd"] = round(dt * 1e3, 2)
        out[f"{tag}_temp_mb"] = round(mem.temp_size_in_bytes / 2**20, 1)

    os.environ["INPAINT_FUSED_BWD"] = "1"
    timed("fused")
    os.environ["INPAINT_FUSED_BWD"] = "0"
    timed("materialized")
    os.environ["INPAINT_FUSED_BWD"] = "1"

    out["speedup"] = round(
        out["materialized_ms_per_bwd"] / out["fused_ms_per_bwd"], 3)
    print(json.dumps(out))
    return 0 if out["oracle_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
