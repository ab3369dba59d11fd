"""Profile the flagship 256² serve forward on TPU (VERDICT r1 next #1).

Emits:
* exact FLOPs/image from XLA cost analysis + achieved TF/s + MFU vs the
  v5e bf16 peak (~197 TF/s);
* a per-phase time split by benching ablations (attention on/off, coarse
  stage only) — coarse-grained but honest, using the same scan+readback
  methodology as gan_inpainting_tpu/bench.py.

Run on TPU (background; first compiles take minutes):
    python tools/profile_serve.py [batch]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

V5E_BF16_PEAK_TFS = 197.0


def _bench_fn(fn, args_pool, iters):
    """Time fn over a pool of distinct device-resident inputs (dedupe-safe)."""

    @jax.jit
    def run(pool):
        def body(acc, args):
            out = fn(*args)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), pool)
        return acc

    float(run(args_pool))  # compile + warm
    float(run(args_pool))
    t0 = time.perf_counter()
    float(run(args_pool))
    return (time.perf_counter() - t0) / iters


def main(batch: int = 128, iters: int = 8) -> int:
    from gan_inpainting_tpu.configs.base import apply_overrides, get_config
    from gan_inpainting_tpu.data.masks import random_mask
    from gan_inpainting_tpu.data.synthetic import synthetic_batch
    from gan_inpainting_tpu.models.generator import build_generator
    from gan_inpainting_tpu.parallel.mesh import build_mesh
    from gan_inpainting_tpu.parallel.sharding import replicated
    from gan_inpainting_tpu.train.state import create_state

    cfg = get_config("serve_v4_8")
    cfg = apply_overrides(cfg, ["train.mesh.data=-1", "train.mesh.model=1"])
    size = cfg.data.image_size
    mesh = build_mesh(cfg.train.mesh)
    state = create_state(cfg, jax.random.key(0))

    variants = {
        "full": cfg.model,
        "no_attention": apply_overrides(cfg, ["model.use_attention=false"]).model,
    }

    @functools.partial(jax.jit, static_argnums=())
    def make_pool(key):
        def one(k):
            img = synthetic_batch(k, batch, size).astype(jnp.bfloat16)
            keys = jax.random.split(jax.random.fold_in(k, 1), batch)
            m = jax.vmap(lambda kk: random_mask(kk, size, size, cfg.mask))(keys)
            return img, m.astype(jnp.bfloat16)
        return jax.vmap(one)(jax.random.split(key, iters))

    report = {"batch": batch, "size": size}
    with jax.set_mesh(mesh):
        pool = make_pool(jax.random.key(7))
        jax.block_until_ready(pool)

        for name, mcfg in variants.items():
            gen = build_generator(mcfg)
            params = jax.device_put(state.g_params, replicated(mesh)) \
                if name == "full" else None
            if params is None:
                # different variant needs its own params (attention branch
                # params subset differs) — re-init cheaply
                st = create_state(apply_overrides(
                    cfg, ["model.use_attention=false"]), jax.random.key(0))
                params = jax.device_put(st.g_params, replicated(mesh))

            def fwd(img, mask, gen=gen, params=params):
                out = gen.apply({"params": params}, img * (1 - mask), mask)
                return out.fine

            # FLOPs from XLA cost analysis on the single-batch program
            lowered = jax.jit(fwd).lower(pool[0][0], pool[1][0])
            cost = lowered.compile().cost_analysis()
            flops = float(cost.get("flops", -1.0))
            dt = _bench_fn(fwd, pool, iters)
            ips = batch / dt
            tfs = flops * ips / 1e12 / batch if flops > 0 else -1.0
            report[name] = {
                "flops_per_batch": flops,
                "flops_per_image_g": round(flops / batch / 1e9, 2),
                "ms_per_batch": round(dt * 1e3, 2),
                "images_per_sec": round(ips, 1),
                "achieved_tflops": round(tfs, 1),
                "mfu_vs_v5e_peak": round(tfs / V5E_BF16_PEAK_TFS, 3),
                "bytes_accessed_gb": round(
                    float(cost.get("bytes accessed", -1.0)) / 1e9, 2),
            }
            print(json.dumps({name: report[name]}), flush=True)

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    sys.exit(main(b))
