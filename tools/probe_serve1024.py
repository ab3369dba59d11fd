"""1024² single-chip serving probe (VERDICT r4 #8 stretch).

The spatial mesh axis exists for big single requests, but the largest size
ever served on real silicon was 512². This measures a 1024² serve bucket on
the one real chip: compiled memory stats first (argument/output/temp — the
go/no-go), then the bench_infer methodology (device-resident distinct
inputs, scanned loop, forced readback) for img/s.

    python tools/probe_serve1024.py [batch] [--no-attention]

Attention note: at 1024² the stage-2 feature map is 256² = 65,536 patch
tokens; the dense score matrix would be ~17 GB — only the streaming/flash
kernel regime or the XLA fallback's blockwise path can run it. The fused
VMEM-resident kernel's gate auto-falls-back at this size (ops/dispatch.py).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4

    from gan_inpainting_tpu.bench import bench_infer
    from gan_inpainting_tpu.configs.base import apply_overrides, get_config

    overrides = ["data.image_size=1024", "train.mesh.data=-1",
                 "train.mesh.model=1"]
    if "--no-attention" in sys.argv:
        overrides.append("model.use_attention=false")
    cfg = apply_overrides(get_config("serve_v4_8"), overrides)

    # compiled memory first: if 1024² doesn't fit, report that, not a crash
    import jax
    import jax.numpy as jnp

    from gan_inpainting_tpu.data.pipeline import denormalize, normalize
    from gan_inpainting_tpu.models.generator import build_generator
    from gan_inpainting_tpu.parallel.mesh import build_mesh
    from gan_inpainting_tpu.parallel.sharding import replicated
    from gan_inpainting_tpu.train.state import create_state

    mesh = build_mesh(cfg.train.mesh)
    state = create_state(cfg, jax.random.key(0))
    gen = build_generator(cfg.model)
    size = cfg.data.image_size

    def forward(params, image_u8, mask):
        image = normalize(image_u8).astype(jnp.bfloat16)
        m16 = mask.astype(jnp.bfloat16)
        out = gen.apply({"params": params}, image * (1 - m16), m16)
        out_u8 = denormalize(out.fine.astype(jnp.float32))
        return jnp.where(mask <= 0.0, image_u8, out_u8)

    with jax.set_mesh(mesh):
        params = jax.device_put(state.g_params, replicated(mesh))
        lowered = jax.jit(forward).lower(
            params,
            jax.ShapeDtypeStruct((batch, size, size, 3), jnp.uint8),
            jax.ShapeDtypeStruct((batch, size, size, 1), jnp.float32))
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        stats = {
            "batch": batch,
            "temp_mb": round(mem.temp_size_in_bytes / 2**20, 1),
            "args_mb": round(mem.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(mem.output_size_in_bytes / 2**20, 1),
        }
        print("MEM " + json.dumps(stats), flush=True)

    res = bench_infer(cfg, batch=batch, iters=5, warmup=2)
    out = {"metric": "1024x1024 inpaint images/sec/chip",
           "value": round(res["value"], 2), "batch": batch,
           "attention": cfg.model.use_attention, **stats}
    print("SERVE1024 " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
