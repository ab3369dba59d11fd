"""Per-device memory accounting for spatial partitioning.

Compiles the real serve forward (bucketed jit, coarse-to-fine generator,
XLA attention path — the same program `Inpainter` runs on a spatial mesh)
at one or more sizes on a 1-device mesh and on a row-sharded
(data=1, model=1, spatial=N) mesh, and prints each program's per-device
compiled memory stats (XLA's CompiledMemoryStats). This is the evidence
behind the SP memory claim in docs/DESIGN.md §5: every activation —
including the dense attention score matrix, the largest single allocation
at high resolution — lives 1/spatial per device.

Runs on the 8-virtual-CPU-device backend (compile-only; nothing is
executed), so it works on any host:

    python tools/sp_memory.py --sizes 256,512 --spatial 8
"""

from __future__ import annotations

import argparse
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def compiled_stats(cfg, mesh, batch: int, size: int):
    """Compile the serve-forward bucket program and return its memory
    stats (per-device; XLA reports the stats of one shard's program)."""
    from gan_inpainting_tpu.infer.inpaint import Inpainter
    from gan_inpainting_tpu.train.state import create_state

    state = create_state(cfg, jax.random.key(0))
    inp = Inpainter(cfg, state.g_params, mesh=mesh)
    fwd = inp._forward(batch, size)
    img = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.uint8)
    msk = jax.ShapeDtypeStruct((batch, size, size, 1), jnp.float32)
    with jax.set_mesh(mesh):
        compiled = fwd.lower(inp.g_params, img, msk).compile()
    return compiled.memory_analysis()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="serve_v4_8")
    parser.add_argument("--sizes", default="256,512")
    parser.add_argument("--spatial", type=int, default=8)
    parser.add_argument("--batch", type=int, default=1)
    args = parser.parse_args()

    from gan_inpainting_tpu.configs.base import apply_overrides, get_config
    from gan_inpainting_tpu.parallel.mesh import MeshConfig, build_mesh

    sizes = [int(s) for s in args.sizes.split(",")]
    cfg = get_config(args.config)
    cfg = apply_overrides(cfg, [
        f"infer.batch_buckets={args.batch}",
        "infer.size_buckets=" + ",".join(str(s) for s in sizes),
    ])

    devices = jax.devices()
    mesh1 = build_mesh(MeshConfig(data=1, model=1), devices=devices[:1])
    mesh_sp = build_mesh(
        MeshConfig(data=1, model=1, spatial=args.spatial), devices=devices)

    print(f"{'size':>6} {'mesh':>12} {'temp MB/dev':>12} {'args MB/dev':>12} "
          f"{'out MB/dev':>11}")
    for size in sizes:
        for name, mesh in (("1-device", mesh1),
                           (f"spatial={args.spatial}", mesh_sp)):
            ma = compiled_stats(cfg, mesh, args.batch, size)
            mb = 1024 * 1024
            print(f"{size:>6} {name:>12} {ma.temp_size_in_bytes / mb:>12.1f} "
                  f"{ma.argument_size_in_bytes / mb:>12.1f} "
                  f"{ma.output_size_in_bytes / mb:>11.1f}")


if __name__ == "__main__":
    main()
