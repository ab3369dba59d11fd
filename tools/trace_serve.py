"""Op-level time breakdown of the flagship 256² serve forward on TPU.

Captures a jax.profiler trace around a few forward batches, then parses the
raw ``*.xplane.pb`` device plane directly (tensorflow.tsl xplane proto — the
tensorboard_plugin_profile convert path is broken on this box) and prints
the top ops by accumulated device time. This is the profile-driven step of
VERDICT r1 "Next round" #1.

Run on TPU (background; compiles take minutes):
    python tools/trace_serve.py [batch] [outdir]
"""

from __future__ import annotations

import collections
import glob
import os
import sys


def capture(batch: int, outdir: str, iters: int = 6,
            size: int | None = None,
            extra_overrides: list[str] | None = None) -> None:
    import functools

    import jax
    import jax.numpy as jnp

    from gan_inpainting_tpu.configs.base import apply_overrides, get_config
    from gan_inpainting_tpu.data.masks import random_mask
    from gan_inpainting_tpu.data.synthetic import synthetic_batch
    from gan_inpainting_tpu.models.generator import build_generator
    from gan_inpainting_tpu.parallel.mesh import build_mesh
    from gan_inpainting_tpu.parallel.sharding import replicated
    from gan_inpainting_tpu.train.state import create_state

    cfg = get_config("serve_v4_8")
    overrides = ["train.mesh.data=-1", "train.mesh.model=1"]
    if size is not None:
        overrides.append(f"data.image_size={size}")
    cfg = apply_overrides(cfg, overrides + list(extra_overrides or []))
    size = cfg.data.image_size
    mesh = build_mesh(cfg.train.mesh)
    state = create_state(cfg, jax.random.key(0))
    gen = build_generator(cfg.model)

    @functools.partial(jax.jit, static_argnums=())
    def make_pool(key):
        def one(k):
            img = synthetic_batch(k, batch, size).astype(jnp.bfloat16)
            keys = jax.random.split(jax.random.fold_in(k, 1), batch)
            m = jax.vmap(lambda kk: random_mask(kk, size, size, cfg.mask))(keys)
            return img, m.astype(jnp.bfloat16)
        return jax.vmap(one)(jax.random.split(key, iters))

    @jax.jit
    def run(params, pool):
        def body(acc, args):
            img, mask = args
            out = gen.apply({"params": params}, img * (1 - mask), mask)
            return acc + jnp.sum(out.fine.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), pool)
        return acc

    with jax.set_mesh(mesh):
        params = jax.device_put(state.g_params, replicated(mesh))
        pool = make_pool(jax.random.key(7))
        jax.block_until_ready(pool)
        float(run(params, pool))  # compile + warm outside the trace
        with jax.profiler.trace(outdir):
            float(run(params, pool))


def analyze(outdir: str, top: int = 40) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb found under", outdir)
        return
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        per_op = collections.Counter()
        total_ps = 0
        for line in plane.lines:
            # XLA Ops / XLA TraceMe lines carry per-op events; take the
            # finest-granularity line ("XLA Ops") when present
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                per_op[name] += ev.duration_ps
                total_ps += ev.duration_ps
        if not per_op:
            # fall back: aggregate every line
            for line in plane.lines:
                for ev in line.events:
                    name = f"{line.name}::{ev_meta[ev.metadata_id].name}"
                    per_op[name] += ev.duration_ps
                    total_ps += ev.duration_ps
        print(f"== plane {plane.name}: total {total_ps/1e9:.3f} ms "
              f"across {len(per_op)} ops")
        # group fusions by a coarse family for readability
        fam = collections.Counter()
        for name, ps in per_op.items():
            base = name.split(".")[0].rstrip("0123456789_")
            fam[base] += ps
        print("-- by family:")
        for name, ps in fam.most_common(20):
            print(f"  {ps/1e9:9.3f} ms  {100*ps/max(total_ps,1):5.1f}%  {name}")
        print(f"-- top {top} individual ops:")
        for name, ps in per_op.most_common(top):
            print(f"  {ps/1e9:9.3f} ms  {100*ps/max(total_ps,1):5.1f}%  {name}")


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/trace_serve"
    size = int(sys.argv[3]) if len(sys.argv) > 3 else None  # e.g. 512
    extra = [a for a in sys.argv[4:] if "=" in a]  # config overrides k=v
    if os.environ.get("TRACE_ANALYZE_ONLY") != "1":
        capture(batch, outdir, size=size, extra_overrides=extra)
    analyze(outdir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
