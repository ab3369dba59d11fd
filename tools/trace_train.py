"""Op-level time breakdown of a full G+D train step on TPU.

The train-side sibling of trace_serve.py (VERDICT r2 #3: give the 512²
train configs the serve treatment). Captures a jax.profiler trace around a
few scanned train steps of a named config and prints the top ops by device
time via trace_serve.analyze.

    python tools/trace_train.py [config] [outdir] [override k=v ...]
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from trace_serve import analyze  # noqa: E402


def capture(config: str, outdir: str, overrides: list[str],
            iters: int = 3) -> None:
    import jax
    import jax.numpy as jnp

    from gan_inpainting_tpu.configs.base import apply_overrides, get_config
    from gan_inpainting_tpu.data.pipeline import make_train_batch
    from gan_inpainting_tpu.data.synthetic import synthetic_batch_u8
    from gan_inpainting_tpu.parallel.mesh import build_mesh
    from gan_inpainting_tpu.parallel.sharding import replicated
    from gan_inpainting_tpu.train.state import create_state
    from gan_inpainting_tpu.train.step import make_train_step
    from gan_inpainting_tpu.utils.rng import make_streams

    cfg = apply_overrides(get_config(config),
                          ["train.mesh.data=-1", "train.mesh.model=1",
                           *overrides])
    mesh = build_mesh(cfg.train.mesh)
    streams = make_streams(0)
    state = create_state(cfg, jax.random.key(0))
    train_step = make_train_step(cfg, donate=False)
    size = cfg.data.image_size
    images = synthetic_batch_u8(jax.random.key(2), cfg.data.batch_size, size)

    # ONE step per dispatch, not a lax.scan: a scanned loop shows up in the
    # xplane as a single opaque %while covering ~half the time, hiding the
    # per-op breakdown this tool exists to produce. Dispatch overhead rides
    # the gap between steps, not the per-op durations.
    @jax.jit
    def run(state, images, step):
        batch = make_train_batch(images, streams["masks"].at_step(step),
                                 cfg.mask)
        st, metrics = train_step(state, batch,
                                 streams["train"].at_step(step))
        return st, metrics["d_loss"]

    with jax.set_mesh(mesh):
        state = jax.device_put(state, replicated(mesh))
        images = jax.device_put(images, replicated(mesh))
        step0 = jnp.int32(0)
        compiled = run.lower(state, images, step0).compile()
        mem = compiled.memory_analysis()
        print(f"temp memory: {mem.temp_size_in_bytes/2**20:.1f} MB",
              flush=True)
        state2, loss = compiled(state, images, step0)
        jax.block_until_ready(loss)             # warm outside the trace
        with jax.profiler.trace(outdir):
            for _ in range(iters):
                state2, loss = compiled(state2, images, step0)
            float(loss)


def main() -> int:
    config = sys.argv[1] if len(sys.argv) > 1 else "places512_sn_vgg"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/trace_train"
    overrides = [a for a in sys.argv[3:] if "=" in a]
    if os.environ.get("TRACE_ANALYZE_ONLY") != "1":
        capture(config, outdir, overrides)
    analyze(outdir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
