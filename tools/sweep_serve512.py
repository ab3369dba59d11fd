"""512² serve optimization sweep (VERDICT r4 #4 — the 512² roofline pass).

The 256² serve path got a full per-family floor analysis (docs/ROOFLINE.md);
the 512² guard-tracked serve number (91.4 img/s b32) never did. This sweeps
the levers that are plausibly different at 512² from their measured-at-256²
settings, using the house bench_infer methodology (distinct device-resident
inputs, lax.scan, forced scalar readback):

* batch geometry: 16 / 32 / 64 — the 256² sweep saturated at b128, but at
  512² the activation footprint is 4× and the best batch may differ;
* attention backend at 512² serve shapes: auto(=pallas streaming/fused) vs
  the XLA dense path — the dispatch winner was measured at 256²;
* ``model.fuse_upsample`` off — the decoder d2s fusion won at 256²; its
  traffic scales with H·W so the 512² verdict is not automatic.

One JSON line per variant, cumulative; run on TPU in the background:

    python tools/sweep_serve512.py
"""

from __future__ import annotations

import json
import time


def main() -> int:
    from gan_inpainting_tpu.bench import bench_infer
    from gan_inpainting_tpu.configs.base import apply_overrides, get_config
    from gan_inpainting_tpu.ops.dispatch import override_backend

    base = ["data.image_size=512", "train.mesh.data=-1", "train.mesh.model=1"]

    def cfg_for(extra=()):
        return apply_overrides(get_config("serve_v4_8"), base + list(extra))

    variants = [
        ("b16", cfg_for(), dict(batch=16), None),
        ("b32_baseline", cfg_for(), dict(batch=32), None),
        ("b64", cfg_for(), dict(batch=64), None),
        ("b32_attn_xla", cfg_for(), dict(batch=32), "xla"),
        ("b32_no_fuse_upsample", cfg_for(["model.fuse_upsample=false"]),
         dict(batch=32), None),
    ]

    results = {}
    for name, cfg, kw, backend in variants:
        t0 = time.perf_counter()
        try:
            if backend is not None:
                with override_backend(backend):
                    r = bench_infer(cfg, iters=5, warmup=2, **kw)
            else:
                r = bench_infer(cfg, iters=5, warmup=2, **kw)
            results[name] = {"img_per_s": round(r["value"], 2),
                             "wall_s": round(time.perf_counter() - t0, 1)}
        except Exception as e:  # keep sweeping; record the failure
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200],
                             "wall_s": round(time.perf_counter() - t0, 1)}
        print("SWEEP512 " + json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
