"""Load-test the serving tier on TPU (VERDICT r3 #4): p50/p99 latency and
sustained img/s under N concurrent clients through the real
InpaintService micro-batcher.

Sweeps client counts; per point reports sustained images/sec, p50/p99
end-to-end latency, dispatch count and mean device batch size (the
coalescing evidence). Emits one JSON line per point plus a markdown table.

Box caveat (recorded with the numbers): this dev box's host→device path is
an HTTP loopback relay measured at ~8 MB/s (bench.py docstring), which no
real deployment has — at 256² uint8 that alone caps ~40 img/s. The
device-side forward sustains 574 img/s (BENCH_r03). The load test is
therefore evidence of the BATCHING tier (latency distribution, coalescing,
backpressure) — the throughput ceiling on this box is the relay, not the
service.

Run (TPU, background): python tools/load_serve.py [--clients 1,4,16,64]
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np


def run_point(service, images, masks, n_clients: int, per_client: int,
              inner=None) -> dict:
    lat: list[float] = []
    lock = threading.Lock()
    errors: list[str] = []

    def client(cid: int):
        rng = np.random.default_rng(cid)
        for _ in range(per_client):
            i = rng.integers(0, len(images))
            t0 = time.perf_counter()
            try:
                service.submit(images[i], masks[i]).result(timeout=600)
            except Exception as e:  # noqa: BLE001 — recorded, not raised
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")
                continue
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    d0 = service.stats["dispatches"]
    if inner is not None:
        inner.batch_sizes.clear()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(n_clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    lat.sort()
    n = len(lat)
    point = {
        "clients": n_clients,
        "requests": n,
        "errors": len(errors),
        "wall_s": round(wall, 2),
        "img_per_sec": round(n / wall, 2),
        "p50_ms": round(1e3 * lat[n // 2], 1) if n else None,
        "p99_ms": round(1e3 * lat[min(n - 1, int(0.99 * n))], 1) if n else None,
        "dispatches": service.stats["dispatches"] - d0,
    }
    if inner is not None and inner.batch_sizes:
        point["mean_batch"] = round(float(np.mean(inner.batch_sizes)), 1)
    if errors:
        point["first_error"] = errors[0]
    return point


class _CountingInpainter:
    """Pass-through that records device batch sizes per dispatch."""

    def __init__(self, inner):
        self._inner = inner
        self.cfg = inner.cfg
        self.batch_sizes: list[int] = []

    def inpaint_batch(self, images, masks):
        self.batch_sizes.append(images.shape[0])
        return self._inner.inpaint_batch(images, masks)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", default="1,4,16,64")
    ap.add_argument("--per-client", type=int, default=None,
                    help="requests per client (default: 256/clients, min 4)")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--buckets", default="1,8,64",
                    help="batch buckets (r4's sweep showed the 16-client "
                    "dip is bucket geometry: groups of 16 pad 4x into the "
                    "64 bucket; pass 1,8,16,32,64 to measure the fix)")
    args = ap.parse_args()

    import jax

    from gan_inpainting_tpu.configs.base import apply_overrides, get_config
    from gan_inpainting_tpu.infer.inpaint import Inpainter
    from gan_inpainting_tpu.infer.service import InpaintService
    from gan_inpainting_tpu.train.state import create_state

    size = args.size
    cfg = get_config("serve_v4_8")
    cfg = apply_overrides(cfg, [
        f"data.image_size={size}", "train.mesh.data=-1",
        "train.mesh.model=1", f"infer.batch_buckets={args.buckets}",
        f"infer.size_buckets={size}"])
    state = create_state(cfg, jax.random.key(0))
    inpainter = Inpainter(cfg, state.g_params)
    print("[load_serve] warming serve buckets (compiles)...", flush=True)
    inpainter.warmup()

    counting = _CountingInpainter(inpainter)
    service = InpaintService(counting, max_wait_ms=args.max_wait_ms)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (16, size, size, 3), dtype=np.uint8)
    masks = np.zeros((16, size, size), np.float32)
    masks[:, size // 4: -size // 4, size // 4: -size // 4] = 1.0

    points = []
    for n_clients in [int(c) for c in args.clients.split(",")]:
        per_client = args.per_client or max(256 // n_clients, 4)
        point = run_point(service, images, masks, n_clients, per_client,
                          inner=counting)
        point["max_wait_ms"] = args.max_wait_ms
        points.append(point)
        print(json.dumps(point), flush=True)

    print("\n| clients | img/s | p50 ms | p99 ms | mean batch | dispatches |")
    print("|---|---|---|---|---|---|")
    for p in points:
        print(f"| {p['clients']} | {p['img_per_sec']} | {p['p50_ms']} | "
              f"{p['p99_ms']} | {p.get('mean_batch', '-')} | "
              f"{p['dispatches']} |")
    service.close()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
