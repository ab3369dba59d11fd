"""Folder-loader throughput benchmark (VERDICT r1 next #7).

Proves the real-data path feeds training at rate: writes N synthetic JPEGs
to a temp dir, then measures decoded images/sec through the production
`_folder_iter` (native C++ JPEG tier when built, PIL otherwise) at the
places512 shape, and compares against the training consumption rate.

    python tools/bench_loader.py [n_images] [image_px] [target_size] [threads]

Host-only (numpy + PIL); safe to run alongside nothing else heavy.
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile
import time

import numpy as np


def make_dataset_dir(n: int, px: int, root: pathlib.Path) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(n):
        # structured image: JPEG-encodes at realistic entropy (pure noise
        # would overweight decode cost; flat color would underweight it)
        yy, xx = np.mgrid[0:px, 0:px].astype(np.float32) / px
        phase = rng.uniform(0, 6.28, 3).astype(np.float32)
        freq = rng.uniform(2, 12, 3).astype(np.float32)
        img = np.stack([np.sin(freq[c] * (yy + xx) + phase[c])
                        for c in range(3)], -1)
        img += 0.15 * rng.standard_normal((px, px, 3)).astype(np.float32)
        img_u8 = np.clip((img + 1.3) * 98.0, 0, 255).astype(np.uint8)
        Image.fromarray(img_u8).save(root / f"img_{i:05d}.jpg", quality=90)


def _measure(tmp: str, size: int, batch: int, threads: int, cache: str,
             cache_dir: str, n_batches: int = 40) -> float:
    from gan_inpainting_tpu.configs.base import DataConfig
    from gan_inpainting_tpu.data.loader import _folder_iter

    cfg = DataConfig(dataset="folder", root=tmp, image_size=size,
                     batch_size=batch, loader_threads=threads,
                     loader_cache=cache, loader_cache_dir=cache_dir)
    it = _folder_iter(cfg, seed=0, batch_size=batch, split="train")
    # warm: fill the pipeline + JIT-free steady state (for the cache tier
    # this also pays the one-time decode epoch)
    for _ in range(6):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        b = next(it)
    dt = time.perf_counter() - t0
    assert b.shape == (batch, size, size, 3) and b.dtype == np.uint8
    return n_batches * batch / dt


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    px = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    sweep = "--sweep" in sys.argv

    from gan_inpainting_tpu.data import native_loader

    with tempfile.TemporaryDirectory() as tmp:
        root = pathlib.Path(tmp)
        t0 = time.perf_counter()
        make_dataset_dir(n, px, root)
        print(f"wrote {n} {px}px JPEGs in {time.perf_counter()-t0:.1f}s",
              flush=True)
        cache_dir = str(root / "_cache")
        batch = 8 if size >= 512 else 64

        if sweep:
            # thread-scaling curve + the cache tier, for SURVEY §8's
            # loader-at-rate table (VERDICT r2 #6)
            table = {}
            for threads in (1, 2, 4, 8):
                ips = _measure(tmp, size, batch, threads, "off", cache_dir)
                table[f"decode_t{threads}"] = round(ips, 1)
                print(f"threads={threads} decode {ips:.1f} img/s",
                      flush=True)
            ips = _measure(tmp, size, batch, 1, "on", cache_dir)
            table["cached"] = round(ips, 1)
            print(f"cached {ips:.1f} img/s", flush=True)
            print(json.dumps({
                "metric": f"folder loader {px}px->{size}px images/sec",
                "native_loader": native_loader.available(),
                "batch": batch,
                **table,
            }))
            return 0

        threads = int(sys.argv[4]) if len(sys.argv) > 4 else 2
        ips = _measure(tmp, size, batch, threads, "off", cache_dir)
        out = {
            "metric": f"folder loader {px}px->{size}px images/sec",
            "value": round(ips, 1),
            "native_loader": native_loader.available(),
            "threads": threads,
            "batch": batch,
        }
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
