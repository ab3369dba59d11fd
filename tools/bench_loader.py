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


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    px = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    threads = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from gan_inpainting_tpu.configs.base import DataConfig
    from gan_inpainting_tpu.data import native_loader
    from gan_inpainting_tpu.data.loader import _folder_iter

    with tempfile.TemporaryDirectory() as tmp:
        root = pathlib.Path(tmp)
        t0 = time.perf_counter()
        make_dataset_dir(n, px, root)
        print(f"wrote {n} {px}px JPEGs in {time.perf_counter()-t0:.1f}s",
              flush=True)

        batch = 8  # places512 batch size
        cfg = DataConfig(dataset="folder", root=tmp, image_size=size,
                         batch_size=batch, loader_threads=threads)
        it = _folder_iter(cfg, seed=0, batch_size=batch, split="train")
        # warm: fill the pipeline + JIT-free steady state
        for _ in range(6):
            next(it)
        t0 = time.perf_counter()
        n_batches = 40
        for _ in range(n_batches):
            b = next(it)
        dt = time.perf_counter() - t0
        assert b.shape == (batch, size, size, 3) and b.dtype == np.uint8

        ips = n_batches * batch / dt
        out = {
            "metric": f"folder loader {px}px->{size}px images/sec",
            "value": round(ips, 1),
            "native_loader": native_loader.available(),
            "threads": threads,
            "batches_per_sec": round(n_batches / dt, 2),
        }
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
