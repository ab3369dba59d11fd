"""Host-side dataset iterators (reference R1's Dataset/DataLoader role).

Two backends behind one factory:

* ``synthetic`` — on-device procedural images (data/synthetic.py). The
  iterator yields PRNG-derived uint8 batches; no host IO at all.
* ``folder``   — a directory of image files, decoded with PIL on the host,
  resized to the target square, yielded as uint8 NHWC numpy batches. This is
  the CelebA/CelebA-HQ/Places2 path when a real dataset directory exists
  (BASELINE.json:7-9). Single-process with a small prefetch thread — the
  reference's multi-worker DataLoader is unnecessary because decode+resize of
  uint8 is cheap relative to a TPU train step and everything downstream is
  fused on device.

Both yield plain uint8 arrays; mask synthesis + normalization happen on
device (data/pipeline.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib
import queue
import threading
from typing import Iterator

import numpy as np

import jax

from gan_inpainting_tpu.configs.base import DataConfig
from gan_inpainting_tpu.data.synthetic import synthetic_batch_u8

_IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}


def source_size(cfg: DataConfig, split: str = "train") -> int:
    """Loader decode/resize target for a split.

    With ``random_crop`` on, train images are supplied at 9/8× the train
    size (128→144, 256→288, 512→576) and the preprocess jit slices the
    random window (data/pipeline.py). Eval always gets image_size.
    """
    if split == "train" and cfg.random_crop:
        return cfg.image_size * 9 // 8
    return cfg.image_size


def _synthetic_iter(cfg: DataConfig, seed: int, batch_size: int,
                    size: int) -> Iterator[np.ndarray]:
    key = jax.random.key(seed)
    # synthetic_size is the virtual dataset length: after that many distinct
    # images the key stream wraps, so training sees repeated "epochs" exactly
    # like a finite folder dataset would
    batches_per_epoch = max(cfg.synthetic_size // batch_size, 1)
    step = 0
    while True:
        k = jax.random.fold_in(key, step % batches_per_epoch)
        yield synthetic_batch_u8(k, batch_size, size, cfg.synthetic_family)
        step += 1


def _load_image(path: pathlib.Path, size: int) -> np.ndarray:
    from PIL import Image  # local import: PIL only needed for folder datasets

    with Image.open(path) as im:
        im = im.convert("RGB")
        # center-crop to square then resize (standard CelebA treatment)
        w, h = im.size
        s = min(w, h)
        left, top = (w - s) // 2, (h - s) // 2
        im = im.crop((left, top, left + s, top + s))
        im = im.resize((size, size), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


def _load_batch(files: list[pathlib.Path], size: int) -> np.ndarray:
    """Decode a batch: native C++ loader for JPEGs, PIL for the rest."""
    from gan_inpainting_tpu.data import native_loader

    jpeg = all(p.suffix.lower() in (".jpg", ".jpeg") for p in files)
    if jpeg and native_loader.available():
        batch, ok = native_loader.load_batch([str(p) for p in files], size)
        if ok.all():
            return batch
        for i in np.flatnonzero(~ok):  # corrupt file → PIL second opinion
            batch[i] = _load_image(files[i], size)
        return batch
    return np.stack([_load_image(p, size) for p in files])


def _cache_wanted(cfg: DataConfig) -> bool:
    if cfg.loader_cache == "on":
        return True
    if cfg.loader_cache == "off":
        return False
    if cfg.loader_cache != "auto":
        raise ValueError(f"loader_cache must be auto|on|off, "
                         f"got {cfg.loader_cache!r}")
    return cfg.image_size <= 256


def _cache_array(files: list[pathlib.Path], size: int,
                 cache_dir: str) -> np.memmap:
    """Decode-once uint8 cache: one (N, size, size, 3) memmap per
    (file list, size). Validated by a sidecar manifest (paths + mtimes +
    size) so a changed dataset rebuilds; built atomically via rename so a
    killed build never yields a half-written cache."""
    base = (pathlib.Path(cache_dir) if cache_dir
            else pathlib.Path(os.path.expanduser("~/.cache/gan_inpainting_tpu")))
    base.mkdir(parents=True, exist_ok=True)
    manifest = {
        "size": size,
        "files": [[str(p), p.stat().st_mtime_ns] for p in files],
    }
    digest = hashlib.sha256(
        json.dumps(manifest, sort_keys=True).encode()).hexdigest()[:24]
    data_path = base / f"{digest}_{size}.u8"
    shape = (len(files), size, size, 3)
    if not data_path.exists():
        tmp = data_path.with_suffix(".building")
        mm = np.memmap(tmp, dtype=np.uint8, mode="w+", shape=shape)
        chunk = 64
        for start in range(0, len(files), chunk):
            mm[start:start + chunk] = _load_batch(
                files[start:start + chunk], size)
        mm.flush()
        del mm
        (base / f"{digest}_{size}.json").write_text(json.dumps(manifest))
        os.replace(tmp, data_path)
    return np.memmap(data_path, dtype=np.uint8, mode="r", shape=shape)


def _folder_iter(cfg: DataConfig, seed: int, batch_size: int,
                 split: str, size: int) -> Iterator[np.ndarray]:
    root = pathlib.Path(cfg.root)
    files = sorted(p for p in root.rglob("*")
                   if p.suffix.lower() in _IMG_EXTS)
    if not files:
        raise FileNotFoundError(f"no images under {root}")
    # deterministic 95/5 train/eval split by index hash
    files = [p for i, p in enumerate(files)
             if (i % 20 == 0) == (split == "eval")]
    rng = np.random.default_rng(seed)
    n_threads = max(int(cfg.loader_threads), 1)

    if _cache_wanted(cfg):
        # NOTE _folder_iter is a generator function — `yield from`, not
        # `return` (a bare return here would just end the generator)
        cache = _cache_array(files, size, cfg.loader_cache_dir)
        while True:
            idx = rng.permutation(len(files))
            for start in range(0, len(idx) - batch_size + 1, batch_size):
                ids = idx[start:start + batch_size]
                yield np.ascontiguousarray(cache[ids])

    # one index producer feeds batch index lists; loader_threads decoder
    # workers decode in parallel (PIL/native decode releases the GIL in
    # the C layers). Each epoch is a full permutation; with >1 decoder the
    # within-epoch batch ORDER is nondeterministic but the batch SET per
    # epoch is exact.
    idx_q: queue.Queue = queue.Queue(maxsize=2 * n_threads)
    out_q: queue.Queue = queue.Queue(maxsize=cfg.prefetch_batches)

    def index_producer():
        while True:
            idx = rng.permutation(len(files))
            for start in range(0, len(idx) - batch_size + 1, batch_size):
                idx_q.put(idx[start:start + batch_size])

    def decoder():
        while True:
            ids = idx_q.get()
            out_q.put(_load_batch([files[i] for i in ids], size))

    threading.Thread(target=index_producer, daemon=True).start()
    for _ in range(n_threads):
        threading.Thread(target=decoder, daemon=True).start()
    while True:
        yield out_q.get()


def make_dataset(cfg: DataConfig, seed: int = 0, split: str = "train",
                 batch_size: int | None = None) -> Iterator[np.ndarray]:
    """Infinite iterator of uint8 (B, H, W, 3) batches."""
    if batch_size is None:
        batch_size = cfg.batch_size if split == "train" else cfg.eval_batch_size
    size = source_size(cfg, split)
    if cfg.dataset == "synthetic":
        # eval uses a disjoint seed stream so train never sees eval images
        eval_offset = 0 if split == "train" else 10_000_019
        return _synthetic_iter(cfg, seed + eval_offset, batch_size, size)
    if cfg.dataset == "folder":
        return _folder_iter(cfg, seed, batch_size, split, size)
    raise ValueError(f"unknown dataset {cfg.dataset!r}")
