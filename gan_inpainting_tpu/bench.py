"""Throughput benchmarks (reference's tracked metrics, BASELINE.json:2):

* infer — 256² masked images/sec/chip through the flagship generator.
* train — G+D train steps/sec for a config.

Used by the CLI (``python -m gan_inpainting_tpu bench``) and the repo-root
``bench.py`` driver entry point.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from gan_inpainting_tpu.configs.base import Config
from gan_inpainting_tpu.data.pipeline import make_train_batch
from gan_inpainting_tpu.data.synthetic import synthetic_batch_u8
from gan_inpainting_tpu.infer.inpaint import Inpainter
from gan_inpainting_tpu.parallel.mesh import build_mesh
from gan_inpainting_tpu.parallel.sharding import replicated, shard_batch
from gan_inpainting_tpu.train.state import create_state
from gan_inpainting_tpu.train.step import make_train_step
from gan_inpainting_tpu.utils.rng import make_streams


def bench_infer(cfg: Config, *, batch: int = 64, iters: int = 20,
                warmup: int = 3) -> dict:
    size = cfg.data.image_size
    mesh = build_mesh(cfg.train.mesh)
    state = create_state(cfg, jax.random.key(0))
    inp = Inpainter(cfg, state.g_params, mesh=mesh)

    key = jax.random.key(1)
    images = np.asarray(synthetic_batch_u8(key, batch, size))
    masks = np.zeros((batch, size, size, 1), np.float32)
    masks[:, size // 4: 3 * size // 4, size // 4: 3 * size // 4, :] = 1.0

    for _ in range(warmup):
        inp.inpaint_batch(images, masks)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = inp.inpaint_batch(images, masks)
    dt = time.perf_counter() - t0
    del out
    n_chips = mesh.devices.size
    ips = batch * iters / dt
    return {
        "metric": f"{size}x{size} inpaint images/sec/chip",
        "value": ips / n_chips,
        "unit": "images/sec/chip",
        "total_images_per_sec": ips,
        "batch": batch,
        "chips": n_chips,
    }


def bench_train(cfg: Config, *, iters: int = 10, warmup: int = 2) -> dict:
    mesh = build_mesh(cfg.train.mesh)
    streams = make_streams(0)
    state = create_state(cfg, jax.random.key(0))
    state = jax.device_put(state, replicated(mesh))
    train_step = make_train_step(cfg)

    size = cfg.data.image_size
    images = synthetic_batch_u8(jax.random.key(2), cfg.data.batch_size, size)

    def one(step, state):
        batch = make_train_batch(images, streams["masks"].at_step(step),
                                 cfg.mask)
        batch = shard_batch(mesh, batch)
        return train_step(state, batch, streams["train"].at_step(step))

    with mesh:
        for i in range(warmup):
            state, _ = one(i, state)
        jax.block_until_ready(state.g_params)
        t0 = time.perf_counter()
        for i in range(warmup, warmup + iters):
            state, metrics = one(i, state)
        jax.block_until_ready(state.g_params)
        dt = time.perf_counter() - t0

    sps = iters / dt
    return {
        "metric": "G+D train steps/sec",
        "value": sps,
        "unit": "steps/sec",
        "images_per_sec": sps * cfg.data.batch_size,
        "batch": cfg.data.batch_size,
        "chips": mesh.devices.size,
    }


def run_bench(cfg: Config, mode: str = "infer") -> dict:
    if mode == "infer":
        return bench_infer(cfg)
    if mode == "train":
        return bench_train(cfg)
    raise ValueError(f"unknown bench mode {mode!r}")
