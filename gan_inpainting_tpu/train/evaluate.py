"""Eval loop (reference R14, SURVEY.md §3.3): PSNR/SSIM on held-out batches.

One jit computes forward + composite + both metrics; the caller averages
over batches on the host. Under a sharded mesh the per-image metrics are
computed where the images live and only (B,) scalars come back.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from gan_inpainting_tpu.configs.base import Config
from gan_inpainting_tpu.data.loader import make_dataset
from gan_inpainting_tpu.data.pipeline import Batch, make_train_batch
from gan_inpainting_tpu.metrics.image import psnr, ssim
from gan_inpainting_tpu.models.generator import build_generator
from gan_inpainting_tpu.train.step import composite


def make_eval_step(cfg: Config):
    generator = build_generator(cfg.model)

    @jax.jit
    def eval_step(g_params, batch: Batch):
        out = generator.apply({"params": g_params}, batch.masked, batch.mask)
        comp = composite(out.fine, batch.image, batch.mask)
        comp = comp.astype(jnp.float32)
        return {
            "psnr": psnr(comp, batch.image),
            "ssim": ssim(comp, batch.image),
        }

    return eval_step


def evaluate(cfg: Config, g_params, seed: int = 0,
             eval_step=None) -> dict[str, float]:
    """Mean PSNR/SSIM over cfg.data.num_eval_batches held-out batches."""
    if eval_step is None:
        eval_step = make_eval_step(cfg)
    it = make_dataset(cfg.data, seed=cfg.train.seed, split="eval")
    key = jax.random.key(seed + 777)
    sums: dict[str, float] = {}
    count = 0
    for i in range(cfg.data.num_eval_batches):
        images = next(it)
        batch = make_train_batch(images, jax.random.fold_in(key, i), cfg.mask)
        per_image = eval_step(g_params, batch)
        for name, values in per_image.items():
            sums[name] = sums.get(name, 0.0) + float(jnp.sum(values))
        count += int(values.shape[0])
    return {name: total / count for name, total in sums.items()}
