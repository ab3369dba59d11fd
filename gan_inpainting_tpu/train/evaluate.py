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


_METRIC_FNS = {"psnr": psnr, "ssim": ssim}


def make_eval_step(cfg: Config):
    generator = build_generator(cfg.model)
    names = tuple(cfg.eval.metrics)
    unknown = [n for n in names if n not in _METRIC_FNS and n != "swd"]
    if unknown:
        raise ValueError(f"unknown eval metrics {unknown}; "
                         f"have {sorted(_METRIC_FNS) + ['swd']}")
    scalar_names = tuple(n for n in names if n in _METRIC_FNS)
    # SWD is a distribution metric over the whole eval set: the step
    # additionally returns the composited images (f16 — descriptor
    # extraction normalizes anyway) so evaluate() can pool them. On a
    # multi-host mesh the composite is not host-addressable; skip there.
    want_swd = "swd" in names
    if want_swd and jax.process_count() > 1:
        import warnings

        warnings.warn("eval.metrics 'swd' is single-process only; skipping")
        want_swd = False

    @jax.jit
    def eval_step(g_params, batch: Batch):
        out = generator.apply({"params": g_params}, batch.masked, batch.mask)
        comp = composite(out.fine, batch.image, batch.mask)
        comp = comp.astype(jnp.float32)
        # reduce to replicated scalars INSIDE the jit: on a multi-host mesh
        # the per-image vector is not host-addressable, a replicated sum is
        res = {n: jnp.sum(_METRIC_FNS[n](comp, batch.image))
               for n in scalar_names}
        if want_swd:
            res["_composite"] = comp.astype(jnp.float16)
        return res

    return eval_step


def evaluate(cfg: Config, g_params, seed: int = 0,
             eval_step=None) -> dict[str, float]:
    """Mean PSNR/SSIM over cfg.data.num_eval_batches held-out batches.

    Multi-host: each process feeds its slice of every eval batch from a
    disjoint stream and the metric sums reduce inside the jit, so the means
    cover (num_eval_batches × eval_batch_size) images globally.
    """
    from gan_inpainting_tpu.parallel.mesh import build_mesh
    from gan_inpainting_tpu.parallel.multihost import (
        process_batch_slice,
        shard_host_batch,
    )

    if eval_step is None:
        eval_step = make_eval_step(cfg)
    local_bs, seed_off = process_batch_slice(cfg.data.eval_batch_size)
    it = make_dataset(cfg.data, seed=cfg.train.seed + seed_off, split="eval",
                      batch_size=local_bs)
    multi = jax.process_count() > 1
    mesh = build_mesh(cfg.train.mesh) if multi else None
    key = jax.random.key(seed + 777)
    sums: dict[str, float] = {}
    count = 0
    swd_cap = cfg.eval.swd_max_images
    reals: list[np.ndarray] = []
    comps: list[np.ndarray] = []
    for i in range(cfg.data.num_eval_batches):
        images = next(it)
        mask_key = jax.random.fold_in(key, i)
        if multi:
            mask_key = jax.random.fold_in(mask_key, jax.process_index())
        batch = make_train_batch(images, mask_key, cfg.mask)
        if multi:
            batch = shard_host_batch(mesh, jax.device_get(batch))
        per_batch = eval_step(g_params, batch)
        for name, value in per_batch.items():
            if name == "_composite":
                if sum(a.shape[0] for a in comps) < swd_cap:
                    comps.append(np.asarray(value))
                    reals.append(np.asarray(batch.image, np.float16))
                continue
            sums[name] = sums.get(name, 0.0) + float(value)
        count += cfg.data.eval_batch_size
    out = {name: total / count for name, total in sums.items()}
    if comps:
        from gan_inpainting_tpu.metrics.swd import swd

        real = np.concatenate(reals)[:swd_cap]
        fake = np.concatenate(comps)[:swd_cap]
        res = swd(jnp.asarray(real, jnp.float32),
                  jnp.asarray(fake, jnp.float32),
                  jax.random.key(seed + 1234))
        out.update({k: float(v) for k, v in res.items()})
    return out
