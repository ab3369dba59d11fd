"""Training driver (reference R13's outer loop, SURVEY.md §3.1).

Responsibilities: mesh + sharded step construction, data iteration, periodic
logging / eval / sample dumps / async checkpoints, auto-resume from the
latest checkpoint (SURVEY.md §5 failure recovery). All math lives in the
jitted step; this file is orchestration only.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from gan_inpainting_tpu.configs.base import Config
from gan_inpainting_tpu.data.loader import make_dataset
from gan_inpainting_tpu.data.pipeline import denormalize, make_train_batch
from gan_inpainting_tpu.io.checkpoint import CheckpointManager
from gan_inpainting_tpu.io.metrics_writer import MetricsWriter
from gan_inpainting_tpu.parallel.mesh import build_mesh
from gan_inpainting_tpu.parallel.sharding import replicated, shard_batch
from gan_inpainting_tpu.train.evaluate import evaluate, make_eval_step
from gan_inpainting_tpu.train.state import create_state, ema_generator_params
from gan_inpainting_tpu.train.step import make_train_step
from gan_inpainting_tpu.utils.rng import make_streams


def train(cfg: Config, *, resume: bool = True, verbose: bool = True):
    """Run cfg.train.steps of GAN training; returns (state, last_metrics)."""
    from gan_inpainting_tpu.parallel.multihost import (
        ensure_initialized,
        process_batch_slice,
        shard_host_batch,
    )

    n_proc = ensure_initialized(verbose=verbose)
    # each process feeds its slice of the global batch from a disjoint
    # data stream; with one process this is the whole batch, seed untouched
    local_batch, seed_offset = process_batch_slice(cfg.data.batch_size)
    is_main = jax.process_index() == 0
    verbose = verbose and is_main

    mesh = build_mesh(cfg.train.mesh)
    streams = make_streams(cfg.train.seed)

    state = create_state(cfg, streams["params"].at_step(0))

    ckpt = CheckpointManager(cfg.train.workdir, cfg.train.max_checkpoints)
    if resume and ckpt.latest_step() is not None:
        state = jax.device_put(state, replicated(mesh))
        state = ckpt.restore(state)
        if verbose:
            print(f"[train] resumed from step {int(state.step)}")
    else:
        if cfg.train.init_from:
            from gan_inpainting_tpu.train.state import warm_start

            state = warm_start(state, cfg)
            if verbose:
                print(f"[train] warm-started params from "
                      f"{cfg.train.init_from}")
        state = jax.device_put(state, replicated(mesh))

    # best-eval-PSNR retention (train.keep_best): a second single-slot
    # manager + a small json of the best metrics, resume-aware
    track_best = cfg.train.keep_best and "psnr" in cfg.eval.metrics
    best_ckpt = best_path = None
    best_psnr = float("-inf")
    if track_best:
        import json as _json
        import pathlib as _pathlib

        best_ckpt = CheckpointManager(cfg.train.workdir, max_to_keep=1,
                                      subdir="checkpoints_best")
        best_path = _pathlib.Path(cfg.train.workdir) / "best.json"
        if resume and best_path.exists():
            best_psnr = _json.loads(best_path.read_text()).get(
                "psnr", float("-inf"))

    writer = MetricsWriter(cfg.train.workdir) if is_main else None
    train_step = make_train_step(cfg)
    eval_step = make_eval_step(cfg)
    data = make_dataset(cfg.data, seed=cfg.train.seed + seed_offset,
                        split="train", batch_size=local_batch)

    start_step = int(state.step)
    metrics = {}
    t_last = time.perf_counter()
    steps_since_log = 0

    cur_steps = cfg.mask.curriculum_steps
    with jax.set_mesh(mesh):
        for step in range(start_step, cfg.train.steps):
            images = next(data)
            progress = min(1.0, step / cur_steps) if cur_steps else 1.0
            mask_key = streams["masks"].at_step(step)
            if n_proc > 1:
                # disjoint mask streams per process (images differ too)
                mask_key = jax.random.fold_in(mask_key, jax.process_index())
            batch = make_train_batch(
                images, mask_key, cfg.mask, progress,
                flip=cfg.data.random_flip,
                crop=cfg.data.image_size if cfg.data.random_crop else 0)
            if n_proc > 1:
                batch = shard_host_batch(mesh, jax.device_get(batch))
            else:
                batch = shard_batch(mesh, batch)
            state, metrics = train_step(
                state, batch, streams["train"].at_step(step))
            steps_since_log += 1

            next_step = step + 1
            if next_step % cfg.train.log_every == 0 or next_step == cfg.train.steps:
                metrics = jax.device_get(metrics)
                now = time.perf_counter()
                sps = steps_since_log / max(now - t_last, 1e-9)
                t_last, steps_since_log = now, 0
                scalars = {k: float(v) for k, v in metrics.items()}
                scalars["steps_per_sec"] = sps
                scalars["images_per_sec"] = sps * cfg.data.batch_size
                if is_main:
                    writer.scalars(next_step, scalars)
                if verbose:
                    msg = " ".join(f"{k}={v:.4g}" for k, v in scalars.items())
                    print(f"[train] step {next_step}: {msg}")

            if next_step % cfg.train.eval_every == 0 or next_step == cfg.train.steps:
                # all processes participate (SPMD over global arrays);
                # only the main process writes
                # EMA params when tracked (cfg.train.g_ema_decay > 0)
                ev = evaluate(cfg, ema_generator_params(state),
                              eval_step=eval_step)
                if is_main:
                    writer.scalars(next_step, {f"eval_{k}": v
                                               for k, v in ev.items()})
                if verbose:
                    print(f"[train] eval@{next_step}: {ev}")
                if track_best and ev.get("psnr", float("-inf")) > best_psnr:
                    best_psnr = ev["psnr"]
                    # never two async saves in flight across the two
                    # managers: orbax's async finalizer syncs processes on
                    # a globally-named barrier (ThreadSaveMultiHostValue-
                    # Holder), so concurrent saves from different managers
                    # deadlock a >1-process cluster
                    ckpt.wait()
                    best_ckpt.save(next_step, state, cfg)
                    if is_main:
                        import json as _json

                        best_path.write_text(_json.dumps(
                            {"step": next_step, **ev}, indent=2) + "\n")
                    if verbose:
                        print(f"[train] new best psnr {best_psnr:.3f} "
                              f"@ {next_step} -> checkpoints_best")
                if n_proc == 1:
                    _dump_samples(cfg, state, writer, next_step, streams)

            if next_step % cfg.train.checkpoint_every == 0 or next_step == cfg.train.steps:
                if best_ckpt is not None:
                    best_ckpt.wait()  # same single-save-in-flight rule
                ckpt.save(next_step, state, cfg)

    ckpt.wait()
    if best_ckpt is not None:
        best_ckpt.wait()
    if is_main:
        writer.close()
    return state, metrics


def _dump_samples(cfg: Config, state, writer: MetricsWriter, step: int,
                  streams, n: int = 4):
    """Write a (masked | output | composite | target) grid to TB."""
    from gan_inpainting_tpu.models.generator import build_generator
    from gan_inpainting_tpu.train.step import composite

    it = make_dataset(cfg.data, seed=cfg.train.seed, split="eval",
                      batch_size=n)
    batch = make_train_batch(next(it), streams["eval"].at_step(step),
                             cfg.mask)
    generator = build_generator(cfg.model)
    out = generator.apply({"params": ema_generator_params(state)},
                          batch.masked, batch.mask)
    comp = composite(out.fine, batch.image, batch.mask)
    row = np.concatenate([
        np.asarray(denormalize(batch.masked)),
        np.asarray(denormalize(out.fine)),
        np.asarray(denormalize(comp)),
        np.asarray(denormalize(batch.image)),
    ], axis=2)  # side by side
    writer.images(step, "samples", row)
