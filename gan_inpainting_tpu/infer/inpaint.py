"""Inference: the reference's ``inpaint(image, mask)`` API (R15,
BASELINE.json:5) plus the batched multi-chip serving path (BASELINE.json:11).

Semantics match the reference stack (SURVEY.md §3.2): normalize, forward the
generator, composite ``out*mask + image*(1-mask)`` so known pixels are
preserved *exactly* (bit-exact for uint8 inputs — the composite happens on
the raw input pixels), denormalize to uint8.

XLA needs static shapes, so dynamic image/batch sizes are handled by
bucketing: inputs are padded up to the nearest configured (batch, size)
bucket and each bucket compiles once (SURVEY.md §7 "dynamic shapes at
serving"; first call per bucket pays the compile). The batch dimension is
sharded over the mesh's ``data`` axis for multi-chip serving.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gan_inpainting_tpu.configs.base import Config, InferConfig
from gan_inpainting_tpu.data.pipeline import denormalize, normalize
from gan_inpainting_tpu.models.generator import build_generator
from gan_inpainting_tpu.parallel.mesh import build_mesh
from gan_inpainting_tpu.parallel.sharding import batch_sharding, replicated


def _bucket(value: int, buckets) -> int:
    for b in sorted(buckets):
        if value <= b:
            return b
    raise ValueError(f"{value} exceeds largest bucket {max(buckets)}; "
                     f"configure a larger bucket in InferConfig")


def make_forward_fn(cfg: Config, backend: str | None = None):
    """The pure serve forward: ``(g_params, images_u8, masks) → uint8``.

    normalize → generator → composite on the raw uint8 input (known pixels
    bit-exact) → denormalize. Shared by the live :class:`Inpainter` (which
    wraps it in a mesh-sharded jit) and the AOT exporter (io/aot.py, plain
    jit serialized via jax.export).
    """
    gen = build_generator(cfg.model, backend=backend)

    def fwd(g_params, images_u8, masks):
        image = normalize(images_u8)
        masked = image * (1.0 - masks)
        out = gen.apply({"params": g_params}, masked, masks)
        fine = out.fine.astype(jnp.float32)
        out_u8 = denormalize(fine)
        # composite on raw uint8: known pixels bit-exact
        keep = masks <= 0.0
        return jnp.where(keep, images_u8, out_u8)

    return fwd


class Inpainter:
    """Loads a generator and serves inpaint requests.

    Use :func:`from_checkpoint` for the file-based path, or construct with
    in-memory params (tests, post-training serving).
    """

    def __init__(self, cfg: Config, g_params, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else build_mesh(cfg.train.mesh)
        self.g_params = jax.device_put(g_params, replicated(self.mesh))
        self._forward = functools.lru_cache(maxsize=None)(
            self._build_forward)

    @classmethod
    def from_checkpoint(cls, cfg: Config, workdir: str | None = None,
                        mesh=None, use_ema: bool = True,
                        best: bool = False) -> "Inpainter":
        """``use_ema`` (default): serve the EMA generator params when the
        checkpoint carries them (cfg.train.g_ema_decay > 0 at train time) —
        the Karras-practice weights eval also uses; falls back to the raw
        params otherwise. ``best``: load the best-eval-PSNR retention slot
        (workdir/checkpoints_best, written when train.keep_best) instead of
        the latest checkpoint. The restore template comes from the
        checkpoint's own saved config (train.state.restore_state), so
        train-time overrides of state-layout knobs (EMA, grad_clip, LR
        schedule) need not be repeated here."""
        from gan_inpainting_tpu.train.state import (
            ema_generator_params,
            restore_state,
        )

        state = restore_state(cfg, workdir, best=best)
        params = ema_generator_params(state) if use_ema else state.g_params
        return cls(cfg, params, mesh=mesh)

    @classmethod
    def from_npz(cls, path: str, mesh=None,
                 overrides: list[str] | None = None) -> "Inpainter":
        """Serve from a portable export artifact (io/export.py): the
        generator params plus the embedded config, no Orbax checkpoint
        tree needed. ``overrides`` apply on top of the embedded config
        (e.g. different infer buckets on the serving host)."""
        from gan_inpainting_tpu.configs.base import apply_overrides
        from gan_inpainting_tpu.io.export import load_generator

        cfg, params = load_generator(path)
        if overrides:
            cfg = apply_overrides(cfg, list(overrides))
        return cls(cfg, params, mesh=mesh)

    # ------------------------------------------------------------------
    @property
    def _n_spatial(self) -> int:
        return dict(self.mesh.shape).get("spatial", 1)

    def _cfg_for_size(self, size: int) -> Config:
        """Size-dependent model formulation: the fused-upsample decoder is
        exact-math parameter-compatible, and MEASURED faster at ≤256² but
        slower at 512² (r5 sweep: 91.5 fused vs 96.9 unfused img/s b32 —
        SURVEY §8f), so big buckets unfuse. Same weights either way."""
        import dataclasses

        cfg = self.cfg
        if (cfg.model.fuse_upsample
                and size > cfg.infer.fuse_upsample_max_size):
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model,
                                               fuse_upsample=False))
        return cfg

    def _build_forward(self, batch: int, size: int):
        """One compiled program per (batch, size) bucket."""
        # Spatial partitioning shards image ROWS over the mesh's spatial
        # axis; GSPMD inserts the conv halo exchanges. Contextual attention
        # is spatial-aware on its own: on a spatial>1 mesh the Pallas path
        # goes through an explicit shard_map (gathered keys, local query
        # rows — ops/contextual_attention.py _spatial_attention) and the
        # XLA path stays under GSPMD, so no backend pin is needed here.
        spatial = self._n_spatial > 1
        fwd = make_forward_fn(self._cfg_for_size(size))
        from gan_inpainting_tpu.parallel.sharding import DEFAULT_RULES

        spec = (DEFAULT_RULES.spatial_batch if spatial
                else DEFAULT_RULES.batch)
        sharding = batch_sharding(self.mesh, spec)
        # donating the input image buffer lets XLA reuse it for the
        # (same-shape, same-dtype) uint8 output — one less HBM allocation
        # per request at the largest bucket
        donate = (1,) if self.cfg.infer.donate_input else ()
        return jax.jit(
            fwd,
            in_shardings=(replicated(self.mesh), sharding, sharding),
            out_shardings=sharding,
            donate_argnums=donate,
        )

    # ------------------------------------------------------------------
    def inpaint_batch(self, images_u8, masks) -> np.ndarray:
        """Batched API. images: (B,H,W,3) uint8; masks: (B,H,W[,1]), 1=hole."""
        images_u8 = np.asarray(images_u8, np.uint8)
        masks = np.asarray(masks, np.float32)
        if masks.ndim == 3:
            masks = masks[..., None]
        b, h, w, _ = images_u8.shape
        if masks.shape[:3] != (b, h, w):
            raise ValueError(
                f"mask shape {masks.shape[:3]} does not match images "
                f"{(b, h, w)}")
        icfg: InferConfig = self.cfg.infer
        bb = _bucket(b, icfg.batch_buckets)
        # the batch dim is sharded over the mesh's data axis — round the
        # bucket up so every shard is non-empty
        n_data = self.mesh.shape["data"]
        bb = -(-bb // n_data) * n_data
        # non-square inputs pad H and W independently up to the square
        # bucket of the larger side; the crop below removes the padding
        sb = _bucket(max(h, w), icfg.size_buckets)
        if sb != h or sb != w:
            # padded area is "known" (mask 0) so the generator treats it as
            # context and the crop below removes it
            widths = ((0, 0), (0, sb - h), (0, sb - w), (0, 0))
            images_u8 = np.pad(images_u8, widths)
            masks = np.pad(masks, widths)
        if bb != b:
            reps = ((0, bb - b),) + ((0, 0),) * 3
            images_u8 = np.pad(images_u8, reps)
            masks = np.pad(masks, reps)
        out = self._forward(bb, sb)(self.g_params,
                                    jnp.asarray(images_u8),
                                    jnp.asarray(masks))
        return np.asarray(out)[:b, :h, :w, :]

    def __call__(self, image, mask) -> np.ndarray:
        """Single-image API: (H,W,3) uint8 + (H,W[,1]) mask → (H,W,3) uint8."""
        out = self.inpaint_batch(np.asarray(image)[None],
                                 np.asarray(mask)[None])
        return out[0]

    def warmup(self):
        """Pre-compile every configured bucket (serving cold-start control)."""
        for b in self.cfg.infer.batch_buckets:
            for s in self.cfg.infer.size_buckets:
                img = np.zeros((b, s, s, 3), np.uint8)
                msk = np.zeros((b, s, s, 1), np.float32)
                self.inpaint_batch(img, msk)


def inpaint(image, mask, *, inpainter: Inpainter | None = None,
            cfg: Config | None = None, workdir: str | None = None):
    """Functional one-shot API mirroring the reference's ``inpaint(image,
    mask)`` (SURVEY.md §3.2). Loads the latest checkpoint on first use unless
    an :class:`Inpainter` is passed."""
    if inpainter is None:
        if cfg is None:
            from gan_inpainting_tpu.configs.base import get_config

            cfg = get_config("celeba128_center")
        inpainter = Inpainter.from_checkpoint(cfg, workdir)
    return inpainter(image, mask)
