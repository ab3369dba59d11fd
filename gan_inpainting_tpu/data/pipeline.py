"""Fused, jit-compiled preprocessing (reference R1 → BASELINE.json:5).

The reference decodes/resizes/normalizes on CPU dataloader workers and draws
masks there too (SURVEY.md §3.1). Here the host only supplies uint8 image
batches (from the loader); everything else — normalize to [-1, 1], mask
synthesis, masking — happens inside one jit on device, so the per-step host
work is a single H2D copy of uint8 (4x smaller than f32 over PCIe/ICI).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gan_inpainting_tpu.configs.base import MaskConfig
from gan_inpainting_tpu.data.masks import random_mask


class Batch(NamedTuple):
    """One training/eval batch. All float32 NHWC on device.

    image:  (B, H, W, 3) in [-1, 1] — ground truth
    mask:   (B, H, W, 1) in {0, 1} — 1 marks the hole
    masked: (B, H, W, 3) — image with hole zeroed: image * (1 - mask)
    """

    image: jax.Array
    mask: jax.Array
    masked: jax.Array


def normalize(images_u8):
    """uint8 [0,255] → float32 [-1,1]."""
    return images_u8.astype(jnp.float32) / 127.5 - 1.0


def denormalize(images):
    """float32 [-1,1] → uint8 [0,255]."""
    x = jnp.clip((images + 1.0) * 127.5, 0.0, 255.0)
    return jnp.round(x).astype(jnp.uint8)


def _make_batch_impl(images_u8, key, mask_cfg: MaskConfig,
                     progress, flip: bool, crop: int) -> Batch:
    b, h, w = images_u8.shape[:3]
    if crop and (h, w) != (crop, crop):
        if h < crop or w < crop:
            raise ValueError(
                f"random_crop target {crop} exceeds source {(h, w)}")
        # per-sample random window, sliced on the uint8 batch before
        # normalization (static output shape; crop=0 keeps the pre-crop
        # key derivation bit-exact — pins/resume unaffected)
        key, crop_key = jax.random.split(key)
        offs = jax.random.randint(
            crop_key, (b, 2), minval=0,
            maxval=jnp.array([h - crop + 1, w - crop + 1]))

        def crop_one(img, off):
            return jax.lax.dynamic_slice(
                img, (off[0], off[1], 0), (crop, crop, img.shape[-1]))

        images_u8 = jax.vmap(crop_one)(images_u8, offs)
        h = w = crop
    image = normalize(images_u8)
    if flip:
        # per-sample horizontal flip, fused into the same device program
        # (the reference genre's standard train-time augmentation; masks
        # are synthesized fresh per sample so they need no flipping).
        # flip=False keeps the pre-flip key derivation bit-exact so the
        # pinned parity fingerprints and resume tests are unaffected.
        key, flip_key = jax.random.split(key)
        bits = jax.random.bernoulli(flip_key, 0.5, (b, 1, 1, 1))
        image = jnp.where(bits, image[:, :, ::-1, :], image)
    keys = jax.random.split(key, b)
    mask = jax.vmap(
        lambda k: random_mask(k, h, w, mask_cfg, progress))(keys)
    masked = image * (1.0 - mask)
    return Batch(image=image, mask=mask, masked=masked)


_make_batch_donated = functools.partial(
    jax.jit, static_argnums=(2, 4, 5), donate_argnums=(0,))(_make_batch_impl)
_make_batch_plain = functools.partial(
    jax.jit, static_argnums=(2, 4, 5))(_make_batch_impl)


def make_train_batch(images_u8, key, mask_cfg: MaskConfig,
                     progress: float = 1.0, flip: bool = False,
                     crop: int = 0) -> Batch:
    """Fuse normalize + mask synthesis + masking into one device program.

    ``progress`` in [0, 1] drives the mask curriculum (traced — no
    recompile per step). ``flip`` adds per-sample random horizontal
    flips (train-time augmentation; leave off for eval/bench so metrics
    stay deterministic). ``crop`` > 0 slices a random crop×crop window
    per sample from larger source images before normalization
    (``data.random_crop``; the loader supplies the 9/8× source)."""
    # with crop active the uint8 input is larger than every output, so a
    # donated buffer could never be reused — donating would only emit
    # XLA's "donated buffers were not usable" warning on every compile
    impl = _make_batch_plain if crop else _make_batch_donated
    return impl(jnp.asarray(images_u8), key, mask_cfg,
                jnp.float32(progress), flip, crop)
