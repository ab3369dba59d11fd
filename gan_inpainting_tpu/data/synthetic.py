"""Procedural synthetic dataset.

There is no network in CI (SURVEY.md §4): CelebA/Places are not downloadable,
so tests, smoke training, and benches run on a deterministic procedural image
distribution rich enough for inpainting to be non-trivial: a smooth random
color gradient plus a handful of soft elliptical blobs and one rectangle.
Images are generated *on device* from a PRNG key, so the synthetic pipeline
has zero host work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def synthetic_image(key, size: int):
    """One (size, size, 3) float32 image in [-1, 1], deterministic in key."""
    k_grad, k_blob, k_rect = jax.random.split(key, 3)

    ys = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0) / size
    xs = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1) / size

    # smooth background: per-channel linear gradient with random direction
    g = jax.random.uniform(k_grad, (3, 3), minval=-1.0, maxval=1.0)
    img = (g[None, None, :, 0] * ys[..., None]
           + g[None, None, :, 1] * xs[..., None]
           + g[None, None, :, 2] * 0.3)

    # soft elliptical blobs
    n_blobs = 5
    kb = jax.random.split(k_blob, n_blobs)

    def add_blob(i, acc):
        kc, kp, ks = jax.random.split(kb[i], 3)
        color = jax.random.uniform(kc, (3,), minval=-1.0, maxval=1.0)
        cy, cx = jax.random.uniform(kp, (2,), minval=0.1, maxval=0.9)
        sy, sx = jax.random.uniform(ks, (2,), minval=0.03, maxval=0.25)
        d2 = ((ys - cy) / sy) ** 2 + ((xs - cx) / sx) ** 2
        alpha = jnp.exp(-d2)[..., None]
        return acc * (1.0 - alpha) + color[None, None, :] * alpha

    img = jax.lax.fori_loop(0, n_blobs, add_blob, img)

    # one hard-edged rectangle for structure
    kc, kp, ks = jax.random.split(k_rect, 3)
    color = jax.random.uniform(kc, (3,), minval=-1.0, maxval=1.0)
    y0, x0 = jax.random.uniform(kp, (2,), minval=0.1, maxval=0.6)
    hh, ww = jax.random.uniform(ks, (2,), minval=0.1, maxval=0.3)
    inside = ((ys >= y0) & (ys < y0 + hh) & (xs >= x0) & (xs < x0 + ww))
    img = jnp.where(inside[..., None], color[None, None, :], img)

    return jnp.clip(img, -1.0, 1.0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def synthetic_batch(key, batch: int, size: int):
    """(B, size, size, 3) float32 in [-1, 1]."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: synthetic_image(k, size))(keys)


@functools.partial(jax.jit, static_argnums=(1, 2))
def synthetic_batch_u8(key, batch: int, size: int):
    """uint8 variant matching what a real file loader would yield."""
    x = synthetic_batch(key, batch, size)
    return jnp.round(jnp.clip((x + 1.0) * 127.5, 0, 255)).astype(jnp.uint8)
