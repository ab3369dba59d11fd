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


# ---------------------------------------------------------------------------
# "textured" family (VERDICT r4 #3)
#
# The blobs family above is nearly conv-interpolatable: a generator can fill
# holes by smoothing, so it cannot show whether the contextual-attention
# branch (patch-copying from background) buys QUALITY. This family is built
# so that copying is the winning strategy: two GLOBAL high-frequency texture
# fields (oriented near-square-wave stripes and a checker) cover the image,
# mixed by smooth multi-octave value noise, plus hard-edged shapes filled
# with their own stripe textures. Any hole's correct content is coherent
# with texture visible elsewhere in the image — reachable by patch matching,
# hostile to plain interpolation. Everything is traced, static-shaped, and
# deterministic in the key.
# ---------------------------------------------------------------------------


def _value_noise(key, size: int, grid: int, channels: int = 1):
    """Smooth noise: a random (grid, grid) lattice upsampled bicubically."""
    lattice = jax.random.uniform(key, (grid, grid, channels),
                                 minval=-1.0, maxval=1.0)
    return jax.image.resize(lattice, (size, size, channels), method="cubic")


def _multi_octave_noise(key, size: int, octaves=(4, 8, 16, 32)):
    """(size, size) sum of value-noise octaves with 1/f amplitudes."""
    keys = jax.random.split(key, len(octaves))
    acc = jnp.zeros((size, size))
    for i, (k, g) in enumerate(zip(keys, octaves)):
        acc = acc + _value_noise(k, size, min(g, size), 1)[..., 0] * 0.5 ** i
    return acc


def _stripe_field(ys, xs, size: int, theta, period_px, phase,
                  sharpness: float = 4.0):
    """Oriented near-square-wave stripes in [-1, 1]; period in PIXELS so the
    texture stays high-frequency at every image size."""
    u = xs * jnp.cos(theta) + ys * jnp.sin(theta)   # ys/xs are in [0, 1)
    wave = jnp.sin(2.0 * jnp.pi * size * u / period_px + phase)
    return jnp.tanh(sharpness * wave)


def textured_image(key, size: int):
    """One (size, size, 3) float32 image in [-1, 1], deterministic in key."""
    (k_s1, k_s2a, k_s2b, k_mix, k_col, k_cast,
     k_shape1, k_shape2) = jax.random.split(key, 8)

    ys = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0) / size
    xs = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1) / size

    def rand_stripe_params(k):
        p = jax.random.uniform(k, (3,))
        theta = p[0] * jnp.pi
        period = 6.0 + p[1] * 18.0          # 6–24 px period
        phase = p[2] * 2.0 * jnp.pi
        return theta, period, phase

    # global texture 1: oriented stripes; global texture 2: checker
    # (product of two near-orthogonal stripe fields)
    t1 = _stripe_field(ys, xs, size, *rand_stripe_params(k_s1))
    th2, pd2, ph2 = rand_stripe_params(k_s2a)
    _, pd2b, ph2b = rand_stripe_params(k_s2b)
    t2 = (_stripe_field(ys, xs, size, th2, pd2, ph2)
          * _stripe_field(ys, xs, size, th2 + jnp.pi / 2, pd2b, ph2b))

    # smooth mixing field selects which texture dominates where
    w = jax.nn.sigmoid(3.0 * _multi_octave_noise(k_mix, size))
    field = w * t1 + (1.0 - w) * t2

    # colorize along a random two-color axis + low-frequency color cast
    c = jax.random.uniform(k_col, (2, 3), minval=-1.0, maxval=1.0)
    img = (c[0][None, None] * (1.0 + field[..., None]) * 0.5
           + c[1][None, None] * (1.0 - field[..., None]) * 0.5)
    img = img + 0.3 * _value_noise(k_cast, size, 4, 3)

    # two hard-edged shapes, each filled with its OWN stripe texture
    # (hard boundaries + texture discontinuities)
    def add_shape(img, k, rect: bool):
        kg, kt, kc = jax.random.split(k, 3)
        geo = jax.random.uniform(kg, (4,))
        fill_field = _stripe_field(ys, xs, size, *rand_stripe_params(kt))
        cf = jax.random.uniform(kc, (2, 3), minval=-1.0, maxval=1.0)
        fill = (cf[0][None, None] * (1.0 + fill_field[..., None]) * 0.5
                + cf[1][None, None] * (1.0 - fill_field[..., None]) * 0.5)
        cy, cx = 0.15 + 0.6 * geo[0], 0.15 + 0.6 * geo[1]
        hy, hx = 0.08 + 0.17 * geo[2], 0.08 + 0.17 * geo[3]
        if rect:
            inside = ((jnp.abs(ys - cy) < hy) & (jnp.abs(xs - cx) < hx))
        else:
            inside = (((ys - cy) / hy) ** 2 + ((xs - cx) / hx) ** 2) < 1.0
        return jnp.where(inside[..., None], fill, img)

    img = add_shape(img, k_shape1, rect=True)
    img = add_shape(img, k_shape2, rect=False)
    return jnp.clip(img, -1.0, 1.0)


_FAMILIES = {"blobs": synthetic_image, "textured": textured_image}


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def synthetic_batch(key, batch: int, size: int, family: str = "blobs"):
    """(B, size, size, 3) float32 in [-1, 1]."""
    if family not in _FAMILIES:
        raise ValueError(f"unknown synthetic family {family!r} "
                         f"(expected one of {sorted(_FAMILIES)})")
    image_fn = _FAMILIES[family]
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: image_fn(k, size))(keys)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def synthetic_batch_u8(key, batch: int, size: int, family: str = "blobs"):
    """uint8 variant matching what a real file loader would yield."""
    x = synthetic_batch(key, batch, size, family)
    return jnp.round(jnp.clip((x + 1.0) * 127.5, 0, 255)).astype(jnp.uint8)
