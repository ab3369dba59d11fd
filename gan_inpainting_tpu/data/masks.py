"""On-device mask synthesis, pure JAX, fully shape-static.

The reference synthesizes masks per-sample on CPU dataloader workers with
numpy/cv2 (SURVEY.md §3.4, R2/R3). Here both mask families are traceable JAX
functions so they fuse into the jit-compiled preprocessing stage and run on
the TPU itself (BASELINE.json:5 "fused jit-compiled preprocessing stage"),
vectorized over the batch with vmap.

Convention: **mask == 1 marks the hole** (pixels to inpaint), 0 = known.

Center masks (R2): a rectangle of side ``center_frac * size``, either exactly
centered or uniformly jittered, rasterized by iota comparisons (no dynamic
shapes).

Free-form masks (R3): the DeepFill-v2 brush-stroke walk [Yu et al., ICCV'19]
re-expressed as capsule distance fields. For each stroke we sample a start
point and a chain of segments (random angle/length), plus a brush width; a
pixel is inside the mask iff its distance to any *valid* segment is at most
width/2. cv2.line/circle rasterization becomes a closed-form point-to-segment
distance evaluated on the pixel grid under ``lax.fori_loop`` — identical
geometry, but traceable, differentiable in the widths (unused), and with
static shapes. Stroke/segment counts are sampled up to static maxima
(``max_strokes``/``max_segments``) with validity masking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gan_inpainting_tpu.configs.base import MaskConfig


def _pixel_grid(height: int, width: int):
    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    return ys, xs


# ---------------------------------------------------------------------------
# Center masks
# ---------------------------------------------------------------------------


def center_mask(key, height: int, width: int, frac: float = 0.5,
                jitter: bool = False):
    """Rectangular hole mask, (H, W, 1) float32 in {0,1}; 1 = hole."""
    hole_h = max(1, int(round(height * frac)))
    hole_w = max(1, int(round(width * frac)))
    if jitter:
        ky, kx = jax.random.split(key)
        y0 = jax.random.randint(ky, (), 0, height - hole_h + 1)
        x0 = jax.random.randint(kx, (), 0, width - hole_w + 1)
    else:
        y0 = jnp.asarray((height - hole_h) // 2)
        x0 = jnp.asarray((width - hole_w) // 2)
    ys, xs = _pixel_grid(height, width)
    y0 = y0.astype(jnp.float32)
    x0 = x0.astype(jnp.float32)
    inside = ((ys >= y0) & (ys < y0 + hole_h) &
              (xs >= x0) & (xs < x0 + hole_w))
    return inside.astype(jnp.float32)[..., None]


# ---------------------------------------------------------------------------
# Free-form stroke masks
# ---------------------------------------------------------------------------


def _sample_strokes(key, cfg: MaskConfig, height: int, width: int):
    """Sample the brush-walk geometry with static shapes.

    Returns:
      a: (S, 2) segment start points (y, x)
      b: (S, 2) segment end points
      w: (S,) brush widths
      valid: (S,) bool — whether this segment participates
    where S = max_strokes * max_segments.
    """
    v, k = cfg.max_strokes, cfg.max_segments
    (k_n, k_start, k_angle, k_len, k_width, k_nseg) = jax.random.split(key, 6)

    # number of strokes actually drawn, 1..V; segments per stroke 1..K
    n_strokes = jax.random.randint(k_n, (), 1, v + 1)
    n_segs = jax.random.randint(k_nseg, (v,), 1, k + 1)

    starts = jax.random.uniform(
        k_start, (v, 2),
        minval=jnp.zeros((2,)),
        maxval=jnp.asarray([height, width], jnp.float32))

    # DeepFill-v2 walk: angles roughly alternate direction each segment
    base = jax.random.uniform(k_angle, (v, k), minval=0.0,
                              maxval=2.0 * jnp.pi)
    flip = jnp.where(jnp.arange(k) % 2 == 0, 0.0, jnp.pi)
    angles = base + flip[None, :]

    lengths = jax.random.uniform(k_len, (v, k), minval=1.0,
                                 maxval=cfg.max_step)
    widths = jax.random.uniform(k_width, (v,), minval=cfg.min_width,
                                maxval=cfg.max_width)

    deltas = jnp.stack(
        [lengths * jnp.sin(angles), lengths * jnp.cos(angles)], axis=-1)
    verts = jnp.concatenate(
        [starts[:, None, :], starts[:, None, :] + jnp.cumsum(deltas, axis=1)],
        axis=1)  # (V, K+1, 2)
    lim = jnp.asarray([height - 1, width - 1], jnp.float32)
    verts = jnp.clip(verts, 0.0, lim)

    a = verts[:, :-1, :].reshape(v * k, 2)
    b = verts[:, 1:, :].reshape(v * k, 2)
    w = jnp.repeat(widths, k)

    stroke_idx = jnp.repeat(jnp.arange(v), k)
    seg_idx = jnp.tile(jnp.arange(k), v)
    valid = (stroke_idx < n_strokes) & (seg_idx < n_segs[stroke_idx])
    return a, b, w, valid


def freeform_mask(key, height: int, width: int, cfg: MaskConfig,
                  progress=1.0):
    """Free-form stroke mask, (H, W, 1) float32 in {0,1}; 1 = hole."""
    a, b, w, valid = _sample_strokes(key, cfg, height, width)
    w = w * _difficulty(cfg, progress)  # curriculum: thinner early strokes
    ys, xs = _pixel_grid(height, width)
    num_segments = a.shape[0]

    def body(i, mask):
        ay, ax = a[i, 0], a[i, 1]
        dby, dbx = b[i, 0] - ay, b[i, 1] - ax
        seg_len2 = jnp.maximum(dby * dby + dbx * dbx, 1e-6)
        # closest point on segment: t in [0, 1]
        t = jnp.clip(((ys - ay) * dby + (xs - ax) * dbx) / seg_len2, 0.0, 1.0)
        dy = ys - (ay + t * dby)
        dx = xs - (ax + t * dbx)
        dist2 = dy * dy + dx * dx
        radius = w[i] * 0.5
        hit = (dist2 <= radius * radius) & valid[i]
        return jnp.logical_or(mask, hit)

    mask = jax.lax.fori_loop(
        0, num_segments, body, jnp.zeros((height, width), jnp.bool_))
    return mask.astype(jnp.float32)[..., None]


# ---------------------------------------------------------------------------
# Dispatch + batching
# ---------------------------------------------------------------------------


def random_mask(key, height: int, width: int, cfg: MaskConfig,
                progress=1.0):
    """One mask per the config's `kind` (center | freeform | mixed).

    ``progress`` in [0, 1] drives the mask curriculum (BASELINE.json:10
    "mixed-mask curriculum"): hole difficulty ramps from
    ``curriculum_start_scale`` of full size/width up to 100%. Traceable —
    the train loop passes ``step / curriculum_steps`` as a traced scalar.
    With progress=1.0 (the default and the curriculum-off case) masks are
    exactly the non-curriculum ones.
    """
    if cfg.kind == "center":
        return _center_curriculum(key, height, width, cfg, progress)
    if cfg.kind == "freeform":
        return freeform_mask(key, height, width, cfg, progress)
    if cfg.kind == "mixed":
        k_choice, k_c, k_f = jax.random.split(key, 3)
        use_ff = jax.random.bernoulli(k_choice, cfg.freeform_prob)
        cm = _center_curriculum(k_c, height, width, cfg, progress)
        fm = freeform_mask(k_f, height, width, cfg, progress)
        return jnp.where(use_ff, fm, cm)
    raise ValueError(f"unknown mask kind {cfg.kind!r}")


def _difficulty(cfg: MaskConfig, progress):
    scale = cfg.curriculum_start_scale
    return jnp.clip(scale + (1.0 - scale) * progress, scale, 1.0)


def _center_curriculum(key, height: int, width: int, cfg: MaskConfig,
                       progress):
    if isinstance(progress, (int, float)) and progress >= 1.0:
        return center_mask(key, height, width, cfg.center_frac,
                           cfg.center_jitter)
    # traced progress: shrink the hole around its center (static shapes —
    # the rectangle test is elementwise, only its bounds move)
    frac = cfg.center_frac * _difficulty(cfg, progress)
    hole_h = height * frac
    hole_w = width * frac
    ys, xs = _pixel_grid(height, width)
    if cfg.center_jitter:
        ky, kx = jax.random.split(key)
        y0 = jax.random.uniform(ky) * (height - hole_h)
        x0 = jax.random.uniform(kx) * (width - hole_w)
    else:
        y0 = (height - hole_h) * 0.5
        x0 = (width - hole_w) * 0.5
    inside = ((ys >= y0) & (ys < y0 + hole_h) &
              (xs >= x0) & (xs < x0 + hole_w))
    return inside.astype(jnp.float32)[..., None]


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _random_mask_batch_impl(keys, height, width, cfg):
    return jax.vmap(lambda k: random_mask(k, height, width, cfg))(keys)


def random_mask_batch(key, batch: int, height: int, width: int,
                      cfg: MaskConfig):
    """(B, H, W, 1) float32 batch of masks; vmapped, jit-cached per shape."""
    keys = jax.random.split(key, batch)
    return _random_mask_batch_impl(keys, height, width, cfg)
