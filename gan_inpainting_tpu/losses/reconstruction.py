"""L1 reconstruction losses (reference R11).

Hole/valid-weighted L1 (Partial-conv paper convention) plus the
spatially-discounted weighting of DeepFill v1: pixels deep inside the hole
get weight gamma^d where d is the Chebyshev distance (in pixels) to the
nearest known pixel. The reference computes the discount on CPU per
rectangular mask [lit]; here it is a traceable on-device distance transform —
``iters`` rounds of 3×3 dilation of the known region under ``fori_loop`` —
so it works for free-form masks too and fuses into the loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spatial_discount_mask(mask, gamma: float = 0.9, iters: int = 24):
    """Per-pixel discount weights, (B, H, W, 1) float32.

    Known pixels get weight 1. Hole pixels get gamma^d, d = Chebyshev
    distance to the nearest known pixel, saturating at ``iters``.
    """
    known = 1.0 - mask.astype(jnp.float32)

    def body(_, carry):
        reach, dist = carry
        grown = jax.lax.reduce_window(
            reach, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3, 1),
            window_strides=(1, 1, 1, 1),
            padding=[(0, 0), (1, 1), (1, 1), (0, 0)])
        dist = dist + (1.0 - grown)      # +1 for every round not yet reached
        return grown, dist

    # hole pixels start at distance 1; each dilation round that fails to
    # reach them adds 1, so a pixel first reached at round d ends at d.
    _, dist = jax.lax.fori_loop(
        0, iters, body, (known, 1.0 - known))
    return jnp.power(gamma, dist)


def l1_loss(output, target, mask, *, hole_weight: float = 6.0,
            valid_weight: float = 1.0, discount_gamma: float = 0.0):
    """Weighted mean-absolute-error.

    Args:
      output/target: (B, H, W, 3) in [-1, 1]
      mask: (B, H, W, 1), 1 = hole
      hole_weight/valid_weight: per-region weights
      discount_gamma: if > 0, multiply hole weights by the spatial discount
    """
    output = output.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    weights = hole_weight * mask + valid_weight * (1.0 - mask)
    if discount_gamma > 0.0:
        disc = spatial_discount_mask(mask, discount_gamma)
        weights = weights * jnp.where(mask > 0, disc, 1.0)
    err = jnp.abs(output - target)
    return jnp.sum(weights * err) / (jnp.sum(weights) * err.shape[-1] + 1e-8)


def tv_loss(comp, mask, *, dilation: int = 1):
    """Total-variation smoothness over the (dilated) hole region.

    The partial-conv paper's L_tv term (Liu et al. ECCV'18; reference R11
    family): anisotropic TV of the *composited* image, restricted to pixel
    pairs whose both endpoints lie in the hole region dilated by
    ``dilation`` pixels — it smooths the seam where generated content meets
    known pixels without blurring the untouched known region. Normalized
    exactly as the paper's eq. 9: both direction sums divided by the
    element count N_comp of the dilated region (pixels × channels), so
    ``loss.tv_weight=0.1`` is the paper's own scale (ADVICE r3: the old
    per-counted-pair mean was ~2× smaller).

    Args:
      comp: (B, H, W, C) composited output in [-1, 1]
      mask: (B, H, W, 1), 1 = hole
      dilation: Chebyshev radius to grow the hole region by (paper uses 1)
    """
    comp = comp.astype(jnp.float32)
    region = mask.astype(jnp.float32)
    if dilation > 0:
        k = 2 * dilation + 1
        region = jax.lax.reduce_window(
            region, -jnp.inf, jax.lax.max,
            window_dimensions=(1, k, k, 1),
            window_strides=(1, 1, 1, 1),
            padding=[(0, 0), (dilation, dilation), (dilation, dilation),
                     (0, 0)])
    pair_h = region[:, :, 1:, :] * region[:, :, :-1, :]
    pair_v = region[:, 1:, :, :] * region[:, :-1, :, :]
    diff_h = jnp.abs(comp[:, :, 1:, :] - comp[:, :, :-1, :])
    diff_v = jnp.abs(comp[:, 1:, :, :] - comp[:, :-1, :, :])
    num = jnp.sum(pair_h * diff_h) + jnp.sum(pair_v * diff_v)
    den = jnp.sum(region) * comp.shape[-1] + 1e-8
    return num / den
