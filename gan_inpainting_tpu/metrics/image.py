"""PSNR / SSIM in pure JAX (reference R14's metrics, BASELINE.json:2).

SSIM per Wang et al. 2004 with the standard 11×11 Gaussian window
(sigma 1.5), K1=0.01, K2=0.03 — the same definition as tf.image.ssim /
skimage defaults, and cross-checked against tf.image.ssim in tests
(SURVEY.md §4). Inputs are expected in [-1, 1] (the framework's image
range); ``max_val`` defaults to 2.0 accordingly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b, max_val: float = 2.0):
    """Per-image PSNR in dB. a, b: (..., H, W, C). Returns (...,)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mse = jnp.mean((a - b) ** 2, axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))


@functools.lru_cache(maxsize=None)
def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2(x, window):
    """Depthwise valid-mode 2-D filter. x: (B, H, W, C).

    Precision HIGHEST is load-bearing: SSIM's variance uses the
    cancellation form E[x^2] - mu^2, whose terms are O(|x|^2) ~ 1 while
    c2 = 0.0036. At TPU default conv precision (bf16 operands) the
    rounding noise is the same order as c2 in flat windows, and the
    noise pattern shifts with compilation context — measured 0.90 vs
    0.96 mean SSIM for the SAME params/images at 512^2 (train-loop vs
    standalone eval) while PSNR agreed to 3e-4 dB. HIGHEST makes the
    filters f32-exact; metric cost is negligible.
    """
    c = x.shape[-1]
    kernel = jnp.asarray(window)[:, :, None, None]
    kernel = jnp.tile(kernel, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def ssim(a, b, max_val: float = 2.0, filter_size: int = 11,
         filter_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03):
    """Mean SSIM per image. a, b: (B, H, W, C). Returns (B,)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    window = _gaussian_kernel(filter_size, filter_sigma)

    mu_a = _filter2(a, window)
    mu_b = _filter2(b, window)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_aa = _filter2(a * a, window) - mu_aa
    sigma_bb = _filter2(b * b, window) - mu_bb
    sigma_ab = _filter2(a * b, window) - mu_ab

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    luminance = (2.0 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    contrast = (2.0 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    return jnp.mean(luminance * contrast, axis=(-3, -2, -1))
