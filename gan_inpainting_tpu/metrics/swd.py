"""Sliced Wasserstein distance over a Laplacian pyramid (GAN quality).

PSNR/SSIM (metrics/image.py) score per-image fidelity against the ground
truth; a GAN can also fail *distributionally* (texture drift, mode
collapse) in ways a paired metric misses. The standard no-pretrained-
weights distribution metric for image GANs is the multi-scale sliced
Wasserstein distance of Karras et al. 2018 (ProGAN §5): extract local
patch descriptors from each level of a Laplacian pyramid of both image
sets, project onto random unit directions, and compare the sorted 1-D
projections. FID/LPIPS need pretrained feature nets, which this
environment cannot download (SURVEY.md §7 "VGG weights with no network");
SWD needs none, which is exactly why it is the one shipped by default.

Everything here is pure JAX with static shapes: pyramid depth, patch
counts and projection counts are Python-level constants, sampling is
`jax.random`-key-driven, so the whole metric jits and runs on device.
Values are reported ×1e3 (the conventional scaling).

Reference capability anchor: BASELINE.json:2 tracks PSNR/SSIM; SWD is an
additive quality metric (opt-in via ``eval.metrics=(...,"swd")``), not a
replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 5-tap binomial kernel — the classic Burt–Adelson pyramid filter.
_BINOMIAL5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


@functools.lru_cache(maxsize=None)
def _pyr_kernel(c: int) -> np.ndarray:
    k = np.outer(_BINOMIAL5, _BINOMIAL5).astype(np.float32)
    return np.tile(k[:, :, None, None], (1, 1, 1, c))


def _blur(x):
    """Depthwise 5×5 binomial blur, SAME padding. x: (B, H, W, C)."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(_pyr_kernel(c)), window_strides=(1, 1),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=jnp.float32)


def _down(x):
    return _blur(x)[:, ::2, ::2, :]


def _up(x, hw):
    """2× upsample back to ``hw`` (bilinear; smooth enough for a pyramid)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="bilinear")


def laplacian_pyramid(x, n_levels: int):
    """Band-pass levels, finest first; the last entry is the low-pass base.

    x: (B, H, W, C) float. Returns a list of ``n_levels`` arrays; level i
    has spatial size H/2^i.
    """
    levels = []
    cur = x.astype(jnp.float32)
    for _ in range(n_levels - 1):
        low = _down(cur)
        levels.append(cur - _up(low, cur.shape[1:3]))
        cur = low
    levels.append(cur)
    return levels


def _patch_descriptors(level, key, patches_per_image: int, patch_size: int):
    """Random patch descriptors from one pyramid level.

    level: (B, H, W, C) → (B * patches_per_image, patch_size² · C).
    Channel-normalized over the whole descriptor set (per Karras et al.:
    each channel to zero mean / unit std across descriptors) so levels
    with different dynamic ranges contribute comparably.
    """
    b, h, w, c = level.shape
    ky, kx, kb = jax.random.split(key, 3)
    n = b * patches_per_image
    ys = jax.random.randint(ky, (n,), 0, h - patch_size + 1)
    xs = jax.random.randint(kx, (n,), 0, w - patch_size + 1)
    bs = jnp.repeat(jnp.arange(b), patches_per_image)
    del kb

    # Gather patches from a (B, H, W·C) view rather than (B, H, W, C):
    # vmapped dynamic_slice lowers to a gather, and XLA materializes a
    # copy of the operand in its preferred gather layout, which pads the
    # minor-most dim to a 128-lane tile. With C=3 minor that is a 42×
    # HBM blowup (f32[256,512,512,3] → 32 GiB, OOM on v5e). Flattening
    # W and C makes the minor dim W·C (already lane-aligned) and the
    # patch slice stays contiguous: columns [x·C, (x+ps)·C) of row y.
    flat = level.reshape(b, h, w * c)

    def take(bi, yi, xi):
        return jax.lax.dynamic_slice(
            flat, (bi, yi, xi * c), (1, patch_size, patch_size * c))[0]

    patches = jax.vmap(take)(bs, ys, xs)           # (n, ps, ps·c)
    patches = patches.reshape(n, patch_size, patch_size, c)
    mean = jnp.mean(patches, axis=(0, 1, 2), keepdims=True)
    std = jnp.std(patches, axis=(0, 1, 2), keepdims=True)
    patches = (patches - mean) / jnp.maximum(std, 1e-8)
    return patches.reshape(n, patch_size * patch_size * c)


def sliced_wasserstein(a, b, key, n_proj: int = 128):
    """SWD between two descriptor sets. a, b: (N, D) with equal N.

    Projects onto ``n_proj`` random unit directions, sorts each 1-D
    projection, and averages |sorted_a - sorted_b| — the exact 1-D
    Wasserstein-1 distance per direction.
    """
    if a.shape != b.shape:
        raise ValueError(f"descriptor sets differ: {a.shape} vs {b.shape}")
    d = a.shape[1]
    dirs = jax.random.normal(key, (d, n_proj), jnp.float32)
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=0, keepdims=True), 1e-12)
    pa = jnp.sort(a @ dirs, axis=0)
    pb = jnp.sort(b @ dirs, axis=0)
    return jnp.mean(jnp.abs(pa - pb))


def swd(real, fake, key, *, min_res: int = 16, patches_per_image: int = 64,
        patch_size: int = 7, n_proj: int = 128) -> dict:
    """Multi-scale SWD between two image sets (×1e3, lower is better).

    real, fake: (N, H, W, C) in [-1, 1] (any float range works — the
    descriptors are channel-normalized). Returns ``{"swd_<res>": value}``
    per pyramid level plus ``"swd_avg"``. Pyramid depth is derived from
    the static image size (levels down to ``min_res``), so the call jits
    once per shape.
    """
    if real.shape != fake.shape:
        raise ValueError(f"image sets differ: {real.shape} vs {fake.shape}")
    h = min(real.shape[1], real.shape[2])
    size = max(h, min_res, patch_size)
    n_levels = 1
    while size // 2 >= max(min_res, patch_size):
        n_levels += 1
        size //= 2
    pyr_r = laplacian_pyramid(real, n_levels)
    pyr_f = laplacian_pyramid(fake, n_levels)
    out = {}
    vals = []
    for i, (lr, lf) in enumerate(zip(pyr_r, pyr_f)):
        kp, kd = jax.random.split(jax.random.fold_in(key, i))
        da = _patch_descriptors(lr, kp, patches_per_image, patch_size)
        db = _patch_descriptors(lf, kp, patches_per_image, patch_size)
        v = sliced_wasserstein(da, db, kd, n_proj=n_proj) * 1e3
        out[f"swd_{lr.shape[1]}"] = v
        vals.append(v)
    out["swd_avg"] = jnp.mean(jnp.stack(vals))
    return out
