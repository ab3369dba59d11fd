"""Partial convolution (reference R6; Liu et al., ECCV'18).

Mask-aware conv: features are convolved only over *valid* pixels and
re-normalized by the live fraction of the window; the validity mask dilates
by one receptive field per layer.

    y = conv(x * valid) * (k*k / sum_window(valid)) + b   where sum > 0
    y = 0                                                 where sum == 0
    valid' = sum_window(valid) > 0

Note the mask here is a VALIDITY mask (1 = known), i.e. ``1 - hole`` in the
framework's hole convention — matching the paper's notation.

Backends:
* xla    — feature conv + ``reduce_window`` mask count + fused epilogue.
* pallas — same conv; the epilogue (renormalize, bias, mask-update, zero-fill)
  runs as one Pallas VPU kernel (ops/pallas/fused_matmul.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_inpainting_tpu.ops.conv import conv2d
from gan_inpainting_tpu.ops.dispatch import resolve_backend
from gan_inpainting_tpu.ops.patches import same_pads


def _window_counts(valid, window: int, stride: int, dilation: int):
    """Per-output-pixel count of valid input pixels, (B, Ho, Wo, 1)."""
    h, w = valid.shape[1], valid.shape[2]
    eff = (window - 1) * dilation + 1
    pads = [(0, 0), same_pads(h, eff, stride), same_pads(w, eff, stride),
            (0, 0)]
    return jax.lax.reduce_window(
        valid.astype(jnp.float32), 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
        window_dilation=(1, dilation, dilation, 1),
    )


def partial_conv(x, valid, kernel, bias, *, stride: int = 1,
                 dilation: int = 1, backend: str = "auto"):
    """Partial conv.

    Args:
      x: (B, H, W, Cin) features
      valid: (B, H, W, 1) validity mask (1 = known pixel)
      kernel: (k, k, Cin, Cout); bias: (Cout,)

    Returns:
      (y, valid_out): (B, Ho, Wo, Cout) and the dilated validity mask.
    """
    backend = resolve_backend(backend, op="partial_conv")
    k = kernel.shape[0]
    counts = _window_counts(valid, k, stride, dilation)
    raw = conv2d(x * valid.astype(x.dtype), kernel, stride=stride,
                 dilation=dilation)
    if backend == "pallas":
        from gan_inpainting_tpu.ops.pallas.fused_matmul import (
            partial_conv_epilogue_pallas,
        )
        return partial_conv_epilogue_pallas(raw, counts, bias, k)
    return partial_conv_epilogue_xla(raw, counts, bias, k)


def partial_conv_epilogue_xla(raw, counts, bias, window: int):
    counts = counts.astype(jnp.float32)
    any_valid = counts > 0.0
    scale = jnp.where(any_valid, (window * window) / jnp.maximum(counts, 1.0),
                      0.0)
    y = raw * scale.astype(raw.dtype) + bias.astype(raw.dtype)
    y = jnp.where(any_valid, y, jnp.zeros((), raw.dtype))
    return y, any_valid.astype(raw.dtype)
