"""Fused nearest-2x-upsample + SAME 3x3 conv at low-resolution FLOPs.

The reference decoder genre (SURVEY.md R4; BASELINE.json:5 encoder-decoder)
upsamples nearest-neighbor then convolves 3x3 — the two most expensive
layers of every decoder stage run at the UPSAMPLED resolution. But nearest
upsampling makes the conv read each low-res pixel repeatedly: for output
parity (p, q) ∈ {0,1}², the three 3x3 taps collapse onto just two distinct
low-res cells per axis, with weights summing by linearity:

    y[2i+p, 2j+q] = Σ_{da,db} W[1+da, 1+db] · x[(2i+p+da)//2, (2j+q+db)//2]

    rows touched  p=0: {i-1: W0,       i: W1+W2}
                  p=1: {i:   W0+W1, i+1: W2}      (same along columns)

so the whole block is ONE low-res VALID 2x2 conv over x padded by 1,
emitting all four parity kernels as channel groups, followed by a
depth-to-space interleave. Exactly the same math (weight taps summed before
multiplying instead of after — pure linearity), at 16/36 = 4/9ths of the
MACs, with a 4x larger contraction dim (4·Cin) that tiles the MXU far
better than the upsampled-resolution conv. Zero-padding agrees at every
edge: high-res pad row -1/2H maps to low-res pad row -1/H in both forms.

This is the TPU-first replacement for the reference's
``F.interpolate(scale_factor=2) -> Conv2d(k=3)`` decoder blocks — measured
≈11% of flagship forward FLOPs removed with bit-equivalent semantics
(tests/kernels/test_upsample_conv.py pins forward and gradient equivalence
against the explicit upsample+conv composition).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def parity_kernels(kernel):
    """(3, 3, Cin, Cout) -> (2, 2, Cin, 4*Cout) effective parity kernels.

    Channel group g = 2*p + q holds the 2x2 kernel producing output parity
    (p, q); built in the kernel's own dtype (call with f32 params, cast the
    result to the compute dtype — tap sums then round once, not twice).
    """
    if kernel.shape[:2] != (3, 3):
        raise ValueError(f"parity_kernels needs a 3x3 kernel, got "
                         f"{kernel.shape[:2]}")
    w0, w1, w2 = kernel[0], kernel[1], kernel[2]        # (3, Cin, Cout)
    rows = (jnp.stack([w0, w1 + w2]),                   # p = 0: rows (i-1, i)
            jnp.stack([w0 + w1, w2]))                   # p = 1: rows (i, i+1)
    groups = []
    for p in (0, 1):
        r = rows[p]                                     # (2, 3, Cin, Cout)
        c0, c1, c2 = r[:, 0], r[:, 1], r[:, 2]          # (2, Cin, Cout)
        groups.append(jnp.stack([c0, c1 + c2], axis=1))  # q = 0
        groups.append(jnp.stack([c0 + c1, c2], axis=1))  # q = 1
    return jnp.concatenate(groups, axis=-1)             # (2, 2, Cin, 4*Cout)


def upsample2x_conv2d(x, kernel):
    """nearest-2x upsample of ``x`` then SAME 3x3 conv — computed as four
    asymmetrically-padded low-res 2x2 convs + depth-to-space.

    Four separate SAME-shaped convs (one per output parity) measured faster
    on v5e than the single VALID conv over a padded input emitting all four
    parity groups at once (tools/bench_upconv.py: 9.4 vs 12.0 ms at the
    64->128 d3 shape; the odd (H+1, W+1) intermediate and its sliced
    interleave lose to four aligned (H, W) maps + a standard depth-to-space).

    Args:
      x: (B, H, W, Cin) low-resolution activations.
      kernel: (3, 3, Cin, Cout) — the SAME parameter a plain upsample+conv
        block owns, so the two formulations are checkpoint-compatible.
    Returns:
      (B, 2H, 2W, Cout), numerically equal to
      ``conv2d(_upsample2x(x), kernel)``.
    """
    return upsample2x_conv2d_epilogue(x, kernel, lambda m: m)


def upsample2x_conv2d_epilogue(x, kernel, epilogue):
    """As :func:`upsample2x_conv2d`, applying ``epilogue`` (any elementwise
    map, e.g. bias + gated activation) to each parity map BEFORE the
    interleave — pointwise maps commute with depth-to-space, and fusing them
    into the four convs avoids materializing the pre-activation at the
    upsampled resolution.
    """
    b, h, w, _ = x.shape
    cout = kernel.shape[-1]
    k4 = parity_kernels(kernel).astype(x.dtype)
    pads = {0: (1, 0), 1: (0, 1)}  # parity p window = rows (i-1+p, i+p)
    maps = {}
    for p in (0, 1):
        for q in (0, 1):
            kk = k4[..., (2 * p + q) * cout:(2 * p + q + 1) * cout]
            m = lax.conv_general_dilated(
                x, kk, window_strides=(1, 1), padding=(pads[p], pads[q]),
                dimension_numbers=DIMENSION_NUMBERS)    # (B, H, W, Cout)
            maps[(p, q)] = epilogue(m)
    cfin = maps[0, 0].shape[-1]
    # stack-then-transpose measured fastest of the interleave forms on v5e
    # (558.5 img/s serve vs 545.0 for nested stacks landing the final order
    # directly, 540.0 for a single VALID conv + sliced interleave) — XLA
    # fuses the 4-way stack into one kLoop and the transpose into one copy
    y = jnp.stack([maps[p, q] for p in (0, 1) for q in (0, 1)], axis=3)
    y = y.reshape(b, h, w, 2, 2, cfin).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, cfin)
