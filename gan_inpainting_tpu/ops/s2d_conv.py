"""Space-to-depth stem convolution — exact 5×5 stride-1 conv, MXU-friendly.

The generators' stem convs (reference R4's first layer; SURVEY.md §1b) run
5×5 stride-1 over a 4-channel input at FULL resolution: with 4 of 128 MXU
lanes populated on the contraction, they are the worst-utilized convs in
the model — profiled at ~26 ms/step of the 512² train step (stem forward +
its input-gradient transposed conv, tools/trace_train.py r3).

Exact rewrite: space-to-depth the input by 2 (4C=16 channels at half
resolution) and decompose the OUTPUT by pixel parity — each parity (p, q)
of a 5×5 stride-1 SAME conv is a 3×3 conv over the cell grid whose kernel
taps re-read the original parameter:

    y[2i+p, 2j+q] = Σ_{dy,dx} W[dy,dx]·x[2i+p+dy-2, 2j+q+dx-2]
    with u = p+dy-2 = 2(a-1)+r  →  cell tap a ∈ {0,1,2}, sub-pixel r,
    i.e. Wc[a,b,(r,s,·),(p,q,·)] = W[2a+r-p, 2b+s-q]  (zero when out of
    [0,5) — the 5×5 window straddles cells, so ~69% of the 6×6 cell-kernel
    positions are live).

One conv (3×3, 16→4·Cout at half res) replaces the full-res conv: 1.44×
the MACs at ~4× the contraction-lane utilization, and the input-gradient
in training flows through the same well-shaped conv. Same parameters, same
math (epilogue commutes with the parity interleave) — like
ops/upsample_conv.py, this is a compute-path rewrite behind a config flag
(`model.s2d_stem`), not a model change.
"""

from __future__ import annotations

import jax.numpy as jnp

from gan_inpainting_tpu.ops.conv import conv2d


def cell_kernel(kernel):
    """(5,5,C,F) → (3,3,4C,4F) cell-domain kernel; out channels ordered
    ((p,q), f), in channels ((r,s), c) matching the s2d flatten order."""
    c = kernel.shape[2]
    f = kernel.shape[3]
    k7 = jnp.pad(kernel, ((1, 1), (1, 1), (0, 0), (0, 0)))  # index +1
    wpq = []
    for p in (0, 1):
        for q in (0, 1):
            taps = []
            for a in range(3):
                row = []
                for b in range(3):
                    blk = jnp.stack([
                        jnp.stack([k7[2 * a + r - p + 1, 2 * b + s - q + 1]
                                   for s in (0, 1)], 0)
                        for r in (0, 1)], 0)          # (2,2,C,F)
                    row.append(blk.reshape(4 * c, f))
                taps.append(jnp.stack(row, 0))
            wpq.append(jnp.stack(taps, 0))            # (3,3,4C,F)
    return jnp.concatenate(wpq, axis=-1)              # (3,3,4C,4F)


def s2d_conv5x5_epilogue(x, kernel, epilogue):
    """Exact 5×5 stride-1 SAME conv via the cell-domain decomposition.

    ``epilogue`` is any pointwise map over the conv-output channel dim
    (bias + activation, or the gated split) — it commutes with the parity
    interleave and runs on the half-resolution layout.

    x: (B,H,W,C) with even H,W; kernel: (5,5,C,F2). Returns (B,H,W,Fout)
    where Fout = epilogue's output channels.
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"s2d conv needs even spatial dims, got {(h, w)}")
    if kernel.shape[:2] != (5, 5):
        raise ValueError(f"s2d stem expects a 5x5 kernel, got "
                         f"{kernel.shape[:2]}")
    f2 = kernel.shape[-1]
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(b, h // 2, w // 2, 4 * c)
    wc = cell_kernel(kernel).astype(x.dtype)
    ys = conv2d(xs, wc, stride=1, dilation=1)         # (B,h2,w2,4*F2)
    ys = ys.reshape(b, h // 2, w // 2, 4, f2)
    ys = epilogue(ys)                                 # (...,4,Fout)
    fo = ys.shape[-1]
    ys = ys.reshape(b, h // 2, w // 2, 2, 2, fo)
    return ys.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, fo)
