"""Pallas overlap-add fold for contextual-attention output patches.

Folds the fused attention kernel's NATIVE (B, taps=4r², Lq, C) tap-major
output into the (B, H, W, C) feature map, fusing in one pass what the XLA
path spends several full-res materializations on (transpose to patch-major,
4·m² layer transposes, pads, adds, count divide — measured ~6 ms/batch at
256²/b128 serve).

Math (window 2r, stride r, SAME — ops/patches.py fold_patches semantics):
output row a = r·i + p − r//2 decomposes as a = r·i' + rr with the tap row
index p = rr + r//2 + r·δ, δ = i' − i ∈ {−1, 0, +1}; only δ with p in
[0, 2r) contribute — exactly 2 taps per axis, so each output parity plane
(rr, ss) is a sum of 4 cell-shifted tap maps. Shifts stay inside VMEM: the
grid blocks over cell-row groups with a one-cell halo (``pl.Element``
windows with zero padding at the array edges), each parity plane is
assembled from aligned whole-cell slices, and the (rg, r, ws, r, C)
interleave happens on registers before the single output write. Division by
overlap counts (a compile-time geometric constant) is folded in via a
precomputed reciprocal plane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_kernel(taps_ref, inv_ref, o_ref, *, rate: int, rg: int, ws: int,
                 c: int):
    r = rate
    # taps_ref: (1, taps, (rg+2)*ws, C) — cells i*rg-1 .. i*rg+rg (zero-
    # padded outside the array; the all-Element window overlaps row groups —
    # Mosaic requires every dim of an Element spec to be Element);
    # inv_ref: (r*rg, r*ws); o_ref: (r*rg, r*ws, C)
    planes = []
    for rr in range(r):
        row_taps = []
        for delta in (0, -1, 1):
            p = rr + r // 2 + r * delta
            if 0 <= p < 2 * r:
                row_taps.append((p, delta))
        cols = []
        for ss in range(r):
            col_taps = []
            for delta in (0, -1, 1):
                q = ss + r // 2 + r * delta
                if 0 <= q < 2 * r:
                    col_taps.append((q, delta))
            acc = jnp.zeros((rg, ws, c), jnp.float32)
            for p, dr in row_taps:
                for q, dc in col_taps:
                    tap = taps_ref[0, p * 2 * r + q].reshape(rg + 2, ws, c)
                    # contribution tap[i = i' - dr] -> local cell 1 + i' - dr
                    m = tap[1 - dr:1 - dr + rg]
                    # column shift by dc with zero fill at the edges
                    if dc == 0:
                        mc = m
                    elif dc == -1:
                        mc = jnp.pad(m[:, 1:], ((0, 0), (0, 1), (0, 0)))
                    else:
                        mc = jnp.pad(m[:, :-1], ((0, 0), (1, 0), (0, 0)))
                    acc = acc + mc.astype(jnp.float32)
            cols.append(acc)
        planes.append(jnp.stack(cols, axis=2))          # (rg, ws, r, C)
    y = jnp.stack(planes, axis=1)                       # (rg, r, ws, r, C)
    y = y.reshape(rg * r, ws * r, c)
    # inv arrives as the FULL (r·hs, r·ws) plane (tiny geometry constant;
    # a blocked spec would need 8-sublane-divisible row groups)
    row0 = pl.program_id(1) * rg * r
    y = y * inv_ref[pl.ds(row0, rg * r), :][:, :, None]
    o_ref[:] = y.astype(o_ref.dtype)


def fold_counts_inv(hs: int, ws: int, rate: int) -> jnp.ndarray:
    """(r·hs, r·ws) f32 reciprocal overlap counts (geometry constant)."""
    from gan_inpainting_tpu.ops.patches import fold_patches

    ones = jnp.ones((1, hs, ws, 2 * rate, 2 * rate, 1), jnp.float32)
    _, cnt = fold_patches(ones, rate, (rate * hs, rate * ws), "same")
    return (1.0 / jnp.maximum(cnt[..., 0], 1.0)).astype(jnp.float32)


def fold_taps_pallas(taps, hs: int, ws: int, rate: int, *,
                     out_dtype=None):
    """Overlap-add (B, 4r², hs·ws, C) tap-major patches → (B, r·hs, r·ws, C).

    Equals ``fold_patches(...)/max(cnt,1)`` on the patch-major layout
    (tests/kernels/test_fold.py pins equivalence).
    """
    b, n_taps, lq, c = taps.shape
    r = rate
    assert n_taps == 4 * r * r and lq == hs * ws
    out_dtype = out_dtype or taps.dtype
    inv = fold_counts_inv(hs, ws, r)

    # one zero cell-row of halo each side (the overlapping Element windows
    # must stay in bounds); the pad is the only extra HBM pass this path
    # makes — the XLA fold makes several
    taps = jnp.pad(taps, ((0, 0), (0, 0), (ws, ws), (0, 0)))

    # cell-row group: keep the double-buffered input block within ~8 MB.
    # Small row-groups are overhead-dominated (rg=2 at the 512² shape ran
    # ~5 ms slower than the XLA fold; rg≥8 wins at every measured shape).
    rg = hs
    while rg > 1 and n_taps * (rg + 2) * ws * c * taps.dtype.itemsize > (
            4 * 1024 * 1024):
        rg //= 2
    while hs % rg:
        rg //= 2

    out = pl.pallas_call(
        functools.partial(_fold_kernel, rate=r, rg=rg, ws=ws, c=c),
        grid=(b, hs // rg),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(n_taps),
                 pl.Element((rg + 2) * ws), pl.Element(c)),
                lambda b_, i: (b_, 0, i * rg * ws, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((r * hs, r * ws), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pl.Squeezed(), r * rg, r * ws, c),
                               lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r * hs, r * ws, c), out_dtype),
    )(taps, inv)
    return out
