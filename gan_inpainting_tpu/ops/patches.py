"""Patch extraction / overlap-add folding (unfold/fold in torch terms).

The reference's contextual attention uses ``torch.unfold`` + transposed conv
(SURVEY.md R7). Here both directions are written as static shifted strided
slices — kh*kw cheap slices that XLA fuses — with deterministic
(kh, kw, C)-ordered layout, rather than relying on the undocumented channel
ordering of ``conv_general_dilated_patches``.
"""

from __future__ import annotations

import jax.numpy as jnp


def same_pads(size: int, window: int, stride: int) -> tuple[int, int]:
    """TF-style SAME padding (lo, hi) for one spatial dim."""
    out = -(-size // stride)  # ceil
    total = max((out - 1) * stride + window - size, 0)
    return total // 2, total - total // 2


def extract_patches(x, window: int, stride: int,
                    pads: tuple[int, int] | str = "same"):
    """Extract square patches.

    Args:
      x: (B, H, W, C)
      window: patch side k
      stride: patch stride
      pads: (lo, hi) applied to both spatial dims, or "same"/"valid"

    Returns:
      (B, Ho, Wo, k, k, C) patches, where element [b, i, j, p, q, c] is
      x_padded[b, i*stride + p, j*stride + q, c].
    """
    b, h, w, c = x.shape
    if pads == "same":
        ph = same_pads(h, window, stride)
        pw = same_pads(w, window, stride)
    elif pads == "valid":
        ph = pw = (0, 0)
    else:
        ph = pw = pads
    xp = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    ho = (hp - window) // stride + 1
    wo = (wp - window) // stride + 1

    if window % stride == 0 and stride > 1:
        return _extract_tiled(xp, window, stride, ho, wo)

    parts = []
    for p in range(window):
        for q in range(window):
            sl = xp[:, p:p + (ho - 1) * stride + 1:stride,
                    q:q + (wo - 1) * stride + 1:stride, :]
            parts.append(sl)
    # one concat along channels, then a free reshape to (k, k, C) trailing
    # dims — channel index (p*k + q)*C + c matches [p, q, c]
    flat = jnp.concatenate(parts, axis=-1)           # (B,Ho,Wo,k*k*C)
    return flat.reshape(b, ho, wo, window, window, c)


def _extract_tiled(xp, window: int, stride: int, ho: int, wo: int):
    """window = m·stride fast path: the inverse of :func:`_fold_tiled`.

    Space-to-depth the padded input once (a reshape/transpose), then each of
    the m² offset-blocks of every patch is a *contiguous* slice — k²
    strided slices collapse to m² dense ones.
    """
    b = xp.shape[0]
    c = xp.shape[-1]
    s = stride
    m = window // s
    # cells needed: ho-1+m along rows; pad xp up to a whole cell grid
    cells_h, cells_w = ho - 1 + m, wo - 1 + m
    need_h, need_w = cells_h * s, cells_w * s
    xp = jnp.pad(xp, ((0, 0), (0, need_h - xp.shape[1]),
                      (0, need_w - xp.shape[2]), (0, 0)))
    s2d = xp.reshape(b, cells_h, s, cells_w, s, c)

    rows = []
    for a in range(m):
        cols = []
        for b_ in range(m):
            # patch (i, j)'s offset-block (a, b_) = cell (i + a, j + b_)
            blk = s2d[:, a:a + ho, :, b_:b_ + wo, :, :]   # (B,ho,s,wo,s,C)
            cols.append(blk.transpose(0, 1, 3, 2, 4, 5))  # (B,ho,wo,s,s,C)
        rows.append(jnp.concatenate(cols, axis=4))         # concat q offsets
    patches = jnp.concatenate(rows, axis=3)                # (B,ho,wo,k,k,C)
    return patches


def fold_patches(patches, stride: int, out_hw: tuple[int, int],
                 pads: tuple[int, int] | str = "same"):
    """Overlap-add the transpose of :func:`extract_patches`.

    Args:
      patches: (B, Ho, Wo, k, k, C)
      stride: stride used at extraction
      out_hw: (H, W) of the original (unpadded) array
      pads: padding used at extraction ((lo, hi) or "same"/"valid")

    Returns:
      (B, H, W, C) overlap-added array, and (H, W, 1) overlap counts so the
      caller can normalize (counts are the fold of all-ones patches).
    """
    b, ho, wo, k, k2, c = patches.shape
    assert k == k2
    h, w = out_hw
    if pads == "same":
        ph = same_pads(h, k, stride)
        pw = same_pads(w, k, stride)
    elif pads == "valid":
        ph = pw = (0, 0)
    else:
        ph = pw = pads
    hp = h + ph[0] + ph[1]
    wp = w + pw[0] + pw[1]

    if k % stride == 0:
        out, cnt = _fold_tiled(patches, stride, (hp, wp))
    else:
        out, cnt = _fold_scatter(patches, stride, (hp, wp))
    out = out[:, ph[0]:ph[0] + h, pw[0]:pw[0] + w, :]
    cnt = cnt[ph[0]:ph[0] + h, pw[0]:pw[0] + w, :]
    return out, cnt


def _fold_tiled(patches, stride: int, hw_padded: tuple[int, int]):
    """Scatter-free overlap-add for window = m*stride.

    Offset-block (a, b) of every patch — rows a*s..(a+1)*s, cols b*s..(b+1)*s
    — tiles the padded output exactly (patch i starts at i*s, so its (a, b)
    block covers rows (i+a)*s..(i+a+1)*s with no gaps or overlap across i).
    The fold is then m² transpose-reshape layers, each padded into place and
    summed: pure reshapes + elementwise adds, no scatter — scatters serialize
    terribly on TPU and dominated the first profile of this op.
    """
    bsz, ho, wo, k, _, c = patches.shape
    s = stride
    m = k // s
    hp, wp = hw_padded
    layer_h, layer_w = ho * s, wo * s

    out = jnp.zeros((bsz, hp, wp, c), patches.dtype)
    cnt = jnp.zeros((hp, wp, 1), patches.dtype)
    for a in range(m):
        for b_ in range(m):
            block = patches[:, :, :, a * s:(a + 1) * s, b_ * s:(b_ + 1) * s,
                            :]
            layer = block.transpose(0, 1, 3, 2, 4, 5).reshape(
                bsz, layer_h, layer_w, c)
            pad_r = (a * s, hp - a * s - layer_h)
            pad_c = (b_ * s, wp - b_ * s - layer_w)
            out = out + jnp.pad(layer, ((0, 0), pad_r, pad_c, (0, 0)))
            cnt = cnt + jnp.pad(
                jnp.ones((layer_h, layer_w, 1), patches.dtype),
                (pad_r, pad_c, (0, 0)))
    return out, cnt


def _fold_scatter(patches, stride: int, hw_padded: tuple[int, int]):
    """General fallback (window not a multiple of stride): strided scatter."""
    bsz, ho, wo, k, _, c = patches.shape
    hp, wp = hw_padded
    out = jnp.zeros((bsz, hp, wp, c), patches.dtype)
    cnt = jnp.zeros((hp, wp, 1), patches.dtype)
    one = jnp.ones((ho, wo, 1), patches.dtype)
    for p in range(k):
        for q in range(k):
            rs = slice(p, p + (ho - 1) * stride + 1, stride)
            cs = slice(q, q + (wo - 1) * stride + 1, stride)
            out = out.at[:, rs, cs, :].add(patches[:, :, :, p, q, :])
            cnt = cnt.at[rs, cs, :].add(one)
    return out, cnt
