"""Contextual attention (reference R7; Yu et al. CVPR'18 "DeepFill v1",
kept in DeepFill v2's refinement branch).

Patch-match between hole (foreground) and known (background) features:

1. Downscale f, b, mask by ``rate`` for matching.
2. Keys   = L2-normalized ksize×ksize patches of b_small (stride 1).
   Queries = ksize×ksize patches of f_small (stride 1).
   Cosine scores = Q @ K^T, scaled by ``softmax_scale``.
3. Keys whose patch overlaps the hole are masked out (additive -inf bias;
   the reference lineage multiplies scores by the validity instead — the
   additive form is numerically cleaner and identical when any valid key
   exists; with *no* valid key both forms yield zeros here).
4. Softmax over keys → attention; output patches = attention @ V where
   V = (2·rate)×(2·rate) patches of full-res b at stride ``rate``.
5. Overlap-add the output patches back to (H, W) and divide by exact
   overlap counts (the reference divides by the constant interior count;
   exact counts avoid edge artifacts).

This file is the XLA fallback + dispatch. The Pallas path
(ops/pallas/patch_attention.py) replaces steps 2-4 with a blockwise
flash-attention kernel that never materializes the (Lq, Lk) score matrix —
the memory hot spot at 512² (SURVEY.md §5 "long-context analogue").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_inpainting_tpu.ops.dispatch import resolve_backend
from gan_inpainting_tpu.ops.patches import (
    extract_patches,
    fold_patches,
    same_pads,
)

NEG_INF = -1e9
SPATIAL_AXIS = "spatial"


def _ambient_spatial() -> int:
    """Size of the ambient mesh's spatial axis (1 if no mesh / no axis).

    Callers enter mesh scopes with ``jax.set_mesh`` (CLAUDE.md convention),
    so the abstract mesh is visible here even during jit tracing."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:  # pragma: no cover - very old jax
        return 1
    shape = dict(getattr(mesh, "shape", {}) or {})
    return int(shape.get(SPATIAL_AXIS, 1))


def _downscale(x, rate: int):
    # nearest-neighbor downscale as a strided slice: jax.image.resize lowers
    # to a gather, which is an order of magnitude slower on TPU
    return x[:, ::rate, ::rate, :]


def downscale_mask_max(mask, rate: int):
    """Conservative hole-mask downscale: max over each rate×rate window.

    Strided slicing can miss thin free-form strokes entirely, letting keys
    that overlap the hole pass the validity test (contextual attention would
    then copy generated hole content as if it were known background). A
    window max marks a low-res cell as hole if ANY covered pixel is hole.
    """
    if rate == 1:
        return mask
    return jax.lax.reduce_window(
        mask, -jnp.inf if jnp.issubdtype(mask.dtype, jnp.floating)
        else jnp.iinfo(mask.dtype).min,
        jax.lax.max,
        window_dimensions=(1, rate, rate, 1),
        window_strides=(1, rate, rate, 1),
        padding="VALID")


def _attention_inputs(f, b, hole_mask, ksize: int, rate: int):
    """Shared front-end: build Q, K(normalized), key-validity, V."""
    bsz, h, w, c = f.shape
    if h % rate or w % rate:
        raise ValueError(f"spatial dims {(h, w)} must divide rate={rate}")
    hs, ws = h // rate, w // rate

    # V from full-res background: (2r x 2r) patches at stride r → one patch
    # per downscaled matching cell.
    v = extract_patches(b, 2 * rate, rate, "same")          # (B,hs,ws,2r,2r,C)
    v = v.reshape(bsz, hs * ws, 4 * rate * rate * c)

    f_s = _downscale(f, rate)
    b_s = _downscale(b, rate)

    # q and k are the same extraction when f is b (the universal case in
    # DeepFill's refinement stage) — compute once
    k_raw = extract_patches(b_s, ksize, 1, "same")
    k_raw = k_raw.reshape(bsz, hs * ws, ksize * ksize * c)
    if f is b:
        q = k_raw
    else:
        q = extract_patches(f_s, ksize, 1, "same")
        q = q.reshape(bsz, hs * ws, ksize * ksize * c)
    knorm = jnp.sqrt(
        jnp.sum(jnp.square(k_raw.astype(jnp.float32)), -1, keepdims=True))
    k = (k_raw / jnp.maximum(knorm, 1e-4).astype(k_raw.dtype))

    # key j is valid iff its ksize-window contains no hole pixel: a window
    # max over the (conservatively max-pooled) downscaled hole map
    hole_s = downscale_mask_max(hole_mask.astype(jnp.float32), rate)
    pad = [(0, 0),
           ((ksize - 1) // 2, ksize // 2),
           ((ksize - 1) // 2, ksize // 2),
           (0, 0)]
    hole_max = jax.lax.reduce_window(
        hole_s, -jnp.inf, jax.lax.max,
        window_dimensions=(1, ksize, ksize, 1),
        window_strides=(1, 1, 1, 1),
        padding=pad)
    key_valid = hole_max.reshape(bsz, hs * ws) <= 0.0
    return q, k, key_valid, v, (hs, ws)


def contextual_attention(f, b, hole_mask, *, ksize: int = 3, rate: int = 2,
                         softmax_scale: float = 10.0, backend: str = "auto"):
    """Contextual attention.

    Args:
      f: (B, H, W, C) foreground features (queries; typically == b).
      b: (B, H, W, C) background features (keys/values).
      hole_mask: (B, H, W, 1), 1 = hole. Keys inside the hole are excluded.

    Returns:
      (B, H, W, C) attended features.
    """
    backend = resolve_backend(backend, op="contextual_attention")
    bsz, h, w, c = f.shape

    n_sp = _ambient_spatial()
    if n_sp > 1:
        # Row-sharded (spatial) mesh. A Pallas kernel is a per-device
        # program GSPMD cannot auto-partition across a row-sharded operand,
        # so the kernel path goes through an explicit shard_map: gather the
        # key side, attend local query rows only (the blockwise-attention
        # pattern, device-sized blocks). The XLA dense path stays under
        # GSPMD — it partitions the einsums natively and its spatial parity
        # is pinned bit-exact (tests/distributed/test_spatial.py).
        if backend == "pallas" and _spatial_shardable(f.shape, rate, n_sp):
            return _spatial_attention(
                f, b, hole_mask, ksize=ksize, rate=rate,
                softmax_scale=softmax_scale, backend=backend, n_sp=n_sp)
        backend = "xla"

    if backend == "pallas" and f is b:
        from gan_inpainting_tpu.ops.pallas.fused_attention import (
            fused_attention_map,
            fused_supported,
        )
        if fused_supported(f.shape, ksize, rate):
            # fully-fused path: Q/K/V built in-kernel from the feature map,
            # tap-major output folded by the Pallas overlap-add — no patch
            # tensor and no patch-major transpose ever exist in HBM
            y = fused_attention_map(b, hole_mask, ksize=ksize, rate=rate,
                                    softmax_scale=softmax_scale)
            return y.astype(f.dtype)

    q, k, key_valid, v, (hs, ws) = _attention_inputs(
        f, b, hole_mask, ksize, rate)
    if backend == "pallas":
        from gan_inpainting_tpu.ops.pallas.patch_attention import (
            patch_attention_pallas,
        )
        yp = patch_attention_pallas(q, k, key_valid, v,
                                    softmax_scale=softmax_scale)
    else:
        yp = _patch_attention_xla(q, k, key_valid, v, softmax_scale)

    yp = yp.reshape(bsz, hs, ws, 2 * rate, 2 * rate, c)
    y, cnt = fold_patches(yp, rate, (h, w), "same")
    y = y / jnp.maximum(cnt, 1.0).astype(y.dtype)
    return y.astype(f.dtype)


def _overlap_counts(h: int, w: int, rate: int, dtype):
    """Fold overlap counts for the (2r x 2r, stride r) value patches —
    geometry-only, so XLA constant-folds it."""
    hs, ws = h // rate, w // rate
    zeros = jnp.zeros((1, hs, ws, 2 * rate, 2 * rate, 1), dtype)
    _, cnt = fold_patches(zeros, rate, (h, w), "same")
    return cnt


def _mesh_axis_sizes() -> tuple[int, int, int]:
    shape = dict(jax.sharding.get_abstract_mesh().shape or {})
    return (int(shape.get("data", 1)), int(shape.get("model", 1)),
            int(shape.get("spatial", 1)))


def _spatial_shardable(shape, rate: int, n_sp: int) -> bool:
    """The shard_map path needs every manual mesh axis to divide its dim:
    query rows over 'spatial', batch over 'data', channels over 'model'
    (shard_map is fully manual — a Pallas call under partial-auto sharding
    is unsupported, jax 0.9)."""
    bsz, h, w, c = shape
    n_data, n_model, _ = _mesh_axis_sizes()
    return (h % rate == 0 and (h // rate) % n_sp == 0
            and bsz % n_data == 0 and c % n_model == 0)


def _spatial_attention(f, b, hole_mask, *, ksize: int, rate: int,
                       softmax_scale: float, backend: str, n_sp: int):
    """Contextual attention over a row-sharded (spatial) mesh via shard_map.

    The cross-device analogue of the blockwise kernel (SURVEY.md §5): each
    device owns a contiguous block of query rows; the key side is one
    all_gather away (keys are global — any hole row may match any
    background row, so the gather is information-theoretically required;
    a ring schedule could stream it in n_sp hops instead of one gather —
    recorded as the upgrade path if the gather ever shows up in a trace).

    Per device: build Q/K/V from the gathered map, attend only the local
    1/n_sp of the query rows with the flash kernel (scores never
    materialize), overlap-add the output patches onto the local row band
    (+r boundary rows), and reduce-scatter rows so the r-row overlaps
    between neighbouring bands sum correctly. The mesh is fully manual
    inside: batch stays per-device on 'data' (attention is
    batch-parallel); TP channel shards are gathered on entry — scores
    contract over all channels, the same gather the TP seam implies — and
    re-scattered with the rows on exit.
    """
    bsz, h, w, c = f.shape
    hs, ws = h // rate, w // rate
    hs_loc = hs // n_sp
    h_loc = h // n_sp
    ph = same_pads(h, 2 * rate, rate)
    pw = same_pads(w, 2 * rate, rate)
    hp = h + ph[0] + ph[1]
    wp = w + pw[0] + pw[1]
    shared_qk = f is b
    _, n_model, _ = _mesh_axis_sizes()

    from gan_inpainting_tpu.ops.patches import _fold_tiled

    def gather_full(x_loc, channels: bool):
        x = jax.lax.all_gather(x_loc, SPATIAL_AXIS, axis=1, tiled=True)
        if channels and n_model > 1:
            x = jax.lax.all_gather(x, "model", axis=3, tiled=True)
        return x

    def per_shard(f_loc, b_loc, m_loc):
        i = jax.lax.axis_index(SPATIAL_AXIS)
        b_full = gather_full(b_loc, channels=True)
        m_full = gather_full(m_loc, channels=False)
        if shared_qk:
            qk_f, qk_b = b_full, b_full  # preserve the f-is-b fast path
        else:
            qk_f = gather_full(f_loc, channels=True)
            qk_b = b_full
        q, k, key_valid, v, _ = _attention_inputs(
            qk_f, qk_b, m_full, ksize, rate)

        nb, _, d = q.shape
        q_loc = jax.lax.dynamic_slice_in_dim(
            q.reshape(nb, hs, ws, d), i * hs_loc, hs_loc, axis=1,
        ).reshape(nb, hs_loc * ws, d)
        if backend == "pallas":
            from gan_inpainting_tpu.ops.pallas.patch_attention import (
                patch_attention_pallas,
            )
            yp = patch_attention_pallas(q_loc, k, key_valid, v,
                                        softmax_scale=softmax_scale)
        else:
            yp = _patch_attention_xla(q_loc, k, key_valid, v, softmax_scale)

        # local overlap-add: this shard's patches touch its own h_loc output
        # rows plus r rows into the next band
        yp = yp.reshape(nb, hs_loc, ws, 2 * rate, 2 * rate, c)
        band, _ = _fold_tiled(yp, rate, (h_loc + rate, wp))
        band = band[:, :, pw[0]:pw[0] + w, :]
        canvas = jnp.zeros((nb, hp, w, c), band.dtype)
        canvas = jax.lax.dynamic_update_slice(canvas, band,
                                              (0, i * h_loc, 0, 0))
        canvas = canvas[:, ph[0]:ph[0] + h]
        out = jax.lax.psum_scatter(canvas, SPATIAL_AXIS,
                                   scatter_dimension=1, tiled=True)
        if n_model > 1:
            j = jax.lax.axis_index("model")
            out = jax.lax.dynamic_slice_in_dim(
                out, j * (c // n_model), c // n_model, axis=3)
        return out

    from jax.sharding import PartitionSpec as P

    act = P("data", SPATIAL_AXIS, None, "model" if n_model > 1 else None)
    msk = P("data", SPATIAL_AXIS, None, None)
    y = jax.shard_map(per_shard, in_specs=(act, act, msk),
                      out_specs=act, check_vma=False)(f, b, hole_mask)
    cnt = _overlap_counts(h, w, rate, y.dtype)
    y = y / jnp.maximum(cnt, 1.0).astype(y.dtype)
    return y.astype(f.dtype)


def _patch_attention_xla(q, k, key_valid, v, softmax_scale: float):
    """Dense attention: materializes the (Lq, Lk) score matrix."""
    scores = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32)
    bias = jnp.where(key_valid, 0.0, NEG_INF)[:, None, :]
    attn = jax.nn.softmax(softmax_scale * scores + bias, axis=-1)
    # kill the uniform-leak case where no key is valid
    attn = attn * key_valid[:, None, :].astype(attn.dtype)
    return jnp.einsum("bqk,bke->bqe", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)
