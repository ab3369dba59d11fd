"""In-kernel backward for the fully-fused contextual attention.

VERDICT r2 #2's full form: training at 512² materializes neither the
(Lq, Lk) score matrix (the streaming flash backward already avoided that)
nor the Q (9C·L) / K (9C·L) / V (16C·L) patch tensors. Every tile the
backward needs is rebuilt in-kernel from the same VMEM-resident sub-pixel
parity maps the forward uses (fused_attention.py module docstring), and the
upstream gradient arrives the same way: the adjoint of the overlap-add fold
is exactly a parity-map decomposition of dy/cnt, so `do` tiles are slices
of (r, r, Hs+2, Ws+2, C) gradient parity maps — no (Lq, 16C) `do` tensor
either. The gradient maps are only ever read for the CURRENT query
row-group, so they stream through VMEM as overlapping all-Element halo
windows (the validated safe Mosaic seam on this box) instead of residing
like the feature maps — two resident map sets would blow VMEM at the
512² flagship shape (c=192: 6.7 MB each).

The patch-gradient → feature-map-gradient scatter also happens in-kernel:
each grid row-group accumulates its tap gradients in f32 scratch and writes
ONE halo-padded block (rows i·qr .. i·qr+qr+1 of the padded map); adjacent
blocks overlap by two halo rows which a tiny XLA epilogue adds back
(`_merge_row_blocks`). Assembling the block uses concat-embedding (zeros ‖
tap ‖ zeros) instead of offset stores — Mosaic-safe on this box's

toolchain, where several write patterns are not (CLAUDE.md hazard notes).

Key-normalization correction: the kernels treat s = scale·rnorm_j·(q_i·k_j)
with rnorm streamed like the forward; the extra term from
d rnorm/dk = -1[n>eps]·k/(n·m²) reduces to a per-key scalar t_j = Σ_i
ds⁰_ij·u_ij (emitted by the dK/dV kernel) applied OUTSIDE as nine shifted
map-sized multiply-adds — Σ_j c_j·(patch_j of b_s) is a depthwise fold of
c ⊙ b_s, no patch tensor needed.

Residuals saved by the forward: tap-major output O (for δ = rowsum(do∘o),
computed in the dQ kernel at its first key step) and the per-query
logsumexp (p is recomputed as exp(s - lse), already normalized). δ is then
an output of the dQ kernel and an input of the dK/dV kernel.

Semantics match the materialized composition in ops/contextual_attention.py
(`_attention_inputs` + flash attention + fold); gradient equivalence is
pytest-gated against the XLA oracle including all-hole rows
(tests/kernels/test_fused_attention_bwd.py). Maps to reference R7's
training path (SURVEY.md §2a; reference mount empty, BASELINE.json:9).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gan_inpainting_tpu.ops.pallas import fused_attention as _fa
from gan_inpainting_tpu.ops.pallas.fused_attention import _lcm, _prepare


def fused_bwd_enabled() -> bool:
    """Env kill-switch (INPAINT_FUSED_BWD=0 falls back to the materialized
    streaming-flash backward)."""
    return _os.environ.get("INPAINT_FUSED_BWD", "1") == "1"


# ---------------------------------------------------------------------------
# Planning
# ---------------------------------------------------------------------------


def _bwd_vmem_bytes(hs: int, ws: int, c: int, rate: int, qr: int, kr: int,
                    ksize: int = 3) -> int:
    bq, bk = qr * ws, kr * ws
    taps = 4 * rate * rate
    # feature maps resident single-buffered (grid-constant index); the
    # GRADIENT maps are NOT resident — `do` tiles are only ever read for
    # the current query row-group, so they stream as an all-Element
    # overlapping halo window (the validated safe Mosaic seam). Keeping
    # both maps resident would blow VMEM at the 512² flagship (c=192:
    # 2 × 6.7 MB of maps alone).
    maps = rate * rate * (hs + 2) * (ws + 2) * c * 2
    gwin = rate * rate * (qr + 2) * (ws + 2) * c * 2 * 2   # double-buffered
    trans = 4 * bq * bk * 4                      # u, s/p, dp, ds transients
    dq_side = (ksize * ksize * bq * c * 4        # dq tap scratch (f32)
               + taps * bq * c * 2 * 2           # o operand, double-buffered
               + (qr + 2) * (ws + 2) * c * 2 * 2   # dq halo block out
               + 2 * bq * 128 * 4 * 2)           # lse in + delta out
    dkv_side = (ksize * ksize * bk * c * 4       # dk tap scratch
                + taps * bk * c * 4              # dv tap scratch
                + (kr + 2) * (ws + 2) * c * 2 * 2          # dk block out
                + rate * rate * (kr + 2) * (ws + 2) * c * 2 * 2  # dv blocks
                + 2 * bq * 128 * 4 * 2)          # lse + delta in
    return maps + gwin + trans + max(dq_side, dkv_side)


def bwd_plan(hs: int, ws: int, c: int, rate: int,
             ksize: int = 3) -> tuple[int, int] | None:
    """(qr, kr) row-groups for the backward kernels, or None if the
    two-map-resident plan does not fit the VMEM budget (callers fall back
    to the materialized backward)."""
    if (qr := _lcm(128, ws) // ws) > hs or hs % qr:
        return None
    mult = hs // qr
    while mult >= 1:
        kr = qr * mult
        if hs % kr == 0 and (_bwd_vmem_bytes(hs, ws, c, rate, qr, kr, ksize)
                             <= _fa._VMEM_BUDGET_BYTES):
            return qr, kr
        mult //= 2
    return None


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _embed(tap, off_r: int, off_c: int, rows: int, cols: int):
    """Zero-embed a (h, w, C) tile at offset (off_r, off_c) of (rows, cols):
    concat-padding only — no offset stores."""
    h, w, c = tap.shape
    parts = []
    if off_c:
        parts.append(jnp.zeros((h, off_c, c), tap.dtype))
    parts.append(tap)
    if cols - off_c - w:
        parts.append(jnp.zeros((h, cols - off_c - w, c), tap.dtype))
    t = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    parts = []
    if off_r:
        parts.append(jnp.zeros((off_r, cols, c), t.dtype))
    parts.append(t)
    if rows - off_r - h:
        parts.append(jnp.zeros((rows - off_r - h, cols, c), t.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _v_tap_geometry(rate: int):
    """(vp, vq) → (parity_p, parity_q, off_p, off_q) per value tap."""
    half = rate // 2
    geo = []
    for vp in range(2 * rate):
        for vq in range(2 * rate):
            geo.append(((vp - half) % rate, (vq - half) % rate,
                        (vp - half) // rate + 1, (vq - half) // rate + 1))
    return geo


def _bwd_dq_kernel(bias_ref, rnorm_ref, lse_ref, o_ref, s2d_ref, g2d_ref,
                   dqb_ref, delta_ref, dq_scr,
                   *, scale: float, nk: int, qr: int, kr: int,
                   ws: int, c: int, ksize: int, rate: int):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    bq = qr * ws
    bk = kr * ws
    geo = _v_tap_geometry(rate)

    def do_tile(tap):
        # g2d_ref is the streamed per-row-group halo window: rows are
        # BLOCK-relative (row 0 ↔ padded-map row iq·qr)
        pp, pq, op, oq = geo[tap]
        return g2d_ref[0, pp, pq, pl.ds(op, qr),
                       pl.ds(oq, ws), :].reshape(bq, c)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)
        # δ_i = <do_i, o_i>, accumulated tap-by-tap (o is saved tap-major)
        d = jnp.zeros((bq, 1), jnp.float32)
        for tap in range(len(geo)):
            d += jnp.sum(do_tile(tap).astype(jnp.float32)
                         * o_ref[0, tap].astype(jnp.float32),
                         axis=1, keepdims=True)
        delta_ref[0] = jnp.broadcast_to(d, (bq, 128))

    # rebuild raw scores u for this (q, k) tile pair
    u = jnp.zeros((bq, bk), jnp.float32)
    for dp in range(ksize):
        for dq_ in range(ksize):
            qp = s2d_ref[0, 0, 0, pl.ds(iq * qr + dp, qr),
                         pl.ds(dq_, ws), :].reshape(bq, c)
            kp = s2d_ref[0, 0, 0, pl.ds(ik * kr + dp, kr),
                         pl.ds(dq_, ws), :].reshape(bk, c)
            u += jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    bias = bias_ref[0]                           # (1, bk)
    rnorm = rnorm_ref[0]                         # (1, bk)
    s = u * (rnorm * scale) + bias
    p = jnp.exp(s - lse_ref[0][:, :1])           # already normalized
    p = p * (bias >= 0.0)

    dp_acc = jnp.zeros((bq, bk), jnp.float32)
    for tap in range(len(geo)):
        pp, pq, op, oq = geo[tap]
        vt = s2d_ref[0, pp, pq, pl.ds(ik * kr + op, kr),
                     pl.ds(oq, ws), :].reshape(bk, c)
        dp_acc += jax.lax.dot_general(
            do_tile(tap), vt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    ds = p * (dp_acc - delta_ref[0][:, :1])
    dsr = ds * (rnorm * scale)
    for dp in range(ksize):
        for dq_ in range(ksize):
            kp = s2d_ref[0, 0, 0, pl.ds(ik * kr + dp, kr),
                         pl.ds(dq_, ws), :].reshape(bk, c)
            t = dp * ksize + dq_
            dq_scr[t] += jax.lax.dot_general(
                dsr, kp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finish():
        blk = jnp.zeros((qr + 2, ws + 2, c), jnp.float32)
        for dp in range(ksize):
            for dq_ in range(ksize):
                tap = dq_scr[dp * ksize + dq_].reshape(qr, ws, c)
                blk += _embed(tap, dp, dq_, qr + 2, ws + 2)
        dqb_ref[0, 0] = blk.astype(dqb_ref.dtype)


def _bwd_dkv_kernel(bias_ref, rnorm_ref, lse_ref, delta_ref,
                    s2d_ref, g2d_ref,
                    dkb_ref, dvb_ref, tnorm_ref, dk_scr, dv_scr, tn_scr,
                    *, scale: float, nq: int, qr: int, kr: int,
                    ws: int, c: int, ksize: int, rate: int):
    ik = pl.program_id(1)
    iq = pl.program_id(2)
    bq = qr * ws
    bk = kr * ws
    geo = _v_tap_geometry(rate)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)
        tn_scr[:] = jnp.zeros_like(tn_scr)

    u = jnp.zeros((bq, bk), jnp.float32)
    for dp in range(ksize):
        for dq_ in range(ksize):
            qp = s2d_ref[0, 0, 0, pl.ds(iq * qr + dp, qr),
                         pl.ds(dq_, ws), :].reshape(bq, c)
            kp = s2d_ref[0, 0, 0, pl.ds(ik * kr + dp, kr),
                         pl.ds(dq_, ws), :].reshape(bk, c)
            u += jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    bias = bias_ref[0]
    rnorm = rnorm_ref[0]
    s = u * (rnorm * scale) + bias
    p = jnp.exp(s - lse_ref[0][:, :1])
    p = p * (bias >= 0.0)

    dp_acc = jnp.zeros((bq, bk), jnp.float32)
    for tap in range(len(geo)):
        pp, pq, op, oq = geo[tap]
        do_t = g2d_ref[0, pp, pq, pl.ds(op, qr),
                       pl.ds(oq, ws), :].reshape(bq, c)
        # dV: Σ_i p_ij · do_i, per tap
        dv_scr[tap] += jax.lax.dot_general(
            p.astype(do_t.dtype), do_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        vt = s2d_ref[0, pp, pq, pl.ds(ik * kr + op, kr),
                     pl.ds(oq, ws), :].reshape(bk, c)
        dp_acc += jax.lax.dot_general(
            do_t, vt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    ds = p * (dp_acc - delta_ref[0][:, :1])      # ds⁰ (normalized-p form)
    # per-key scalar for the rnorm correction, applied in the XLA epilogue
    tn_scr[:1] += jnp.sum(ds * u, axis=0, keepdims=True)

    dsr = ds * (rnorm * scale)
    for dp in range(ksize):
        for dq_ in range(ksize):
            qp = s2d_ref[0, 0, 0, pl.ds(iq * qr + dp, qr),
                         pl.ds(dq_, ws), :].reshape(bq, c)
            t = dp * ksize + dq_
            dk_scr[t] += jax.lax.dot_general(
                dsr, qp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _finish():
        blk = jnp.zeros((kr + 2, ws + 2, c), jnp.float32)
        for dp in range(ksize):
            for dq_ in range(ksize):
                tap = dk_scr[dp * ksize + dq_].reshape(kr, ws, c)
                blk += _embed(tap, dp, dq_, kr + 2, ws + 2)
        dkb_ref[0, 0] = blk.astype(dkb_ref.dtype)

        for pp in range(rate):
            for pq in range(rate):
                plane = jnp.zeros((kr + 2, ws + 2, c), jnp.float32)
                for tap, (gp, gq, op, oq) in enumerate(geo):
                    if gp == pp and gq == pq:
                        tv = dv_scr[tap].reshape(kr, ws, c)
                        plane += _embed(tv, op, oq, kr + 2, ws + 2)
                dvb_ref[0, 0, pp, pq] = plane.astype(dvb_ref.dtype)

        tnorm_ref[0] = tn_scr[:1]


# ---------------------------------------------------------------------------
# XLA epilogue helpers
# ---------------------------------------------------------------------------


def _merge_row_blocks(blocks):
    """Overlap-add (B, n, step+2, W2, C) halo row blocks — block i covers
    padded-map rows i·step .. i·step+step+1 — into (B, n·step+2, W2, C)."""
    b, n, s2, w2, c = blocks.shape
    step = s2 - 2
    if n == 1:
        return blocks[:, 0]
    bodies = blocks[:, :, 1:step + 1]
    # bottom halo of block i (global row (i+1)·step+1) = body (i+1, 0);
    # top halo of block i (global row i·step) = body (i-1, step-1)
    bodies = bodies.at[:, 1:, 0].add(blocks[:, :-1, step + 1])
    bodies = bodies.at[:, :-1, step - 1].add(blocks[:, 1:, 0])
    mid = bodies.reshape(b, n * step, w2, c)
    return jnp.concatenate(
        [blocks[:, 0, :1], mid, blocks[:, -1, step + 1:]], axis=1)


def _norm_correction(b_s_pad, cmap, ksize: int):
    """Σ_j c_j · (ksize² patch of b_s at j), folded back to the padded map:
    nine shifted map-sized multiply-adds — no patch tensor."""
    bsz, h2, w2, c = b_s_pad.shape
    hs, ws = h2 - 2, w2 - 2
    out = jnp.zeros_like(b_s_pad, dtype=jnp.float32)
    bsf = b_s_pad.astype(jnp.float32)
    for dp in range(ksize):
        for dq_ in range(ksize):
            out = out.at[:, dp:dp + hs, dq_:dq_ + ws, :].add(
                cmap * bsf[:, dp:dp + hs, dq_:dq_ + ws, :])
    return out


# ---------------------------------------------------------------------------
# Entry
# ---------------------------------------------------------------------------


def fused_folded_bwd_inkernel(b_feat, hole_mask, ksize: int, rate: int,
                              scale: float, o_taps, lse, g):
    """d(fold(fused_attention))/d b_feat without Q/K/V patch tensors.

    Args:
      b_feat: (B, H, W, C) forward feature map (residual).
      o_taps: (B, 4r², Lq, C) tap-major forward output (residual).
      lse: (B, Lq) f32 per-query logsumexp (residual).
      g: (B, H, W, C) upstream gradient of the folded output.
    """
    from gan_inpainting_tpu.ops.patches import fold_patches

    bsz, h, w, c = b_feat.shape
    s2d_pad, bias, rnorm, knorm, (hs, ws) = _prepare(
        b_feat, hole_mask, ksize, rate)
    qr, kr = bwd_plan(hs, ws, c, rate, ksize)
    nq, nk = hs // qr, hs // kr
    lq = hs * ws
    taps = 4 * rate * rate

    # fold adjoint: dy/cnt, decomposed into the same parity-map layout
    _, cnt = fold_patches(
        jnp.ones((1, hs, ws, 2 * rate, 2 * rate, 1), jnp.float32),
        rate, (h, w), "same")
    dyn = (g.astype(jnp.float32)
           / jnp.maximum(cnt, 1.0)[None]).astype(b_feat.dtype)
    g2d = dyn.reshape(bsz, hs, rate, ws, rate, c).transpose(0, 2, 4, 1, 3, 5)
    g2d_pad = jnp.pad(g2d, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))

    lse128 = jnp.broadcast_to(lse[..., None], (bsz, lq, 128)).astype(
        jnp.float32)

    maps_spec = pl.BlockSpec(
        (1, rate, rate, hs + 2, ws + 2, c),
        lambda b_, i, j: (b_, 0, 0, 0, 0, 0),
        pipeline_mode=pl.Buffered(buffer_count=1),
        memory_space=pltpu.VMEM)

    # the gradient maps stream one halo row-group window per query block —
    # overlapping all-Element windows, NOT a second resident operand (VMEM:
    # the flagship c=192 shape can't hold two resident map sets)
    def gwin_spec(index_map):
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(rate), pl.Element(rate),
             pl.Element(qr + 2), pl.Element(ws + 2), pl.Element(c)),
            index_map,
            memory_space=pltpu.VMEM)

    row_spec = pl.BlockSpec((1, 1, kr * ws), lambda b_, i, j: (b_, 0, j),
                            memory_space=pltpu.VMEM)
    # dq grid is (b, nq, nk): lse/o stream by iq, bias/rnorm by ik
    dq_blocks, delta = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, nk=nk, qr=qr, kr=kr,
                          ws=ws, c=c, ksize=ksize, rate=rate),
        grid=(bsz, nq, nk),
        in_specs=[
            row_spec,
            row_spec,
            pl.BlockSpec((1, qr * ws, 128), lambda b_, i, j: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, taps, qr * ws, c),
                         lambda b_, i, j: (b_, 0, i, 0),
                         memory_space=pltpu.VMEM),
            maps_spec,
            gwin_spec(lambda b_, i, j: (b_, 0, 0, i * qr, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, qr + 2, ws + 2, c),
                         lambda b_, i, j: (b_, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qr * ws, 128), lambda b_, i, j: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nq, qr + 2, ws + 2, c), b_feat.dtype),
            jax.ShapeDtypeStruct((bsz, lq, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ksize * ksize, qr * ws, c), jnp.float32),
        ],
    )(bias[:, None, :], rnorm[:, None, :], lse128, o_taps, s2d_pad, g2d_pad)

    # dkv grid is (b, nk, nq): bias/rnorm stream by ik (axis 1), lse/delta
    # by iq (axis 2)
    kcol_spec = pl.BlockSpec((1, 1, kr * ws), lambda b_, i, j: (b_, 0, i),
                             memory_space=pltpu.VMEM)
    qrow_spec = pl.BlockSpec((1, qr * ws, 128), lambda b_, i, j: (b_, j, 0),
                             memory_space=pltpu.VMEM)
    dk_blocks, dv_blocks, tnorm = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, nq=nq, qr=qr, kr=kr,
                          ws=ws, c=c, ksize=ksize, rate=rate),
        grid=(bsz, nk, nq),
        in_specs=[
            kcol_spec,
            kcol_spec,
            qrow_spec,
            qrow_spec,
            maps_spec,
            gwin_spec(lambda b_, i, j: (b_, 0, 0, j * qr, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kr + 2, ws + 2, c),
                         lambda b_, i, j: (b_, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rate, rate, kr + 2, ws + 2, c),
                         lambda b_, i, j: (b_, i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kr * ws), lambda b_, i, j: (b_, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nk, kr + 2, ws + 2, c), b_feat.dtype),
            jax.ShapeDtypeStruct((bsz, nk, rate, rate, kr + 2, ws + 2, c),
                                 b_feat.dtype),
            jax.ShapeDtypeStruct((bsz, 1, lq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ksize * ksize, kr * ws, c), jnp.float32),
            pltpu.VMEM((taps, kr * ws, c), jnp.float32),
            pltpu.VMEM((8, kr * ws), jnp.float32),
        ],
    )(bias[:, None, :], rnorm[:, None, :], lse128, delta, s2d_pad, g2d_pad)

    # ---- XLA epilogue: halo merges + rnorm correction + inverse parity ----
    dbs_q = _merge_row_blocks(dq_blocks.astype(jnp.float32))
    dbs_k = _merge_row_blocks(dk_blocks.astype(jnp.float32))

    coef = jnp.where(knorm > 1e-4, rnorm * rnorm / knorm, 0.0)
    cmap = ((-scale) * tnorm[:, 0] * coef).reshape(bsz, hs, ws, 1)
    corr = _norm_correction(s2d_pad[:, 0, 0], cmap, ksize)

    dvb = dv_blocks.astype(jnp.float32).transpose(0, 2, 3, 1, 4, 5, 6)
    dvb = dvb.reshape(bsz * rate * rate, nk, kr + 2, ws + 2, c)
    d_s2d = _merge_row_blocks(dvb).reshape(
        bsz, rate, rate, hs + 2, ws + 2, c)

    d_s2d = d_s2d.at[:, 0, 0].add(dbs_q + dbs_k + corr)
    # adjoint of the zero halo pad is a crop; then invert the parity
    # space-to-depth transpose back to (B, H, W, C)
    dcrop = d_s2d[:, :, :, 1:hs + 1, 1:ws + 1, :]
    db_feat = dcrop.transpose(0, 3, 1, 4, 2, 5).reshape(bsz, h, w, c)
    return db_feat.astype(b_feat.dtype)
