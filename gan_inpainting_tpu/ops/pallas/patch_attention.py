"""Blockwise (flash-style) patch attention — the Pallas centerpiece.

Contextual attention's score matrix is the framework's memory hot spot: at
512² the refinement stage matches Lq = Lk = 4096 patch tokens of dimension
d = 9·C with value patches of dv = 16·C — a dense (Lq, Lk) softmax per image
(SURVEY.md §5 "long-context analogue"). This kernel computes

    out[q] = Σ_k softmax_k(scale · q·k + bias_k) · v[k]      (bias −inf for
                                                              hole keys)

with the FlashAttention running-softmax recurrence: K/V stream through VMEM
in tiles, an f32 accumulator + running (max, denominator) live in scratch,
and the (Lq, Lk) matrix never exists in HBM.

Differences from token attention, all handled here:
* keys can be *invalid* (patch overlaps the hole). Invalid keys are excluded
  multiplicatively (p *= valid) so the denominator counts only valid keys,
  and an all-invalid row yields exactly 0 — matching the XLA fallback
  (ops/contextual_attention.py) bit-for-bit in semantics.
* no causal structure: every (q, k) tile pair is visited.

Backward pass: standard flash backward split into a dQ kernel (grid over Q
tiles, streaming K/V) and a dK/dV kernel (grid over K tiles, streaming Q),
recomputing P from the saved per-row logsumexp. Wired up via jax.custom_vjp,
so the same kernel serves training and serving.

Equivalence vs the XLA path is pytest-gated in interpreter mode
(tests/kernels/) and on real TPU via the bench entry points (SURVEY.md §4
"kernel equivalence").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
_INIT_M = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_to(x, multiple: int, axis: int, value=0.0):
    size = x.shape[axis]
    pad = _cdiv(size, multiple) * multiple - size
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                acc_scr, m_scr, l_scr, *, scale: float, nk: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        m_scr[:] = jnp.full_like(m_scr, _INIT_M)
        l_scr[:] = jnp.zeros_like(l_scr)

    q = q_ref[0]                                   # (BQ, d)
    k = k_ref[0]                                   # (BK, d)
    bias = bias_ref[0]                             # (1, BK) f32, 0 or NEG_INF
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # (BQ, BK)
    s = s * scale + bias

    m_prev = m_scr[:, :1]                          # (BQ, 1)
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)                # (BQ, 1)
    p = jnp.exp(s - m_new)
    p = p * (bias >= 0.0)                          # drop invalid keys exactly
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (BQ, dv)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        inv = jnp.where(l > 0.0, 1.0 / jnp.maximum(l, 1e-30), 0.0)
        o_ref[0] = (acc_scr[:] * inv).astype(o_ref.dtype)
        # logsumexp for the backward pass. All-invalid rows emit lse = 0.0,
        # NOT _INIT_M: the bwd kernels compute p = exp(s - lse), and
        # s ≈ NEG_INF for every invalid key, so lse = 0 gives p = 0 and
        # exactly-zero gradients (matching the XLA path), whereas
        # lse = -1e30 gives p = exp(+1e30) = inf → NaN poisoning dq/dk/dv.
        lse = jnp.where(l > 0.0,
                        m_scr[:, :1] + jnp.log(jnp.maximum(l, 1e-30)),
                        0.0)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _fwd_call(q, k, bias, v, *, scale: float, block_q: int, block_k: int):
    b, lq, d = q.shape
    _, lk, dv = v.shape
    nq, nk = lq // block_q, lk // block_k
    grid = (b, nq, nk)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda b_, iq, ik: (b_, 0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b_, iq, ik: (b_, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, iq, ik: (b_, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv), lambda b_, iq, ik: (b_, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dv), lambda b_, iq, ik: (b_, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b_, iq, ik: (b_, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq, dv), v.dtype),
            jax.ShapeDtypeStruct((b, lq, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, dv), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )(bias[:, None, :], q, k, v)
    return out, lse[:, :, 0]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(bias_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, dq_scr, *, scale: float, nk: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    bias = bias_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale + bias
    p = jnp.exp(s - lse_ref[0][:, :1])
    p = p * (bias >= 0.0)                          # (BQ, BK)

    dp = jax.lax.dot_general(
        do_ref[0].astype(jnp.float32), v_ref[0].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0][:, :1]) * scale    # (BQ, BK)
    dq_scr[:] += jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(bias_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                    delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale: float, nq: int):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]                                   # (BQ, d)
    k = k_ref[0]                                   # (BK, d)
    bias = bias_ref[0]                             # (1, BK)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale + bias
    p = jnp.exp(s - lse_ref[0][:, :1])
    p = p * (bias >= 0.0)                          # (BQ, BK)

    do = do_ref[0].astype(jnp.float32)             # (BQ, dv)
    dv_scr[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (BK, dv)

    dp = jax.lax.dot_general(do, v_ref[0].astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0][:, :1]) * scale    # (BQ, BK)
    dk_scr[:] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (BK, d)

    @pl.when(iq == nq - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_call(res, g, *, scale: float, block_q: int, block_k: int):
    q, k, bias, v, out, lse = res
    b, lq, d = q.shape
    _, lk, dv = v.shape
    nq, nk = lq // block_q, lk // block_k

    # delta_i = rowsum(dO * O) in f32, broadcast to 128 lanes for the kernels
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta128 = jnp.broadcast_to(delta[..., None], (b, lq, 128))
    lse128 = jnp.broadcast_to(lse[..., None], (b, lq, 128))
    bias3 = bias[:, None, :]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, nk=nk),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda b_, iq, ik: (b_, 0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b_, iq, ik: (b_, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, iq, ik: (b_, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv), lambda b_, iq, ik: (b_, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dv), lambda b_, iq, ik: (b_, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b_, iq, ik: (b_, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b_, iq, ik: (b_, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda b_, iq, ik: (b_, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )(bias3, q, k, v, g, lse128, delta128)

    dk, dv_out = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, nq=nq),
        grid=(b, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda b_, ik, iq: (b_, 0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b_, ik, iq: (b_, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, ik, iq: (b_, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv), lambda b_, ik, iq: (b_, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dv), lambda b_, ik, iq: (b_, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b_, ik, iq: (b_, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda b_, ik, iq: (b_, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b_, ik, iq: (b_, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv), lambda b_, ik, iq: (b_, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lk, d), k.dtype),
            jax.ShapeDtypeStruct((b, lk, dv), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, dv), jnp.float32),
        ],
    )(bias3, q, k, v, g, lse128, delta128)

    return dq, dk, dv_out


# ---------------------------------------------------------------------------
# Public entry (padding + custom VJP)
# ---------------------------------------------------------------------------

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _default_blocks(lq: int, lk: int, d: int, dv: int) -> tuple[int, int]:
    """K/V stream once per q-tile, so bigger q blocks cut HBM traffic
    proportionally; the f32 accumulator (block_q × dv) caps the growth."""
    block_q = DEFAULT_BLOCK_Q
    for cand in (512, 256):
        if cand * dv * 4 + cand * max(d, 128) * 4 <= 6 * 1024 * 1024:
            block_q = cand
            break
    return block_q, DEFAULT_BLOCK_K


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attend(q, k, bias, v, scale, block_q, block_k):
    out, _ = _fwd_call(q, k, bias, v, scale=scale, block_q=block_q,
                       block_k=block_k)
    return out


def _attend_fwd(q, k, bias, v, scale, block_q, block_k):
    out, lse = _fwd_call(q, k, bias, v, scale=scale, block_q=block_q,
                         block_k=block_k)
    return out, (q, k, bias, v, out, lse)


def _attend_bwd(scale, block_q, block_k, res, g):
    dq, dk, dv = _bwd_call(res, g, scale=scale, block_q=block_q,
                           block_k=block_k)
    dbias = jnp.zeros_like(res[2])  # validity bias is not trained
    return dq, dk, dbias, dv


_attend.defvjp(_attend_fwd, _attend_bwd)


def patch_attention_pallas(q, k, key_valid, v, *, softmax_scale: float,
                           block_q: int | None = None,
                           block_k: int | None = None,
                           interpret: bool = False):
    """Blockwise patch attention.

    Args:
      q: (B, Lq, d) query patches
      k: (B, Lk, d) normalized key patches
      key_valid: (B, Lk) bool — False keys are excluded
      v: (B, Lk, dv) value patches

    Returns:
      (B, Lq, dv) attended values; rows with no valid key are exactly 0.
    """
    del interpret  # interpreter mode flows through force_tpu_interpret_mode
    b, lq, d = q.shape
    _, lk, dv = v.shape
    auto_q, auto_k = _default_blocks(lq, lk, d, dv)
    block_q = block_q or auto_q
    block_k = block_k or auto_k
    bias = jnp.where(key_valid, 0.0, NEG_INF).astype(jnp.float32)

    qp = _pad_to(q, block_q, axis=1)
    kp = _pad_to(k, block_k, axis=1)
    vp = _pad_to(v, block_k, axis=1)
    biasp = _pad_to(bias, block_k, axis=1, value=NEG_INF)

    out = _attend(qp, kp, biasp, vp, float(softmax_scale), block_q, block_k)
    return out[:, :lq, :]
