"""Pallas TPU kernels for gated and partial convolutions (reference R5/R6).

Gated conv (BASELINE.json:5 "gated/partial convolutions ... written as
Pallas kernels"): the conv is lowered to an im2col matmul whose full epilogue
— bias add, feature activation, sigmoid gate, product — runs fused in one
kernel, so the 2F-channel pre-activation tensor never exists in HBM:

    Y[m, n] = act(X[m, :]·Wf[:, n] + bf[n]) * sigmoid(X[m, :]·Wg[:, n] + bg[n])

Grid is (M-tiles, N-tiles, K-tiles) with two f32 accumulators in VMEM
scratch; the epilogue fires on the last K tile. Gradients flow through a
custom VJP that recomputes with the XLA composition (ops/gated_conv.py) —
identical math, so training and serving agree.

Partial conv: the conv itself stays an XLA conv (MXU-native); the epilogue
(renormalize by window counts, bias, zero-fill, mask update) is one fused
VPU kernel emitting both outputs in a single pass over the activation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_axis(x, multiple: int, axis: int):
    size = x.shape[axis]
    pad = _cdiv(size, multiple) * multiple - size
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# im2col (stride + dilation aware)
# ---------------------------------------------------------------------------


def _im2col(x, window: int, stride: int, dilation: int):
    """(B, H, W, C) → (B, Ho, Wo, window*window*C) with SAME padding."""
    b, h, w, c = x.shape
    eff = (window - 1) * dilation + 1
    ho, wo = _cdiv(h, stride), _cdiv(w, stride)

    def pads(size, out):
        total = max((out - 1) * stride + eff - size, 0)
        return total // 2, total - total // 2

    ph, pw = pads(h, ho), pads(w, wo)
    xp = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
    cols = []
    for p in range(window):
        for q in range(window):
            r0, c0 = p * dilation, q * dilation
            sl = xp[:, r0:r0 + (ho - 1) * stride + 1:stride,
                    c0:c0 + (wo - 1) * stride + 1:stride, :]
            cols.append(sl)
    return jnp.concatenate(cols, axis=-1), (ho, wo)


# ---------------------------------------------------------------------------
# Fused gated matmul kernel
# ---------------------------------------------------------------------------


def _gated_matmul_kernel(x_ref, wf_ref, wg_ref, bf_ref, bg_ref, o_ref,
                         accf, accg, *, nk: int, activation: str):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        accf[:] = jnp.zeros_like(accf)
        accg[:] = jnp.zeros_like(accg)

    x = x_ref[:]
    accf[:] += jax.lax.dot_general(
        x, wf_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    accg[:] += jax.lax.dot_general(
        x, wg_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _epilogue():
        a = accf[:] + bf_ref[0]
        g = accg[:] + bg_ref[0]
        # activations written with exp/where only: Mosaic's TC lowering has
        # no expm1/logistic primitives (observed on v5e, jax 0.9)
        if activation == "elu":
            f = jnp.where(a > 0.0, a, jnp.exp(jnp.minimum(a, 0.0)) - 1.0)
        elif activation == "relu":
            f = jnp.maximum(a, 0.0)
        elif activation == "leaky_relu":
            f = jnp.where(a > 0.0, a, 0.2 * a)
        elif activation == "tanh":
            f = jnp.tanh(a)
        else:  # "none"
            f = a
        sig = 1.0 / (1.0 + jnp.exp(-g))
        o_ref[:] = (f * sig).astype(o_ref.dtype)


def _gated_matmul(x2d, wf, wg, bf, bg, *, activation: str,
                  block_m: int = 256, block_n: int = 128,
                  block_k: int = 512):
    """x2d: (M, K) @ wf/wg: (K, N) with fused gate epilogue → (M, N)."""
    m, kdim = x2d.shape
    n = wf.shape[1]
    block_k = min(block_k, _cdiv(kdim, 128) * 128)
    block_n = min(block_n, _cdiv(n, 128) * 128)
    block_m = min(block_m, _cdiv(m, 8) * 8)

    xp = _pad_axis(_pad_axis(x2d, block_m, 0), block_k, 1)
    wfp = _pad_axis(_pad_axis(wf, block_k, 0), block_n, 1)
    wgp = _pad_axis(_pad_axis(wg, block_k, 0), block_n, 1)
    bfp = _pad_axis(bf[None, :], block_n, 1)
    bgp = _pad_axis(bg[None, :], block_n, 1)

    mp, kp = xp.shape
    np_ = wfp.shape[1]
    grid = (mp // block_m, np_ // block_n, kp // block_k)

    out = pl.pallas_call(
        functools.partial(_gated_matmul_kernel, nk=grid[2],
                          activation=activation),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k_: (i, k_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k_: (k_, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k_: (k_, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, k_: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, k_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k_: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, block_n), jnp.float32),
            pltpu.VMEM((block_m, block_n), jnp.float32),
        ],
    )(xp, wfp, wgp, bfp, bgp)
    return out[:m, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gated_conv_fused(x, kernel, bias, stride, dilation, activation):
    window, _, cin, cout2 = kernel.shape
    features = cout2 // 2
    x2d, (ho, wo) = _im2col(x, window, stride, dilation)
    b = x.shape[0]
    x2d = x2d.reshape(b * ho * wo, window * window * cin)
    w2d = kernel.reshape(window * window * cin, cout2).astype(x.dtype)
    wf, wg = w2d[:, :features], w2d[:, features:]
    bf = bias[:features].astype(jnp.float32)
    bg = bias[features:].astype(jnp.float32)
    y = _gated_matmul(x2d, wf, wg, bf, bg, activation=activation)
    return y.reshape(b, ho, wo, features)


def _gated_conv_fused_fwd(x, kernel, bias, stride, dilation, activation):
    y = _gated_conv_fused(x, kernel, bias, stride, dilation, activation)
    return y, (x, kernel, bias)


def _gated_conv_fused_bwd(stride, dilation, activation, res, g):
    # same math as the kernel — gradients via the XLA composition
    from gan_inpainting_tpu.ops.gated_conv import gated_conv_xla

    x, kernel, bias = res
    _, vjp = jax.vjp(
        lambda x_, k_, b_: gated_conv_xla(
            x_, k_, b_, stride=stride, dilation=dilation,
            activation=activation),
        x, kernel, bias)
    return vjp(g)


_gated_conv_fused.defvjp(_gated_conv_fused_fwd, _gated_conv_fused_bwd)


def gated_conv_pallas(x, kernel, bias, *, stride: int = 1,
                      dilation: int = 1, activation: str = "elu"):
    """Fused im2col gated conv. Shapes as ops.gated_conv."""
    return _gated_conv_fused(x, kernel, bias, stride, dilation, activation)


# ---------------------------------------------------------------------------
# Partial conv epilogue kernel
# ---------------------------------------------------------------------------


def _partial_epilogue_kernel(raw_ref, cnt_ref, bias_ref, y_ref, valid_ref,
                             *, window_area: float):
    raw = raw_ref[:].astype(jnp.float32)          # (BM, C)
    cnt = cnt_ref[:, :1]                          # (BM, 1) f32
    any_valid = cnt > 0.0
    scale = jnp.where(any_valid, window_area / jnp.maximum(cnt, 1.0), 0.0)
    y = raw * scale + bias_ref[0]
    y = jnp.where(any_valid, y, 0.0)
    y_ref[:] = y.astype(y_ref.dtype)
    valid_ref[:] = jnp.broadcast_to(
        any_valid.astype(valid_ref.dtype), valid_ref.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def partial_conv_epilogue_pallas(raw, counts, bias, window: int):
    """Fused renormalize+bias+zero-fill+mask-update.

    raw: (B, Ho, Wo, C) conv output; counts: (B, Ho, Wo, 1).
    Returns (y, valid_out) matching partial_conv_epilogue_xla.
    """
    return _partial_epilogue_call(raw, counts, bias, window)


def _partial_epilogue_fwd(raw, counts, bias, window):
    return _partial_epilogue_call(raw, counts, bias, window), (raw, counts,
                                                               bias)


def _partial_epilogue_bwd(window, res, g):
    from gan_inpainting_tpu.ops.partial_conv import partial_conv_epilogue_xla

    raw, counts, bias = res
    _, vjp = jax.vjp(
        lambda r, c, b_: partial_conv_epilogue_xla(r, c, b_, window),
        raw, counts, bias)
    return vjp(g)


def _partial_epilogue_call(raw, counts, bias, window: int,
                           block_m: int = 1024):
    b, ho, wo, c = raw.shape
    m = b * ho * wo
    raw2 = raw.reshape(m, c)
    cnt2 = jnp.broadcast_to(counts.reshape(m, 1), (m, 128))
    block_m = min(block_m, _cdiv(m, 8) * 8)

    raw2 = _pad_axis(_pad_axis(raw2, block_m, 0), 128, 1)
    cnt2 = _pad_axis(cnt2, block_m, 0)
    bias2 = _pad_axis(bias.astype(jnp.float32)[None, :], 128, 1)
    mp, cp = raw2.shape
    grid = (mp // block_m,)

    y, valid = pl.pallas_call(
        functools.partial(_partial_epilogue_kernel,
                          window_area=float(window * window)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, cp), raw.dtype),
            jax.ShapeDtypeStruct((mp, 128), raw.dtype),
        ],
    )(raw2, cnt2, bias2)

    y = y[:m, :c].reshape(b, ho, wo, c)
    valid_out = valid[:m, :1].reshape(b, ho, wo, 1)
    return y, valid_out


partial_conv_epilogue_pallas.defvjp(_partial_epilogue_fwd,
                                    _partial_epilogue_bwd)
