"""Implicit-GEMM gated convolution (VERDICT r1 next #4).

The round-1 Pallas gated conv (fused_matmul.py) im2cols in HBM — a k²×
activation blow-up that loses to XLA at every flagship shape. This kernel
keeps the *input rows* resident instead, exactly like the fused attention
kernel keeps feature maps resident: the grid walks row-groups of the output,
each step's BlockSpec window is the row-group plus a dilation-sized halo
(``pl.Element`` start offsets — windows overlap, no HBM duplication), and
the k² patch contractions are built in VMEM as k² accumulated
(RG·W, Cin) × (Cin, F) MXU matmuls. The full gated epilogue — bias,
activation, sigmoid gate, product — runs on the f32 accumulators before the
single (RG, W, F) output block is written, so the 2F-channel pre-activation
never exists in HBM either.

Supports stride 1, any dilation, odd k (the generator's dominant conv form:
every non-encoder conv in models/generator.py). Stride-2 encoder convs fall
back to XLA (strided sublane slicing inside the kernel would relayout every
tap). Gradients: custom VJP recomputes through the XLA composition — the
house pattern (fused_matmul.py, SURVEY.md §4 kernel equivalence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


def _act(name: str):
    # Mosaic-lowerable forms only: jax.nn.elu uses expm1, which has no
    # Pallas TPU lowering — the exp(x)-1 form is equivalent (negative-side
    # exp(x) < 1, so no catastrophic cancellation in f32 accumulators)
    return {
        "elu": lambda x: jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0))
                                   - 1.0),
        "relu": lambda x: jnp.maximum(x, 0.0),
        "leaky_relu": lambda x: jnp.where(x > 0, x, 0.2 * x),
        "none": lambda x: x,
        "tanh": jnp.tanh,
    }[name]


def _kernel(x_ref, wf_ref, wg_ref, b_ref, o_ref, *, rg: int, wo: int,
            k: int, dil: int, cf: int, activation: str):
    # x_ref: (1, rg+halo, wo+halo, cin) — all-Element overlapping window
    cin = x_ref.shape[-1]
    accf = jnp.zeros((rg * wo, cf), jnp.float32)
    accg = jnp.zeros((rg * wo, cf), jnp.float32)
    for dp in range(k):
        for dq in range(k):
            xs = x_ref[0, pl.ds(dp * dil, rg), pl.ds(dq * dil, wo), :]
            xs = xs.reshape(rg * wo, cin)
            accf += jax.lax.dot_general(
                xs, wf_ref[dp, dq], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            accg += jax.lax.dot_general(
                xs, wg_ref[dp, dq], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    accf += b_ref[0, :cf]
    accg += b_ref[0, cf:]
    y = _act(activation)(accf) * jax.nn.sigmoid(accg)
    o_ref[:] = y.reshape(rg, wo, cf).astype(o_ref.dtype)


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_rg(h: int, w: int, cin: int, cf: int, k: int, dil: int,
             dtype_bytes: int = 2) -> int | None:
    """Largest row group whose VMEM footprint fits.

    VMEM stores (8, 128)-tiled buffers: the minor dim pads to 128 lanes and
    the second-minor to 8 sublanes — a C=48 activation occupies full
    128-lane tiles (ignoring this overflowed scoped vmem by exactly that
    ratio on v5e).
    """
    halo = (k - 1) * dil
    best = None
    rg = h
    while rg >= 1:
        if h % rg == 0:
            x_blk = (rg + halo) * _rup(w + halo, 8) * _rup(cin, 128) \
                * dtype_bytes * 2
            acc = 2 * _rup(rg * w, 8) * _rup(cf, 128) * 4
            out = rg * _rup(w, 8) * _rup(cf, 128) * dtype_bytes * 2
            wgt = 2 * k * k * _rup(cin, 8) * _rup(cf, 128) * dtype_bytes
            if x_blk + acc + out + wgt <= _VMEM_BUDGET:
                best = rg
                # prefer at least 8 sublanes of output rows but stop growing
                # once the row-group spans 256 output rows (diminishing
                # returns, ballooning accumulators)
                if rg * w >= 2048:
                    return rg
        rg //= 2
    return best


def direct_conv_supported(x_shape, k: int, stride: int, dilation: int,
                          features: int = 1) -> bool:
    """``features`` is the gated conv's F (= kernel.shape[-1] // 2).

    Pass the real value — the accumulator/output/weight footprints scale
    with it, and a cf=1 estimate can say "fits" for near-budget Cout>128
    shapes where gated_conv_direct then fails to find a row group
    (ADVICE r2 #2).
    """
    _, h, w, cin = x_shape
    if stride != 1 or k % 2 == 0:
        return False
    return _pick_rg(h, w, cin, features, k, dilation) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gated_direct(x, kernel, bias, dilation, activation, rg):
    b, h, w, cin = x.shape
    k = kernel.shape[0]
    cf = kernel.shape[-1] // 2
    dil = dilation
    halo = (k - 1) * dil
    pad = halo // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    wf = kernel[..., :cf]
    wg = kernel[..., cf:]
    bias2 = bias.astype(jnp.float32).reshape(1, 2 * cf)

    out = pl.pallas_call(
        functools.partial(_kernel, rg=rg, wo=w, k=k, dil=dil, cf=cf,
                          activation=activation),
        grid=(b, h // rg),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(rg + halo), pl.Element(w + halo),
                 pl.Element(cin)),
                lambda b_, i: (b_, i * rg, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, cin, cf), lambda b_, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, cin, cf), lambda b_, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * cf), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pl.Squeezed(), rg, w, cf),
                               lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cf), x.dtype),
    )(xp, wf, wg, bias2)
    return out


def _gated_direct_fwd(x, kernel, bias, dilation, activation, rg):
    return _gated_direct(x, kernel, bias, dilation, activation, rg), (
        x, kernel, bias)


def _gated_direct_bwd(dilation, activation, rg, res, g):
    from gan_inpainting_tpu.ops.gated_conv import gated_conv_xla

    x, kernel, bias = res

    def ref(x_, k_, b_):
        return gated_conv_xla(x_, k_, b_, stride=1, dilation=dilation,
                              activation=activation)

    _, vjp = jax.vjp(ref, x, kernel, bias)
    return vjp(g)


_gated_direct.defvjp(_gated_direct_fwd, _gated_direct_bwd)


def gated_conv_direct(x, kernel, bias, *, stride: int = 1, dilation: int = 1,
                      activation: str = "elu"):
    """Implicit-GEMM gated conv. Shapes as ops.gated_conv; stride must be 1.

    Check :func:`direct_conv_supported` first — unsupported forms should use
    the XLA composition.
    """
    if stride != 1:
        raise ValueError("gated_conv_direct supports stride=1 only")
    b, h, w, cin = x.shape
    k = kernel.shape[0]
    cf = kernel.shape[-1] // 2
    rg = _pick_rg(h, w, cin, cf, k, dilation)
    if rg is None:
        raise ValueError(f"no row group fits VMEM for shape {x.shape}")
    return _gated_direct(x, kernel, bias, dilation, activation, rg)
