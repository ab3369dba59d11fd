"""Gated convolution (reference R5; DeepFill-v2, Yu et al. ICCV'19).

``y = act(conv_f(x)) * sigmoid(conv_g(x))`` where conv_f/conv_g are one conv
producing 2*features channels, split down the middle.

Backends:
* xla    — one conv + split + elementwise. XLA fuses the epilogue into the
  conv already; this is the reference semantics and the equivalence oracle.
* pallas — the conv is lowered to an im2col matmul whose epilogue (bias,
  activation, gate) is fused in a single Pallas kernel so the 2F-channel
  pre-activation never round-trips to HBM (ops/pallas/fused_matmul.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_inpainting_tpu.ops.conv import conv2d
from gan_inpainting_tpu.ops.dispatch import resolve_backend


def _activation(name: str):
    return {
        "elu": jax.nn.elu,
        "relu": jax.nn.relu,
        "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.2),
        "none": lambda x: x,
        "tanh": jnp.tanh,
    }[name]


def gated_conv(x, kernel, bias, *, stride: int = 1, dilation: int = 1,
               activation: str = "elu", backend: str = "auto"):
    """Gated conv. kernel: (kh, kw, Cin, 2*F); returns (B, Ho, Wo, F)."""
    backend = resolve_backend(backend, op="gated_conv")
    if backend == "pallas":
        # prefer the implicit-GEMM kernel (no k² HBM expansion); fall back
        # to the im2col kernel for strided/odd forms. NOTE: auto never
        # routes here — both lose to XLA on TPU (see ops/dispatch.py).
        from gan_inpainting_tpu.ops.pallas.direct_conv import (
            direct_conv_supported,
            gated_conv_direct,
        )
        if stride == 1 and direct_conv_supported(
                x.shape, kernel.shape[0], stride, dilation,
                features=kernel.shape[-1] // 2):
            return gated_conv_direct(x, kernel, bias, dilation=dilation,
                                     activation=activation)
        from gan_inpainting_tpu.ops.pallas.fused_matmul import (
            gated_conv_pallas,
        )
        return gated_conv_pallas(x, kernel, bias, stride=stride,
                                 dilation=dilation, activation=activation)
    return gated_conv_xla(x, kernel, bias, stride=stride, dilation=dilation,
                          activation=activation)


def gated_conv_xla(x, kernel, bias, *, stride: int = 1, dilation: int = 1,
                   activation: str = "elu"):
    y = conv2d(x, kernel, stride=stride, dilation=dilation)
    y = y + bias.astype(y.dtype)
    features, gate = jnp.split(y, 2, axis=-1)
    return _activation(activation)(features) * jax.nn.sigmoid(gate)
