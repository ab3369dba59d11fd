"""Pallas kernels for gated/partial conv (placeholder — delegates to XLA).

Real kernels land behind the same signatures; the dispatch layer
(ops/dispatch.py) and models are already wired to them.
"""

from __future__ import annotations


def gated_conv_pallas(x, kernel, bias, *, stride, dilation, activation):
    from gan_inpainting_tpu.ops.gated_conv import gated_conv_xla

    return gated_conv_xla(x, kernel, bias, stride=stride, dilation=dilation,
                          activation=activation)


def partial_conv_epilogue_pallas(raw, counts, bias, window):
    from gan_inpainting_tpu.ops.partial_conv import partial_conv_epilogue_xla

    return partial_conv_epilogue_xla(raw, counts, bias, window)
