"""NHWC convolution wrapper.

One conv entry point for the whole framework: NHWC activations, HWIO kernels
(TPU-native layouts — XLA tiles these onto the MXU without transposes).
Compute dtype follows the inputs; pass bf16 activations/weights for MXU-rate
compute — the MXU accumulates in f32 internally regardless.
"""

from __future__ import annotations

import jax

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def conv2d(x, kernel, *, stride: int = 1, dilation: int = 1,
           padding: str = "SAME"):
    """2-D convolution. x: (B,H,W,Cin), kernel: (kh,kw,Cin,Cout).

    Output dtype follows the inputs. No explicit ``preferred_element_type``:
    the TPU MXU accumulates bf16 products in f32 regardless, and forcing an
    f32 output breaks the conv VJP's dtype agreement (f32 cotangent against
    bf16 operands).
    """
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=DIMENSION_NUMBERS,
    )
