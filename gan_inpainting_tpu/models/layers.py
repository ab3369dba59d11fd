"""Conv building blocks: plain / gated / partial conv + spectral-norm conv.

Thin Flax wrappers that own parameters and hand plain arrays to the
functional ops in :mod:`gan_inpainting_tpu.ops`, so the XLA/Pallas backend
dispatch lives below the module layer.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan_inpainting_tpu.ops.conv import conv2d
from gan_inpainting_tpu.ops.gated_conv import _activation, gated_conv
from gan_inpainting_tpu.ops.partial_conv import partial_conv
from gan_inpainting_tpu.ops.upsample_conv import upsample2x_conv2d_epilogue

Dtype = Any

_KERNEL_INIT = nn.initializers.variance_scaling(1.0, "fan_in",
                                                "truncated_normal")


class InpaintConv(nn.Module):
    """One conv block of the generator; kind selects plain/gated/partial.

    __call__(x, valid) -> (y, valid_out). ``valid`` is the validity mask
    (1 = known pixel) threaded through the network for partial convs; plain
    and gated convs pass it through (stride-resized) untouched.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    conv_kind: str = "plain"      # plain | gated | partial
    activation: str = "elu"
    backend: str = "auto"
    compute_dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    # Fuse a preceding nearest-2x upsample into the conv (decoder blocks):
    # the SAME 3x3 parameter, evaluated as a low-res 2x2 parity conv +
    # depth-to-space — exact math at 4/9ths the MACs (ops/upsample_conv.py).
    # Only valid for plain/gated 3x3 stride-1 undilated convs; the caller
    # (_Stack) falls back to an explicit upsample otherwise.
    pre_upsample: bool = False
    # Evaluate a 5x5 stride-1 stem conv in the space-to-depth cell domain
    # (ops/s2d_conv.py): exact math, same parameter, ~4x the MXU lane
    # utilization on thin stem inputs. Plain/gated only.
    s2d: bool = False

    @nn.compact
    def __call__(self, x, valid=None):
        cin = x.shape[-1]
        cout = 2 * self.features if self.conv_kind == "gated" else self.features
        kernel = self.param(
            "kernel", _KERNEL_INIT,
            (self.kernel_size, self.kernel_size, cin, cout),
            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (cout,),
                          self.param_dtype)
        x = x.astype(self.compute_dtype)

        if self.s2d:
            if (self.conv_kind not in ("plain", "gated")
                    or self.kernel_size != 5 or self.stride != 1
                    or self.dilation != 1):
                raise ValueError("s2d requires a plain/gated 5x5 stride-1 "
                                 "undilated conv")
            from gan_inpainting_tpu.ops.s2d_conv import s2d_conv5x5_epilogue

            if self.conv_kind == "gated":
                def epilogue(m):
                    m = m + bias.astype(m.dtype)
                    f, g = jnp.split(m, 2, axis=-1)
                    return (_activation(self.activation)(f)
                            * jax.nn.sigmoid(g))
            else:
                def epilogue(m):
                    return _activation(self.activation)(
                        m + bias.astype(m.dtype))
            y = s2d_conv5x5_epilogue(x, kernel, epilogue)
            return y, valid

        if self.pre_upsample:
            if (self.conv_kind not in ("plain", "gated")
                    or self.kernel_size != 3 or self.stride != 1
                    or self.dilation != 1):
                raise ValueError("pre_upsample requires a plain/gated 3x3 "
                                 "stride-1 undilated conv")
            # parity kernels built from the f32 param, cast once inside;
            # bias + activation (+ gate) fuse into the parity convs — the
            # epilogue commutes with the depth-to-space interleave
            if self.conv_kind == "gated":
                def epilogue(m):
                    m = m + bias.astype(m.dtype)
                    f, g = jnp.split(m, 2, axis=-1)
                    return (_activation(self.activation)(f)
                            * jax.nn.sigmoid(g))
            else:
                def epilogue(m):
                    return _activation(self.activation)(
                        m + bias.astype(m.dtype))
            y = upsample2x_conv2d_epilogue(x, kernel, epilogue)
            return y, valid

        kernel = kernel.astype(self.compute_dtype)

        if self.conv_kind == "gated":
            y = gated_conv(x, kernel, bias, stride=self.stride,
                           dilation=self.dilation,
                           activation=self.activation, backend=self.backend)
            return y, _resize_valid(valid, self.stride)
        if self.conv_kind == "partial":
            if valid is None:
                valid = jnp.ones(x.shape[:3] + (1,), jnp.float32)
            y, valid_out = partial_conv(x, valid, kernel, bias,
                                        stride=self.stride,
                                        dilation=self.dilation,
                                        backend=self.backend)
            return _activation(self.activation)(y), valid_out
        if self.conv_kind == "plain":
            y = conv2d(x, kernel, stride=self.stride, dilation=self.dilation)
            y = y + bias.astype(y.dtype)
            return _activation(self.activation)(y), _resize_valid(
                valid, self.stride)
        raise ValueError(f"unknown conv_kind {self.conv_kind!r}")


def _resize_valid(valid, stride: int):
    if valid is None or stride == 1:
        return valid
    return valid[:, ::stride, ::stride, :]


class SNConv(nn.Module):
    """Discriminator conv, optionally spectrally normalized (reference R9).

    Spectral norm follows Miyato et al.: one power-iteration step per call on
    the (fan_in, cout)-reshaped kernel, singular vector ``u`` carried in the
    'spectral' variable collection (it is training state, not a parameter —
    SURVEY.md §7 "spectral-norm power iteration ... must live in the train
    state"). Iteration runs in f32 regardless of compute dtype.
    """

    features: int
    kernel_size: int = 5
    stride: int = 2
    use_sn: bool = False
    activation: str = "leaky_relu"
    compute_dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", _KERNEL_INIT,
            (self.kernel_size, self.kernel_size, cin, self.features),
            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)

        if self.use_sn:
            w = kernel.astype(jnp.float32).reshape(-1, self.features)
            u_var = self.variable(
                "spectral", "u",
                lambda: jax.random.normal(
                    self.make_rng("params") if self.has_rng("params")
                    else jax.random.key(0),
                    (self.features,), jnp.float32))
            u = u_var.value
            # Miyato et al.: gradients stop through the power-iteration
            # vectors u/v only; sigma = v^T W u stays differentiable in W,
            # contributing the -W·(v u^T)/sigma² term to D's gradient.
            v = jax.lax.stop_gradient(_l2_normalize(w @ u))
            u_new = jax.lax.stop_gradient(_l2_normalize(w.T @ v))
            sigma = jnp.einsum("i,ij,j->", v, w, u_new)
            if update_stats and not self.is_initializing():
                u_var.value = u_new
            kernel = kernel / sigma.astype(kernel.dtype)

        x = x.astype(self.compute_dtype)
        y = conv2d(x, kernel.astype(self.compute_dtype), stride=self.stride)
        y = y + bias.astype(y.dtype)
        return _activation(self.activation)(y)


def _l2_normalize(x, eps: float = 1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x), eps)
