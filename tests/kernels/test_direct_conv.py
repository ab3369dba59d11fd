"""Implicit-GEMM gated conv vs the XLA oracle (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gan_inpainting_tpu.ops.gated_conv import gated_conv_xla
from gan_inpainting_tpu.ops.pallas.direct_conv import (
    direct_conv_supported,
    gated_conv_direct,
)


def _rand(seed, shape, scale=1.0):
    return scale * jax.random.normal(jax.random.key(seed), shape, jnp.float32)


@pytest.mark.parametrize("shape,k,dil", [
    ((2, 16, 12, 6), 3, 1),
    ((1, 16, 8, 4), 3, 2),    # dilated bottleneck form
    ((1, 8, 8, 4), 3, 4),     # halo == size//2
    ((1, 20, 10, 5), 5, 1),   # 5x5 stem form
])
def test_matches_xla(shape, k, dil):
    x = _rand(0, shape)
    kernel = _rand(1, (k, k, shape[-1], 10), 0.2)
    bias = _rand(2, (10,), 0.1)
    assert direct_conv_supported(shape, k, 1, dil, features=5)
    want = gated_conv_xla(x, kernel, bias, stride=1, dilation=dil,
                          activation="elu")
    with pltpu.force_tpu_interpret_mode():
        got = gated_conv_direct(x, kernel, bias, dilation=dil,
                                activation="elu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_gradients_match():
    x = _rand(3, (1, 8, 8, 4))
    kernel = _rand(4, (3, 3, 4, 8), 0.2)
    bias = _rand(5, (8,), 0.1)

    def loss(fn):
        return lambda x_, k_, b_: jnp.sum(fn(x_, k_, b_) ** 2)

    g_ref = jax.grad(loss(lambda *a: gated_conv_xla(*a, activation="elu")),
                     argnums=(0, 1, 2))(x, kernel, bias)
    with pltpu.force_tpu_interpret_mode():
        g_dir = jax.grad(
            loss(lambda *a: gated_conv_direct(*a, activation="elu")),
            argnums=(0, 1, 2))(x, kernel, bias)
    for name, a, b in zip(["dx", "dk", "db"], g_ref, g_dir):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_supported_models_real_features():
    # near-budget shape that fits with cf=1 but not with the real Cout:
    # the dispatcher must see False up front, not a ValueError from
    # gated_conv_direct's re-pick (ADVICE r2 #2)
    shape = (1, 512, 512, 256)
    assert direct_conv_supported(shape, 3, 1, 1, features=1)
    assert not direct_conv_supported(shape, 3, 1, 1, features=1024)


def test_stride2_unsupported():
    assert not direct_conv_supported((1, 16, 16, 4), 3, 2, 1)
    with pytest.raises(ValueError):
        gated_conv_direct(jnp.zeros((1, 8, 8, 4)),
                          jnp.zeros((3, 3, 4, 8)), jnp.zeros((8,)), stride=2)
