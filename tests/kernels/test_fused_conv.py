"""Pallas gated/partial conv kernels vs the XLA oracle (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gan_inpainting_tpu.ops.gated_conv import gated_conv_xla
from gan_inpainting_tpu.ops.partial_conv import (
    _window_counts,
    partial_conv_epilogue_xla,
)
from gan_inpainting_tpu.ops.pallas.fused_matmul import (
    gated_conv_pallas,
    partial_conv_epilogue_pallas,
)


def _rand(seed, shape, scale=1.0):
    return scale * jax.random.normal(jax.random.key(seed), shape,
                                     jnp.float32)


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_gated_conv_pallas_matches_xla(stride, dilation):
    x = _rand(0, (2, 12, 12, 6))
    kernel = _rand(1, (3, 3, 6, 16), 0.2)
    bias = _rand(2, (16,), 0.1)
    expected = gated_conv_xla(x, kernel, bias, stride=stride,
                              dilation=dilation, activation="elu")
    with pltpu.force_tpu_interpret_mode():
        got = gated_conv_pallas(x, kernel, bias, stride=stride,
                                dilation=dilation, activation="elu")
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_gated_conv_pallas_gradients():
    x = _rand(3, (1, 8, 8, 4))
    kernel = _rand(4, (3, 3, 4, 8), 0.2)
    bias = _rand(5, (8,), 0.1)

    def loss_ref(x_, k_, b_):
        return jnp.sum(gated_conv_xla(x_, k_, b_) ** 2)

    def loss_pal(x_, k_, b_):
        return jnp.sum(gated_conv_pallas(x_, k_, b_) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, kernel, bias)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(x, kernel, bias)
    for name, a, b_ in zip(["dx", "dk", "db"], g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_partial_epilogue_pallas_matches_xla():
    raw = _rand(6, (2, 10, 10, 7))
    valid = (jax.random.uniform(jax.random.key(7), (2, 10, 10, 1))
             > 0.4).astype(jnp.float32)
    counts = _window_counts(valid, 3, 1, 1)
    bias = _rand(8, (7,), 0.1)
    y_ref, v_ref = partial_conv_epilogue_xla(raw, counts, bias, 3)
    with pltpu.force_tpu_interpret_mode():
        y_pal, v_pal = partial_conv_epilogue_pallas(raw, counts, bias, 3)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(v_pal), np.asarray(v_ref))


def test_partial_epilogue_pallas_gradients():
    raw = _rand(9, (1, 6, 6, 4))
    valid = (jax.random.uniform(jax.random.key(10), (1, 6, 6, 1))
             > 0.4).astype(jnp.float32)
    counts = _window_counts(valid, 3, 1, 1)
    bias = _rand(11, (4,), 0.1)

    def loss(fn):
        def inner(r, b_):
            y, _ = fn(r, counts, b_, 3)
            return jnp.sum(y ** 2)
        return inner

    g_ref = jax.grad(loss(partial_conv_epilogue_xla), argnums=(0, 1))(
        raw, bias)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss(partial_conv_epilogue_pallas), argnums=(0, 1))(
            raw, bias)
    for name, a, b_ in zip(["draw", "dbias"], g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=5e-4, err_msg=name)
