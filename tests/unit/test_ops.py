"""Functional-op semantics tests (gated/partial conv, contextual attention)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_inpainting_tpu.ops.contextual_attention import contextual_attention
from gan_inpainting_tpu.ops.conv import conv2d
from gan_inpainting_tpu.ops.dispatch import override_backend
from gan_inpainting_tpu.ops.gated_conv import gated_conv
from gan_inpainting_tpu.ops.partial_conv import partial_conv


def _rand(key, shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


def test_gated_conv_matches_manual():
    x = _rand(0, (2, 8, 8, 4))
    kernel = _rand(1, (3, 3, 4, 12)) * 0.1
    bias = _rand(2, (12,)) * 0.1
    with override_backend("xla"):
        y = gated_conv(x, kernel, bias, activation="elu")
    pre = conv2d(x, kernel) + bias
    f, g = jnp.split(pre, 2, axis=-1)
    expected = jax.nn.elu(f) * jax.nn.sigmoid(g)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)
    assert y.shape == (2, 8, 8, 6)


def test_gated_conv_stride_dilation_shapes():
    x = _rand(0, (1, 16, 16, 3))
    kernel = _rand(1, (3, 3, 3, 10))
    bias = jnp.zeros((10,))
    with override_backend("xla"):
        assert gated_conv(x, kernel, bias, stride=2).shape == (1, 8, 8, 5)
        assert gated_conv(x, kernel, bias, dilation=4).shape == (1, 16, 16, 5)


def test_partial_conv_all_valid_equals_plain():
    x = _rand(0, (2, 8, 8, 4))
    valid = jnp.ones((2, 8, 8, 1))
    kernel = _rand(1, (3, 3, 4, 6)) * 0.1
    bias = _rand(2, (6,)) * 0.1
    with override_backend("xla"):
        y, v_out = partial_conv(x, valid, kernel, bias)
    # interior pixels (full window) must equal a plain conv + bias
    expected = conv2d(x, kernel) + bias
    np.testing.assert_allclose(np.asarray(y[:, 1:-1, 1:-1]),
                               np.asarray(expected[:, 1:-1, 1:-1]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(v_out), 1.0)


def test_partial_conv_hole_renormalizes_and_mask_grows():
    x = jnp.ones((1, 8, 8, 1))
    valid = jnp.ones((1, 8, 8, 1)).at[:, 2:6, 2:6].set(0.0)
    kernel = jnp.ones((3, 3, 1, 1))
    bias = jnp.zeros((1,))
    with override_backend("xla"):
        y, v_out = partial_conv(x * valid, valid, kernel, bias)
    y = np.asarray(y[0, :, :, 0])
    v_out = np.asarray(v_out[0, :, :, 0])
    # deep-hole pixels: no valid inputs → output 0, still invalid
    assert y[4, 4] == 0.0 and v_out[4, 4] == 0.0
    # hole-border pixels: renormalized to the all-ones value (9/count*count/9)
    np.testing.assert_allclose(y[2, 2], 9.0, rtol=1e-5)
    # validity dilates by one pixel ring: border of hole becomes valid
    assert v_out[2, 2] == 1.0


def test_patch_attention_single_valid_key_copies_its_value():
    """Attention core: one valid key → every query returns that key's V."""
    from gan_inpainting_tpu.ops.contextual_attention import (
        _patch_attention_xla,
    )

    q = _rand(0, (1, 6, 8))
    k = _rand(1, (1, 5, 8))
    v = _rand(2, (1, 5, 12))
    valid = jnp.zeros((1, 5), bool).at[0, 2].set(True)
    y = _patch_attention_xla(q, k, valid, v, softmax_scale=10.0)
    expected = jnp.broadcast_to(v[:, 2:3, :], (1, 6, 12))
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_contextual_attention_output_is_convex_in_background():
    """End to end: outputs stay within the background value range."""
    feats = jnp.zeros((1, 8, 8, 4)).at[:, :6, :6, :].set(2.5)
    hole = jnp.ones((1, 8, 8, 1)).at[:, :6, :6, :].set(0.0)
    with override_backend("xla"):
        y = np.asarray(contextual_attention(feats, feats, hole,
                                            ksize=3, rate=2))
    assert y.min() >= -1e-5 and y.max() <= 2.5 + 1e-4
    # and the reconstruction actually uses the 2.5-valued background
    assert y.mean() > 0.5


def test_contextual_attention_no_valid_keys_gives_zeros():
    feats = _rand(0, (1, 8, 8, 4))
    hole = jnp.ones((1, 8, 8, 1))
    with override_backend("xla"):
        y = contextual_attention(feats, feats, hole)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)


def test_contextual_attention_shapes_and_grads():
    feats = _rand(0, (2, 16, 16, 8))
    hole = jnp.zeros((2, 16, 16, 1)).at[:, 4:12, 4:12, :].set(1.0)

    def loss(f):
        with override_backend("xla"):
            return jnp.sum(contextual_attention(f, f, hole) ** 2)

    g = jax.grad(loss)(feats)
    assert g.shape == feats.shape
    assert bool(jnp.isfinite(g).all())


def test_downscale_mask_max_catches_thin_strokes():
    """ADVICE.md r1: strided-slice downsampling can miss 1-px strokes; the
    conservative max-pool must mark every low-res cell the stroke touches."""
    from gan_inpainting_tpu.ops.contextual_attention import downscale_mask_max

    mask = jnp.zeros((1, 16, 16, 1), jnp.float32)
    mask = mask.at[:, 1, :, :].set(1.0)  # 1-px horizontal stroke at row 1
    # strided slicing [::4] samples rows 0,4,8,12 — misses the stroke
    assert float(jnp.sum(mask[:, ::4, ::4, :])) == 0.0
    down = downscale_mask_max(mask, 4)
    assert down.shape == (1, 4, 4, 1)
    # every cell in the first row band covers the stroke
    np.testing.assert_allclose(np.asarray(down[:, 0, :, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(down[:, 1:, :, :]), 0.0)


def test_contextual_attention_thin_stroke_invalidates_keys():
    """Keys overlapping a thin stroke must be excluded even when strided
    sampling would have missed the stroke entirely."""
    f = jax.random.normal(jax.random.key(9), (1, 16, 16, 8))
    hole = jnp.zeros((1, 16, 16, 1)).at[:, 1, :, :].set(1.0)
    y = contextual_attention(f, f, hole, backend="xla")
    assert y.shape == f.shape
    # with an all-row stroke at rate=2, the downscaled row 0 is all-hole, so
    # keys in rows 0-1 are invalid; output remains finite and non-degenerate
    assert bool(jnp.all(jnp.isfinite(y)))
