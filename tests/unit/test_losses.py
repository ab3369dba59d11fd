"""Loss-function unit tests vs closed-form values (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_inpainting_tpu.losses.adversarial import d_loss, g_loss
from gan_inpainting_tpu.losses.perceptual import (
    gram_matrix,
    init_vgg,
    perceptual_and_style_loss,
)
from gan_inpainting_tpu.losses.reconstruction import (
    l1_loss,
    spatial_discount_mask,
)


def test_hinge_closed_form():
    real = jnp.full((2, 4, 4, 1), 2.0)   # well-classified real
    fake = jnp.full((2, 4, 4, 1), -2.0)  # well-classified fake
    assert float(d_loss(real, fake, "hinge")) == 0.0
    np.testing.assert_allclose(float(g_loss(fake, "hinge")), 2.0)
    # margin violations
    real = jnp.zeros((1, 1, 1, 1))
    fake = jnp.zeros((1, 1, 1, 1))
    np.testing.assert_allclose(float(d_loss(real, fake, "hinge")), 2.0)


def test_bce_closed_form():
    zero = jnp.zeros((1, 2, 2, 1))
    # logits 0 → loss = log(2) per term
    np.testing.assert_allclose(float(d_loss(zero, zero, "bce")),
                               2 * np.log(2), rtol=1e-6)
    np.testing.assert_allclose(float(g_loss(zero, "bce")), np.log(2),
                               rtol=1e-6)


def test_lsgan_closed_form():
    real = jnp.zeros((1, 1, 1, 1))
    fake = jnp.ones((1, 1, 1, 1))
    np.testing.assert_allclose(float(d_loss(real, fake, "lsgan")), 1.0)
    np.testing.assert_allclose(float(g_loss(fake, "lsgan")), 0.0)


def test_l1_weighting():
    target = jnp.zeros((1, 4, 4, 3))
    output = jnp.ones((1, 4, 4, 3))
    mask = jnp.zeros((1, 4, 4, 1)).at[0, :2].set(1.0)  # top half hole
    # all errors are 1 → weighted mean is exactly 1 regardless of weights
    np.testing.assert_allclose(
        float(l1_loss(output, target, mask, hole_weight=6, valid_weight=1)),
        1.0, rtol=1e-6)
    # hole-only error with hole_weight=1,valid_weight=0 → mean of hole = 1
    output2 = target.at[0, :2].set(1.0)
    np.testing.assert_allclose(
        float(l1_loss(output2, target, mask, hole_weight=1, valid_weight=0)),
        1.0, rtol=1e-6)
    # and with weights reversed the hole error vanishes
    np.testing.assert_allclose(
        float(l1_loss(output2, target, mask, hole_weight=0, valid_weight=1)),
        0.0, atol=1e-7)


def test_spatial_discount_center_rect():
    # 8x8 hole centered in 16x16: Chebyshev distance to the border
    mask = jnp.zeros((1, 16, 16, 1)).at[:, 4:12, 4:12].set(1.0)
    w = np.asarray(spatial_discount_mask(mask, gamma=0.9, iters=8))[0, :, :, 0]
    assert w[0, 0] == 1.0                       # known pixel
    np.testing.assert_allclose(w[4, 4], 0.9, rtol=1e-5)      # corner: d=1
    np.testing.assert_allclose(w[7, 7], 0.9 ** 4, rtol=1e-5)  # center: d=4
    np.testing.assert_allclose(w[4, 7], 0.9, rtol=1e-5)      # edge row


def test_gram_matrix():
    feat = jnp.ones((1, 2, 2, 3))
    g = np.asarray(gram_matrix(feat))
    # x^T x / (h*w*c) with all-ones: each entry = 4/(2*2*3)
    np.testing.assert_allclose(g, np.full((1, 3, 3), 4 / 12), rtol=1e-6)


def test_perceptual_loss_zero_for_identical():
    model, params = init_vgg(num_blocks=2, compute_dtype=jnp.float32)

    def apply(p, x):
        return model.apply({"params": p}, x)

    x = jax.random.uniform(jax.random.key(0), (1, 32, 32, 3), minval=-1,
                           maxval=1)
    perc, style = perceptual_and_style_loss(apply, params, x, x)
    assert float(perc) == 0.0 and float(style) == 0.0
    y = jnp.clip(x + 0.3, -1, 1)
    perc2, _ = perceptual_and_style_loss(apply, params, y, x)
    assert float(perc2) > 0.0
