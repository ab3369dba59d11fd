"""Loss-function unit tests vs closed-form values (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_inpainting_tpu.losses.adversarial import d_loss, g_loss, r1_penalty
from gan_inpainting_tpu.losses.perceptual import (
    gram_matrix,
    init_vgg,
    perceptual_and_style_loss,
)
from gan_inpainting_tpu.losses.reconstruction import (
    l1_loss,
    spatial_discount_mask,
    tv_loss,
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


def test_tv_loss_closed_form():
    # linear ramp along W: every horizontal neighbor pair differs by s,
    # every vertical pair by 0. All-hole mask → region is everything; the
    # paper's normalization divides by N_comp = H·W elements (× channels,
    # which cancel): tv = s·H·(W-1)·C / (H·W·C); H=W=4 → 3s/4.
    s = 0.25
    comp = jnp.broadcast_to(jnp.arange(4.0)[None, None, :, None] * s,
                            (1, 4, 4, 3))
    mask = jnp.ones((1, 4, 4, 1))
    np.testing.assert_allclose(float(tv_loss(comp, mask)), 3 * s / 4,
                               rtol=1e-6)
    # no hole → empty region → exactly 0, whatever the image looks like
    assert float(tv_loss(comp, jnp.zeros((1, 4, 4, 1)))) == 0.0


def test_tv_loss_region_restriction():
    # single-pixel hole at (2,2) of 6×6, dilation=1 → region = [1..3]².
    # comp is constant inside that region but has a hard step at column
    # 4→5, outside the region: the step must not contribute.
    mask = jnp.zeros((1, 6, 6, 1)).at[0, 2, 2].set(1.0)
    comp = jnp.zeros((1, 6, 6, 3)).at[:, :, 5:].set(1.0)
    assert float(tv_loss(comp, mask, dilation=1)) == 0.0
    # move the step inside the region (column 2→3) and it registers:
    # 3 horizontal pairs straddle it (×3 channels) over N_comp = 9
    # region pixels ×3 channels → 9/27 = 1/3
    comp2 = jnp.zeros((1, 6, 6, 3)).at[:, :, 3:].set(1.0)
    np.testing.assert_allclose(float(tv_loss(comp2, mask, dilation=1)),
                               1 / 3, rtol=1e-6)


def test_r1_penalty_closed_form():
    # score(x) = a·Σx² per sample → ∇ = 2a·x → ‖∇‖² = 4a²·Σx²
    # penalty = 0.5·mean_b(4a²·Σx²) = 2a²·mean_b Σx²
    a = 1.5
    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))

    def score_fn(imgs):
        return a * jnp.sum(imgs ** 2, axis=(1, 2, 3))

    want = 2 * a * a * float(jnp.mean(jnp.sum(x ** 2, axis=(1, 2, 3))))
    np.testing.assert_allclose(float(r1_penalty(score_fn, x)), want,
                               rtol=1e-5)


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
