"""PSNR/SSIM cross-checks (SURVEY.md §4: vs tf.image.ssim + hand values)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_inpainting_tpu.metrics.image import psnr, ssim


def test_psnr_identical_images_is_large():
    x = jnp.zeros((2, 16, 16, 3))
    assert (psnr(x, x) > 100).all()


def test_psnr_hand_value():
    a = jnp.zeros((1, 8, 8, 1))
    b = jnp.full((1, 8, 8, 1), 0.5)
    # mse = 0.25, max_val=2 → 10*log10(4/0.25) = 10*log10(16)
    np.testing.assert_allclose(np.asarray(psnr(a, b)),
                               10 * np.log10(16), rtol=1e-5)


def test_ssim_identical_is_one():
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3), minval=-1,
                           maxval=1)
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-5)


def test_ssim_matches_tensorflow():
    tf = pytest.importorskip("tensorflow")
    key = jax.random.key(1)
    a = jax.random.uniform(key, (3, 64, 64, 3))
    b = jnp.clip(a + 0.1 * jax.random.normal(jax.random.key(2), a.shape),
                 0, 1)
    ours = np.asarray(ssim(a, b, max_val=1.0))
    theirs = tf.image.ssim(tf.constant(np.asarray(a)),
                           tf.constant(np.asarray(b)), max_val=1.0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_ssim_filters_request_highest_precision():
    """TPU numerics guard (metrics/image.py _filter2 docstring): SSIM's
    E[x^2]-mu^2 cancellation needs f32-exact filters. At default TPU conv
    precision the SAME inputs measured 0.90 vs 0.96 mean SSIM depending on
    compilation context. The value bug is invisible on CPU (convs are
    exact there), so pin the traced precision request instead."""
    a = jnp.zeros((1, 16, 16, 1))
    jaxpr = jax.make_jaxpr(lambda x, y: ssim(x, y))(a, a)
    convs = [eq for eq in jaxpr.jaxpr.eqns
             if eq.primitive.name == "conv_general_dilated"]
    assert convs, "ssim no longer lowers to conv_general_dilated?"
    for eq in convs:
        prec = eq.params["precision"]
        assert prec is not None and "HIGHEST" in str(prec), (
            f"ssim filter conv precision regressed to {prec!r}")


def test_ssim_orders_degradations():
    x = jax.random.uniform(jax.random.key(3), (1, 48, 48, 3))
    slightly = jnp.clip(x + 0.02, 0, 1)
    badly = jnp.clip(x + 0.3 * jax.random.normal(jax.random.key(4), x.shape),
                     0, 1)
    assert float(ssim(x, slightly, max_val=1.0)[0]) > float(
        ssim(x, badly, max_val=1.0)[0])
