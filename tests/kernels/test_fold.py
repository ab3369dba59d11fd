"""Pallas overlap-add fold vs the XLA fold (interpreter mode), and the
fully-folded fused attention path vs the streaming composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gan_inpainting_tpu.ops.pallas.fold import fold_taps_pallas
from gan_inpainting_tpu.ops.patches import fold_patches


def _ref_fold(taps, hs, ws, rate):
    b, n_taps, lq, c = taps.shape
    pm = taps.transpose(0, 2, 1, 3).reshape(b, hs, ws, 2 * rate, 2 * rate, c)
    y, cnt = fold_patches(pm, rate, (rate * hs, rate * ws), "same")
    return y / jnp.maximum(cnt, 1.0)


@pytest.mark.parametrize("b,hs,ws,c,rate", [
    (2, 8, 8, 5, 2),
    (1, 4, 8, 3, 2),   # non-square cell grid
    (1, 8, 4, 6, 1),   # rate 1: window 2, stride 1
    (1, 4, 4, 3, 4),   # rate 4
])
def test_fold_matches_xla(b, hs, ws, c, rate):
    taps = jax.random.normal(jax.random.key(0),
                             (b, 4 * rate * rate, hs * ws, c), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = fold_taps_pallas(taps, hs, ws, rate)
    want = _ref_fold(taps, hs, ws, rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_folded_fused_attention_matches_streaming():
    """fused_attention_map == XLA front-end + flash kernel + XLA fold."""
    from gan_inpainting_tpu.ops.contextual_attention import (
        _attention_inputs,
        _patch_attention_xla,
    )
    from gan_inpainting_tpu.ops.pallas.fused_attention import (
        fused_attention_map,
        fused_supported,
    )

    bsz, h, w, c = 2, 32, 32, 8
    rate, ksize, scale = 2, 3, 10.0
    f = jax.random.normal(jax.random.key(1), (bsz, h, w, c), jnp.float32)
    hole = (jax.random.uniform(jax.random.key(2), (bsz, h, w, 1))
            < 0.3).astype(jnp.float32)
    assert fused_supported(f.shape, ksize, rate)

    with pltpu.force_tpu_interpret_mode():
        got = fused_attention_map(f, hole, ksize=ksize, rate=rate,
                                  softmax_scale=scale)

    q, k, valid, v, (hs, ws) = _attention_inputs(f, f, hole, ksize, rate)
    yp = _patch_attention_xla(q, k, valid, v, scale)
    yp = yp.reshape(bsz, hs, ws, 2 * rate, 2 * rate, c)
    y, cnt = fold_patches(yp, rate, (h, w), "same")
    want = y / jnp.maximum(cnt, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_folded_fused_attention_gradients():
    """Backward of the folded path == backward of the XLA composition."""
    from gan_inpainting_tpu.ops.contextual_attention import (
        _attention_inputs,
        _patch_attention_xla,
    )
    from gan_inpainting_tpu.ops.pallas.fused_attention import (
        fused_attention_map,
    )

    bsz, h, w, c = 1, 32, 32, 4
    rate, ksize, scale = 2, 3, 5.0
    f = jax.random.normal(jax.random.key(3), (bsz, h, w, c), jnp.float32)
    hole = (jax.random.uniform(jax.random.key(4), (bsz, h, w, 1))
            < 0.3).astype(jnp.float32)

    def loss_fused(bf):
        return jnp.sum(fused_attention_map(bf, hole, ksize=ksize, rate=rate,
                                           softmax_scale=scale) ** 2)

    def loss_ref(bf):
        q, k, valid, v, (hs, ws) = _attention_inputs(bf, bf, hole, ksize,
                                                     rate)
        yp = _patch_attention_xla(q, k, valid, v, scale)
        yp = yp.reshape(bsz, hs, ws, 2 * rate, 2 * rate, c)
        y, cnt = fold_patches(yp, rate, (h, w), "same")
        return jnp.sum((y / jnp.maximum(cnt, 1.0)) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused)(f)
    g_ref = jax.grad(loss_ref)(f)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-4)
