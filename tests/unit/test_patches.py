"""extract_patches / fold_patches round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_inpainting_tpu.ops.patches import (
    extract_patches,
    fold_patches,
    same_pads,
)


def test_same_pads():
    assert same_pads(8, 3, 1) == (1, 1)
    assert same_pads(8, 4, 2) == (1, 1)
    assert same_pads(9, 3, 2) == (1, 1)


def test_extract_values():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    p = extract_patches(x, 3, 1, "same")
    assert p.shape == (1, 4, 4, 3, 3, 1)
    # patch at (1,1) is the 3x3 neighborhood of pixel (1,1)
    np.testing.assert_array_equal(
        np.asarray(p[0, 1, 1, :, :, 0]),
        np.arange(16).reshape(4, 4)[0:3, 0:3])
    # corner patch includes zero padding
    assert float(p[0, 0, 0, 0, 0, 0]) == 0.0


@pytest.mark.parametrize("window,stride,hw", [(3, 1, (8, 8)), (4, 2, (8, 12)),
                                              (4, 2, (6, 6)), (2, 2, (8, 8))])
def test_fold_is_transpose_of_extract(window, stride, hw):
    h, w = hw
    x = jax.random.normal(jax.random.key(0), (2, h, w, 3))
    p = extract_patches(x, window, stride, "same")
    y, cnt = fold_patches(p, stride, (h, w), "same")
    # fold(extract(x)) = x * overlap_count, so y / cnt == x
    np.testing.assert_allclose(np.asarray(y / cnt), np.asarray(x),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(cnt) > 0).all()
