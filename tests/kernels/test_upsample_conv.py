"""Fused nearest-up + 3x3 conv vs the explicit composition (exact math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_inpainting_tpu.models.generator import _upsample2x
from gan_inpainting_tpu.ops.conv import conv2d
from gan_inpainting_tpu.ops.upsample_conv import upsample2x_conv2d


def _rand(seed, shape, scale=1.0):
    return scale * jax.random.normal(jax.random.key(seed), shape, jnp.float32)


def _ref(x, kernel):
    return conv2d(_upsample2x(x), kernel)


@pytest.mark.parametrize("shape,cout", [
    ((2, 8, 8, 6), 10),
    ((1, 5, 7, 3), 4),    # odd spatial dims exercise every edge parity
    ((3, 1, 1, 2), 2),    # degenerate 1x1 low-res map
])
def test_matches_explicit_upsample_conv(shape, cout):
    x = _rand(0, shape)
    kernel = _rand(1, (3, 3, shape[-1], cout), 0.3)
    got = upsample2x_conv2d(x, kernel)
    want = _ref(x, kernel)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match():
    x = _rand(2, (2, 6, 6, 4))
    kernel = _rand(3, (3, 3, 4, 8), 0.3)

    def loss(fn):
        return lambda x_, k_: jnp.sum(jnp.sin(fn(x_, k_)))

    g_fused = jax.grad(loss(upsample2x_conv2d), argnums=(0, 1))(x, kernel)
    g_ref = jax.grad(loss(_ref), argnums=(0, 1))(x, kernel)
    for name, a, b in zip(["dx", "dkernel"], g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_inpaint_conv_pre_upsample_matches_explicit():
    """The module-level fusion: same params, same output as upsample+conv."""
    from gan_inpainting_tpu.models.layers import InpaintConv

    x = _rand(4, (2, 6, 6, 5))
    for kind in ("plain", "gated"):
        fused = InpaintConv(features=7, conv_kind=kind,
                            compute_dtype=jnp.float32, pre_upsample=True)
        naive = InpaintConv(features=7, conv_kind=kind,
                            compute_dtype=jnp.float32)
        params = fused.init(jax.random.key(5), x)
        y_fused, _ = fused.apply(params, x)
        y_naive, _ = naive.apply(params, _upsample2x(x))
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_naive),
                                   rtol=1e-5, atol=1e-5, err_msg=kind)


def test_generator_params_unchanged_by_fusion():
    """Fusion is checkpoint-compatible: the decoder still owns 3x3 kernels."""
    from gan_inpainting_tpu.configs.base import get_config
    from gan_inpainting_tpu.models.generator import build_generator
    from gan_inpainting_tpu.train.state import create_state

    cfg = get_config("serve_v4_8")
    state = create_state(cfg, jax.random.key(0))
    gen = build_generator(cfg.model)
    # decoder upsample blocks: coarse conv9/conv11 (128->256 path) keep
    # their (3, 3, Cin, Cout) kernels
    flat = jax.tree_util.tree_leaves_with_path(state.g_params)
    up_kernels = [(jax.tree_util.keystr(k), v.shape) for k, v in flat
                  if "kernel" in jax.tree_util.keystr(k)]
    assert all(s[0] in (3, 5) and s[1] in (3, 5) for _, s in up_kernels)
    # and the model still applies
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mask = jnp.zeros((1, 64, 64, 1), jnp.float32)
    out = gen.apply({"params": state.g_params}, img, mask)
    assert out.fine.shape == (1, 64, 64, 3)
