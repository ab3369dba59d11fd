"""Space-to-depth stem conv vs the plain 5×5 conv (exact-math rewrite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_inpainting_tpu.ops.conv import conv2d
from gan_inpainting_tpu.ops.s2d_conv import s2d_conv5x5_epilogue


def _rand(seed, shape, scale=1.0):
    return scale * jax.random.normal(jax.random.key(seed), shape, jnp.float32)


@pytest.mark.parametrize("shape,cout", [
    ((2, 16, 12, 4), 7),
    ((1, 32, 32, 4), 96),   # the real stem form (gated 2F=96)
    ((1, 8, 20, 6), 5),
])
def test_matches_plain_conv(shape, cout):
    x = _rand(0, shape)
    k = _rand(1, (5, 5, shape[-1], cout), 0.2)
    want = conv2d(x, k, stride=1, dilation=1)
    got = s2d_conv5x5_epilogue(x, k, lambda m: m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_epilogue_commutes():
    x = _rand(2, (1, 16, 16, 4))
    k = _rand(3, (5, 5, 4, 8), 0.2)
    bias = _rand(4, (8,), 0.1)

    def epi(m):
        m = m + bias.astype(m.dtype)
        f, g = jnp.split(m, 2, axis=-1)
        return jax.nn.elu(f) * jax.nn.sigmoid(g)

    want = epi(conv2d(x, k, stride=1, dilation=1))
    got = s2d_conv5x5_epilogue(x, k, epi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_gradients_match():
    x = _rand(5, (1, 8, 8, 4))
    k = _rand(6, (5, 5, 4, 6), 0.2)

    def loss(fn):
        return lambda x_, k_: jnp.sum(jnp.sin(fn(x_, k_)))

    g_ref = jax.grad(loss(lambda x_, k_: conv2d(x_, k_, stride=1,
                                                dilation=1)),
                     argnums=(0, 1))(x, k)
    g_s2d = jax.grad(loss(lambda x_, k_: s2d_conv5x5_epilogue(
        x_, k_, lambda m: m)), argnums=(0, 1))(x, k)
    for name, a, b in zip(["dx", "dk"], g_ref, g_s2d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_generator_equivalence_with_flag():
    # same params, same outputs with the stem rewrite on
    from gan_inpainting_tpu.configs.base import apply_overrides, get_config
    from gan_inpainting_tpu.models.generator import build_generator

    cfg = get_config("celebahq256_freeform")
    cfg = apply_overrides(cfg, ["data.image_size=64", "model.base_features=8",
                                "model.dtype_policy=f32"])
    masked = _rand(7, (1, 64, 64, 3))
    mask = (jax.random.uniform(jax.random.key(8), (1, 64, 64, 1))
            > 0.7).astype(jnp.float32)
    gen0 = build_generator(cfg.model)
    params = gen0.init(jax.random.key(0), masked, mask)["params"]
    out0 = gen0.apply({"params": params}, masked, mask)
    cfg2 = apply_overrides(cfg, ["model.s2d_stem=true"])
    gen1 = build_generator(cfg2.model)
    out1 = gen1.apply({"params": params}, masked, mask)
    np.testing.assert_allclose(np.asarray(out1.fine), np.asarray(out0.fine),
                               rtol=2e-4, atol=2e-4)
