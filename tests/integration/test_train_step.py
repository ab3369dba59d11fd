"""Train-step integration tests (SURVEY.md §4 model/step tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_inpainting_tpu.configs.base import apply_overrides
from gan_inpainting_tpu.data.pipeline import make_train_batch
from gan_inpainting_tpu.data.synthetic import synthetic_batch_u8
from gan_inpainting_tpu.train.state import create_state
from gan_inpainting_tpu.train.step import make_train_step


def _make_batch(cfg, seed=0):
    imgs = synthetic_batch_u8(jax.random.key(seed), cfg.data.batch_size,
                              cfg.data.image_size)
    return make_train_batch(imgs, jax.random.key(seed + 1), cfg.mask)


def _tree_l2_diff(a, b):
    return sum(float(jnp.sum((x - y) ** 2))
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_one_step_updates_both_networks(tiny_config):
    cfg = tiny_config
    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    batch = _make_batch(cfg)
    new_state, metrics = step(state, batch, jax.random.key(2))

    for v in metrics.values():
        assert bool(jnp.isfinite(v)), metrics
    assert int(new_state.step) == 1
    assert _tree_l2_diff(new_state.g_params, state.g_params) > 0
    assert _tree_l2_diff(new_state.d_params, state.d_params) > 0


def test_overfit_one_batch_drives_l1_down(tiny_config):
    """The classic GAN smoke test: L1 falls when training on one batch."""
    cfg = apply_overrides(tiny_config, ["loss.gan_weight=0.1",
                                        "train.g_lr=0.002"])
    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    batch = _make_batch(cfg)
    first = None
    for i in range(80):
        state, metrics = step(state, batch, jax.random.key(i))
        if first is None:
            first = float(metrics["g_l1"])
    last = float(metrics["g_l1"])
    assert last < 0.5 * first, (first, last)


@pytest.mark.parametrize("name,overrides", [
    ("coarse_to_fine_gated", ["model.generator=coarse_to_fine",
                              "model.conv_kind=gated",
                              "model.use_attention=true"]),
    ("partial_conv", ["model.conv_kind=partial"]),
    ("partialconv_no_gan", ["model.conv_kind=partial", "loss.gan_weight=0",
                            "loss.perceptual_weight=0.05",
                            "loss.style_weight=1.0"]),
    ("sn_vgg", ["model.spectral_norm=true", "loss.perceptual_weight=0.05",
                "loss.style_weight=1.0", "loss.adversarial=hinge",
                "loss.spatial_discount=0.9"]),
    ("lsgan", ["loss.adversarial=lsgan"]),
])
def test_variants_take_a_finite_step(tiny_config, name, overrides):
    cfg = apply_overrides(tiny_config, overrides)
    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    new_state, metrics = step(state, _make_batch(cfg), jax.random.key(1))
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), (name, k, float(v))
    assert _tree_l2_diff(new_state.g_params, state.g_params) > 0


def test_remat_stages_is_numerically_transparent(tiny_config):
    """model.remat_stages changes memory scheduling, not math: one step
    from identical state must produce identical params and metrics."""
    cfg = apply_overrides(tiny_config, ["model.generator=coarse_to_fine",
                                        "model.conv_kind=gated",
                                        "model.use_attention=true"])
    cfg_r = apply_overrides(cfg, ["model.remat_stages=true"])
    batch = _make_batch(cfg)
    results = []
    for c in (cfg, cfg_r):
        state = create_state(c, jax.random.key(0))
        step = make_train_step(c, donate=False)
        new_state, metrics = step(state, batch, jax.random.key(1))
        results.append((new_state, metrics))
    (s_a, m_a), (s_b, m_b) = results
    # same param trees (remat configs share checkpoints)
    assert _tree_l2_diff(s_a.g_params, s_b.g_params) == 0.0
    assert _tree_l2_diff(s_a.d_params, s_b.d_params) == 0.0
    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=1e-6,
                                   err_msg=k)


def test_spectral_stats_update(tiny_config):
    cfg = apply_overrides(tiny_config, ["model.spectral_norm=true"])
    state = create_state(cfg, jax.random.key(0))
    assert jax.tree.leaves(state.d_stats), "SN stats missing"
    step = make_train_step(cfg, donate=False)
    new_state, _ = step(state, _make_batch(cfg), jax.random.key(1))
    assert _tree_l2_diff(new_state.d_stats, state.d_stats) > 0
    # u vectors stay unit-norm
    for u in jax.tree.leaves(new_state.d_stats):
        np.testing.assert_allclose(float(jnp.linalg.norm(u)), 1.0, rtol=1e-4)
