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
    ("r1_tv", ["loss.r1_gamma=0.1", "loss.tv_weight=0.1"]),
    ("feature_match", ["loss.feature_match_weight=10.0"]),
])
def test_variants_take_a_finite_step(tiny_config, name, overrides):
    cfg = apply_overrides(tiny_config, overrides)
    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    new_state, metrics = step(state, _make_batch(cfg), jax.random.key(1))
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), (name, k, float(v))
    assert _tree_l2_diff(new_state.g_params, state.g_params) > 0


def test_r1_and_tv_metrics_surface(tiny_config):
    """loss.r1_gamma / loss.tv_weight expose d_r1 / g_tv metrics and both
    are strictly positive on random data (the R1 grad of a fresh D and
    the TV of a noisy composite can't be 0). Also exercises the
    grad_accum variant of the R1 pass."""
    for extra in ([], ["train.grad_accum=2"]):
        cfg = apply_overrides(
            tiny_config, ["loss.r1_gamma=0.1", "loss.tv_weight=0.1"] + extra)
        state = create_state(cfg, jax.random.key(0))
        step = make_train_step(cfg, donate=False)
        _, metrics = step(state, _make_batch(cfg), jax.random.key(1))
        assert float(metrics["d_r1"]) > 0.0, extra
        assert float(metrics["g_tv"]) > 0.0, extra
    # and the keys stay absent when the knobs are off (pinned-metric
    # fingerprints must not change for existing configs)
    state = create_state(tiny_config, jax.random.key(0))
    step = make_train_step(tiny_config, donate=False)
    _, metrics = step(state, _make_batch(tiny_config), jax.random.key(1))
    assert "d_r1" not in metrics and "g_tv" not in metrics


def test_lazy_r1_applies_on_interval(tiny_config):
    """loss.r1_interval=k pays the R1 pass only when step % k == 0 (d_r1
    metric nonzero there, exactly 0 between), and k=1 stays bit-identical
    to the pre-knob behavior."""
    cfg = apply_overrides(tiny_config,
                          ["loss.r1_gamma=0.1", "loss.r1_interval=2"])
    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    batch = _make_batch(cfg)
    state, m0 = step(state, batch, jax.random.key(1))     # step 0: applies
    state, m1 = step(state, batch, jax.random.key(1))     # step 1: skipped
    _, m2 = step(state, batch, jax.random.key(1))         # step 2: applies
    assert float(m0["d_r1"]) > 0.0
    assert float(m1["d_r1"]) == 0.0
    assert float(m2["d_r1"]) > 0.0

    # k=1 is the exact pre-knob math: same first-step metrics as an
    # explicit interval=1 config
    cfg_a = apply_overrides(tiny_config, ["loss.r1_gamma=0.1"])
    cfg_b = apply_overrides(cfg_a, ["loss.r1_interval=1"])
    sa = create_state(cfg_a, jax.random.key(0))
    sb = create_state(cfg_b, jax.random.key(0))
    _, ma = make_train_step(cfg_a, donate=False)(
        sa, _make_batch(cfg_a), jax.random.key(1))
    _, mb = make_train_step(cfg_b, donate=False)(
        sb, _make_batch(cfg_b), jax.random.key(1))
    for k in ma:
        assert float(ma[k]) == float(mb[k]), k


def test_lazy_r1_under_grad_accum(tiny_config):
    """The grad-accum scan path honors loss.r1_interval the same way the
    plain path does: the whole optimizer step is regularized on step % k
    == 0 (d_r1 > 0) and skipped between (d_r1 == 0)."""
    cfg = apply_overrides(tiny_config,
                          ["loss.r1_gamma=0.1", "loss.r1_interval=2",
                           "train.grad_accum=2"])
    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    batch = _make_batch(cfg)
    state, m0 = step(state, batch, jax.random.key(1))     # step 0: applies
    state, m1 = step(state, batch, jax.random.key(1))     # step 1: skipped
    _, m2 = step(state, batch, jax.random.key(1))         # step 2: applies
    assert float(m0["d_r1"]) > 0.0
    assert float(m1["d_r1"]) == 0.0
    assert float(m2["d_r1"]) > 0.0


def test_feature_matching_properties(tiny_config):
    """D's return_features exposes one map per strided layer (spatial dims
    halving), identical inputs match exactly (fm term 0), and the g_fm
    metric surfaces positive in a real step."""
    import jax.numpy as jnp

    from gan_inpainting_tpu.models.discriminator import build_discriminator

    cfg = apply_overrides(tiny_config, ["loss.feature_match_weight=10.0"])
    disc = build_discriminator(cfg.model)
    img = jax.random.uniform(jax.random.key(0),
                             (2, cfg.data.image_size, cfg.data.image_size, 3),
                             minval=-1, maxval=1)
    mask = jnp.zeros((2, cfg.data.image_size, cfg.data.image_size, 1))
    variables = disc.init(jax.random.key(1), img, mask)
    _, feats = disc.apply(variables, img, mask, return_features=True)
    assert len(feats) == cfg.model.disc_layers
    for i, f in enumerate(feats):
        assert f.shape[1] == cfg.data.image_size // (2 ** (i + 1)), f.shape
    _, feats2 = disc.apply(variables, img, mask, return_features=True)
    assert all(bool(jnp.all(a == b)) for a, b in zip(feats, feats2))

    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    _, metrics = step(state, _make_batch(cfg), jax.random.key(1))
    assert float(metrics["g_fm"]) > 0.0


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
