"""LR schedules, gradient accumulation, warm-start (train.* knobs).

SURVEY.md R13/R17: the reference's trainer exposes only constant-lr Adam;
these are the training-completeness knobs a production trainer adds on top.
Gradient accumulation is equivalence-gated against the full-batch step (the
losses are all batch means, so averaging micro-batch gradients is the same
math in f32).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_inpainting_tpu.configs.base import apply_overrides
from gan_inpainting_tpu.data.pipeline import make_train_batch
from gan_inpainting_tpu.data.synthetic import synthetic_batch_u8
from gan_inpainting_tpu.train.state import (
    create_state,
    make_lr_schedule,
    warm_start,
)
from gan_inpainting_tpu.train.step import make_train_step


def _make_batch(cfg, seed=0, batch=None):
    imgs = synthetic_batch_u8(jax.random.key(seed),
                              batch or cfg.data.batch_size,
                              cfg.data.image_size)
    return make_train_batch(imgs, jax.random.key(seed + 1), cfg.mask)


def _tree_allclose(a, b, rtol=1e-5, atol=1e-6):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# LR schedules
# ---------------------------------------------------------------------------


def test_constant_schedule_is_plain_float(tiny_config):
    # keeps the optimizer state tree identical to pre-schedule checkpoints
    assert make_lr_schedule(tiny_config, 1e-4) == 1e-4


def test_cosine_schedule_with_warmup(tiny_config):
    cfg = apply_overrides(tiny_config, [
        "train.lr_schedule=cosine", "train.warmup_steps=10",
        "train.lr_decay_steps=110", "train.lr_end_factor=0.1"])
    sched = make_lr_schedule(cfg, 1e-3)
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(5e-4)
    assert float(sched(10)) == pytest.approx(1e-3)
    # midpoint of the cosine arc: (1 + cos(pi/2))/2 scaled into [end, base]
    mid = 0.1e-3 + (1e-3 - 0.1e-3) * 0.5
    assert float(sched(60)) == pytest.approx(mid, rel=1e-3)
    assert float(sched(110)) == pytest.approx(0.1e-3, rel=1e-3)


def test_linear_schedule(tiny_config):
    cfg = apply_overrides(tiny_config, [
        "train.lr_schedule=linear", "train.lr_decay_steps=100"])
    sched = make_lr_schedule(cfg, 2e-4)
    assert float(sched(0)) == pytest.approx(2e-4)
    assert float(sched(50)) == pytest.approx(1e-4)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-12)


def test_bad_schedule_name_raises(tiny_config):
    cfg = apply_overrides(tiny_config, ["train.lr_schedule=step",
                                        "train.warmup_steps=1"])
    with pytest.raises(ValueError, match="lr_schedule"):
        make_lr_schedule(cfg, 1e-4)


def test_warmup_freezes_then_trains(tiny_config):
    """With a 3-step warmup from lr 0, step 1 must not move the params."""
    cfg = apply_overrides(tiny_config, [
        "train.lr_schedule=constant", "train.warmup_steps=3"])
    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    batch = _make_batch(cfg)
    s1, metrics = step(state, batch, jax.random.key(2))
    assert all(bool(jnp.isfinite(v)) for v in metrics.values())
    # lr(count=0) == 0: parameters unchanged on the first step
    _tree_allclose(s1.g_params, state.g_params, rtol=0, atol=0)
    s2, _ = step(s1, batch, jax.random.key(3))
    diff = sum(float(jnp.sum((x - y) ** 2)) for x, y in zip(
        jax.tree.leaves(s2.g_params), jax.tree.leaves(s1.g_params)))
    assert diff > 0  # lr(count=1) > 0: training has started


# ---------------------------------------------------------------------------
# Gradient accumulation
# ---------------------------------------------------------------------------


def test_grad_accum_matches_full_batch(tiny_config):
    """accum=2 must reproduce the full-batch step exactly (f32, no SN)."""
    cfg = apply_overrides(tiny_config, ["data.batch_size=8"])
    cfg_acc = apply_overrides(cfg, ["train.grad_accum=2"])

    state = create_state(cfg, jax.random.key(0))
    batch = _make_batch(cfg)

    full = make_train_step(cfg, donate=False)
    acc = make_train_step(cfg_acc, donate=False)

    s_full, m_full = full(state, batch, jax.random.key(2))
    s_acc, m_acc = acc(state, batch, jax.random.key(2))

    assert set(m_full) == set(m_acc)
    for k in m_full:
        np.testing.assert_allclose(float(m_full[k]), float(m_acc[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    _tree_allclose(s_acc.g_params, s_full.g_params)
    _tree_allclose(s_acc.d_params, s_full.d_params)


def test_grad_accum_with_sn_and_ema(tiny_config):
    """SN power iteration advances per micro-batch: not bit-equal to the
    full-batch step, but finite, training, and EMA-tracked."""
    cfg = apply_overrides(tiny_config, [
        "data.batch_size=8", "train.grad_accum=4",
        "model.spectral_norm=true", "train.g_ema_decay=0.9"])
    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    batch = _make_batch(cfg)
    new_state, metrics = step(state, batch, jax.random.key(2))
    assert all(bool(jnp.isfinite(v)) for v in metrics.values())
    diff = sum(float(jnp.sum((x - y) ** 2)) for x, y in zip(
        jax.tree.leaves(new_state.g_params), jax.tree.leaves(state.g_params)))
    assert diff > 0
    # EMA moved 10% of the way to the new params
    for e, p0, p1 in zip(jax.tree.leaves(new_state.g_ema),
                         jax.tree.leaves(state.g_params),
                         jax.tree.leaves(new_state.g_params)):
        np.testing.assert_allclose(np.asarray(e),
                                   0.9 * np.asarray(p0) + 0.1 * np.asarray(p1),
                                   rtol=1e-5, atol=1e-7)


def test_grad_accum_must_divide_batch(tiny_config):
    cfg = apply_overrides(tiny_config, ["data.batch_size=6",
                                        "train.grad_accum=4"])
    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    with pytest.raises(ValueError, match="grad_accum"):
        step(state, _make_batch(cfg), jax.random.key(2))


# ---------------------------------------------------------------------------
# Warm-start (train.init_from)
# ---------------------------------------------------------------------------


def _train_source_run(tiny_config, workdir, overrides=()):
    from gan_inpainting_tpu.train.loop import train

    cfg = apply_overrides(tiny_config, [
        f"train.workdir={workdir}", "train.steps=2",
        "train.checkpoint_every=2",
        "train.mesh.data=1",  # batch 4 < 8 virtual devices
        *overrides])
    state, _ = train(cfg, verbose=False)
    return cfg, state


def test_warm_start_grafts_params(tiny_config, tmp_path):
    src_cfg, src_state = _train_source_run(tiny_config, tmp_path / "src")

    dst_cfg = apply_overrides(tiny_config, [
        f"train.workdir={tmp_path / 'dst'}",
        f"train.init_from={tmp_path / 'src'}",
        "train.g_ema_decay=0.99",  # source did NOT track EMA
    ])
    fresh = create_state(dst_cfg, jax.random.key(7))
    state = warm_start(fresh, dst_cfg)

    _tree_allclose(state.g_params, src_state.g_params, rtol=0, atol=0)
    _tree_allclose(state.d_params, src_state.d_params, rtol=0, atol=0)
    # EMA seeded from the grafted params when the source has none
    _tree_allclose(state.g_ema, src_state.g_params, rtol=0, atol=0)
    # fresh fine-tune: step and optimizer states untouched
    assert int(state.step) == 0
    _tree_allclose(state.g_opt, fresh.g_opt, rtol=0, atol=0)


def test_warm_start_without_d(tiny_config, tmp_path):
    _train_source_run(tiny_config, tmp_path / "src")
    dst_cfg = apply_overrides(tiny_config, [
        f"train.init_from={tmp_path / 'src'}", "train.init_from_d=false"])
    fresh = create_state(dst_cfg, jax.random.key(7))
    state = warm_start(fresh, dst_cfg)
    _tree_allclose(state.d_params, fresh.d_params, rtol=0, atol=0)


def test_warm_start_architecture_mismatch_raises(tiny_config, tmp_path):
    _train_source_run(tiny_config, tmp_path / "src")
    dst_cfg = apply_overrides(tiny_config, [
        f"train.init_from={tmp_path / 'src'}", "model.base_features=16"])
    fresh = create_state(dst_cfg, jax.random.key(7))
    with pytest.raises(ValueError, match="init_from"):
        warm_start(fresh, dst_cfg)


def test_train_loop_warm_starts_and_resume_wins(tiny_config, tmp_path):
    """train() warm-starts a fresh workdir; its own checkpoint wins later."""
    from gan_inpainting_tpu.train.loop import train

    src_cfg, src_state = _train_source_run(tiny_config, tmp_path / "src")

    dst_cfg = apply_overrides(tiny_config, [
        f"train.workdir={tmp_path / 'dst'}",
        f"train.init_from={tmp_path / 'src'}",
        "train.mesh.data=1",
        "train.steps=1", "train.checkpoint_every=1"])
    state, _ = train(dst_cfg, verbose=False)
    assert int(state.step) == 1

    # second call resumes from dst's own checkpoint (init_from is ignored),
    # continuing to step 2 rather than restarting from the graft
    dst_cfg2 = dataclasses.replace(
        dst_cfg, train=dataclasses.replace(dst_cfg.train, steps=2))
    state2, _ = train(dst_cfg2, verbose=False)
    assert int(state2.step) == 2


# ---------------------------------------------------------------------------
# Gradient clipping
# ---------------------------------------------------------------------------


def test_grad_clip_bounds_update_norm(tiny_config):
    """With an absurdly small clip norm, the Adam input is the clipped
    gradient; the step still trains and params move less than unclipped."""
    cfg = apply_overrides(tiny_config, ["train.grad_clip=1e-4"])
    base = tiny_config
    # same init key -> identical params; only the optimizer state differs
    state = create_state(cfg, jax.random.key(0))
    state_free = create_state(base, jax.random.key(0))
    batch = _make_batch(base)

    s_clip, m_clip = make_train_step(cfg, donate=False)(
        state, batch, jax.random.key(2))
    s_free, m_free = make_train_step(base, donate=False)(
        state_free, batch, jax.random.key(2))

    assert all(bool(jnp.isfinite(v)) for v in m_clip.values())
    # D's loss is computed pre-update: identical across the two variants
    # (G's is not — it faces the differently-updated D)
    np.testing.assert_allclose(float(m_clip["d_loss"]),
                               float(m_free["d_loss"]), rtol=1e-6)

    def delta(a, b):
        return sum(float(jnp.sum((x - y) ** 2)) for x, y in zip(
            jax.tree.leaves(a), jax.tree.leaves(b)))

    moved_clip = delta(s_clip.g_params, state.g_params)
    moved_free = delta(s_free.g_params, state.g_params)
    assert 0 < moved_clip < moved_free


def test_warm_start_missing_source_raises(tiny_config, tmp_path):
    dst_cfg = apply_overrides(tiny_config, [
        f"train.init_from={tmp_path / 'nowhere'}"])
    fresh = create_state(dst_cfg, jax.random.key(7))
    with pytest.raises(FileNotFoundError, match="init_from"):
        warm_start(fresh, dst_cfg)
    assert not (tmp_path / "nowhere").exists()  # no dir-droppings
