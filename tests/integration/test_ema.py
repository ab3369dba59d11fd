"""EMA generator params (train.g_ema_decay; Karras-practice eval weights)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_inpainting_tpu.configs.base import apply_overrides
from gan_inpainting_tpu.data.pipeline import make_train_batch
from gan_inpainting_tpu.data.synthetic import synthetic_batch_u8
from gan_inpainting_tpu.train.state import create_state, ema_generator_params
from gan_inpainting_tpu.train.step import make_train_step


def _make_batch(cfg, seed=0):
    imgs = synthetic_batch_u8(jax.random.key(seed), cfg.data.batch_size,
                              cfg.data.image_size)
    return make_train_batch(imgs, jax.random.key(seed + 1), cfg.mask)


def test_ema_off_by_default(tiny_config):
    state = create_state(tiny_config, jax.random.key(0))
    assert not jax.tree_util.tree_leaves(state.g_ema)
    # selector falls back to the raw params
    assert ema_generator_params(state) is state.g_params
    # and a step leaves the empty tree alone
    step = make_train_step(tiny_config, donate=False)
    new_state, _ = step(state, _make_batch(tiny_config), jax.random.key(1))
    assert not jax.tree_util.tree_leaves(new_state.g_ema)


def test_ema_tracks_recurrence(tiny_config):
    decay = 0.9
    cfg = apply_overrides(tiny_config, [f"train.g_ema_decay={decay}"])
    state = create_state(cfg, jax.random.key(0))
    # EMA initializes as a copy of the raw params
    for e, p in zip(jax.tree.leaves(state.g_ema),
                    jax.tree.leaves(state.g_params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    step = make_train_step(cfg, donate=False)
    expected = state.g_ema
    for i in range(3):
        new_state, _ = step(state, _make_batch(cfg, seed=i),
                            jax.random.key(10 + i))
        expected = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            expected, new_state.g_params)
        state = new_state
    for e, want in zip(jax.tree.leaves(state.g_ema),
                       jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)
    # EMA params are the eval/serving selection and differ from raw ones
    assert ema_generator_params(state) is state.g_ema
    diff = sum(float(jnp.sum((e - p) ** 2))
               for e, p in zip(jax.tree.leaves(state.g_ema),
                               jax.tree.leaves(state.g_params)))
    assert diff > 0


def test_restore_state_adopts_saved_layout(tiny_config, tmp_path):
    """Eval/infer restore must not require repeating train-time overrides
    of state-layout knobs (EMA / grad_clip / LR schedule): restore_state
    builds its template from the checkpoint's own saved config."""
    import pytest

    from gan_inpainting_tpu.io.checkpoint import CheckpointManager
    from gan_inpainting_tpu.train.state import restore_state

    train_cfg = apply_overrides(tiny_config, [
        f"train.workdir={tmp_path}", "train.g_ema_decay=0.9",
        "train.grad_clip=1.0", "train.lr_schedule=cosine",
        "train.warmup_steps=2"])
    state = create_state(train_cfg, jax.random.key(0))
    step = make_train_step(train_cfg, donate=False)
    state, _ = step(state, _make_batch(train_cfg), jax.random.key(1))
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(1, state, train_cfg)
    ckpt.wait()
    ckpt.close()

    # plain config (none of the overrides) locates and restores it anyway
    plain_cfg = apply_overrides(tiny_config, [f"train.workdir={tmp_path}"])
    restored = restore_state(plain_cfg)
    for a, b in zip(jax.tree.leaves(state.g_ema),
                    jax.tree.leaves(restored.g_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ema_generator_params(restored) is restored.g_ema

    with pytest.raises(FileNotFoundError):
        restore_state(apply_overrides(
            tiny_config, [f"train.workdir={tmp_path}/nowhere"]))


def test_ema_checkpoint_roundtrip(tiny_config, tmp_path):
    from gan_inpainting_tpu.io.checkpoint import CheckpointManager

    cfg = apply_overrides(tiny_config, ["train.g_ema_decay=0.99"])
    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    state, _ = step(state, _make_batch(cfg), jax.random.key(1))

    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(1, state, cfg)
    ckpt.wait()
    restored = ckpt.restore(create_state(cfg, jax.random.key(3)))
    for a, b in zip(jax.tree.leaves(state.g_ema),
                    jax.tree.leaves(restored.g_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()
