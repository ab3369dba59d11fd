"""Checkpoint/resume tests (SURVEY.md §4/§5): restore is bit-faithful and
resume reproduces the uninterrupted run (the fault-injection contract)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_inpainting_tpu.data.pipeline import make_train_batch
from gan_inpainting_tpu.data.synthetic import synthetic_batch_u8
from gan_inpainting_tpu.io.checkpoint import CheckpointManager
from gan_inpainting_tpu.train.state import create_state
from gan_inpainting_tpu.train.step import make_train_step


def _batch(cfg, seed):
    imgs = synthetic_batch_u8(jax.random.key(seed), cfg.data.batch_size,
                              cfg.data.image_size)
    return make_train_batch(imgs, jax.random.key(seed + 100), cfg.mask)


def test_save_restore_roundtrip(tiny_config, tmp_path):
    cfg = tiny_config
    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    state, _ = step(state, _batch(cfg, 0), jax.random.key(1))

    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    mgr.save(1, state, cfg)
    mgr.wait()

    template = create_state(cfg, jax.random.key(42))  # different init
    restored = mgr.restore(template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert mgr.restore_config()["name"] == cfg.name


def test_resume_reproduces_uninterrupted_run(tiny_config, tmp_path):
    cfg = tiny_config
    step = make_train_step(cfg, donate=False)

    # uninterrupted: 4 steps
    s_full = create_state(cfg, jax.random.key(0))
    for i in range(4):
        s_full, m_full = step(s_full, _batch(cfg, i), jax.random.key(i))

    # interrupted at 2, checkpointed, "crashed", resumed for 2 more
    s_half = create_state(cfg, jax.random.key(0))
    for i in range(2):
        s_half, _ = step(s_half, _batch(cfg, i), jax.random.key(i))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(2, s_half, cfg)
    mgr.wait()
    del s_half

    resumed = mgr.restore(create_state(cfg, jax.random.key(9)))
    for i in range(2, 4):
        resumed, m_resumed = step(resumed, _batch(cfg, i), jax.random.key(i))

    np.testing.assert_allclose(float(m_resumed["g_loss"]),
                               float(m_full["g_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_full.g_params),
                    jax.tree.leaves(resumed.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
