"""Mask synthesis tests (SURVEY.md §4 unit tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_inpainting_tpu.configs.base import MaskConfig
from gan_inpainting_tpu.data.masks import (
    center_mask,
    freeform_mask,
    random_mask_batch,
)


def test_center_mask_exact():
    m = center_mask(jax.random.key(0), 64, 64, frac=0.5)
    assert m.shape == (64, 64, 1)
    np.testing.assert_array_equal(np.unique(np.asarray(m)), [0.0, 1.0])
    # 32x32 hole exactly centered
    assert float(m.sum()) == 32 * 32
    assert float(m[16:48, 16:48].sum()) == 32 * 32


def test_center_mask_jitter_inside_bounds():
    for seed in range(5):
        m = np.asarray(center_mask(jax.random.key(seed), 48, 48, 0.25,
                                   jitter=True))
        assert m.sum() == 12 * 12
        ys, xs = np.where(m[..., 0] > 0)
        assert ys.max() - ys.min() == 11 and xs.max() - xs.min() == 11


@pytest.mark.parametrize("hw", [(64, 64), (64, 96)])
def test_freeform_mask_properties(hw):
    cfg = MaskConfig(kind="freeform", max_strokes=6, max_segments=6,
                     min_width=4.0, max_width=12.0, max_step=20.0)
    h, w = hw
    coverages = []
    for seed in range(8):
        m = np.asarray(freeform_mask(jax.random.key(seed), h, w, cfg))
        assert m.shape == (h, w, 1)
        assert set(np.unique(m)).issubset({0.0, 1.0})
        coverages.append(m.mean())
    coverages = np.array(coverages)
    # strokes must actually draw something, but never flood the image
    assert (coverages > 0).all()
    assert (coverages < 0.8).all()
    assert coverages.std() > 0  # randomness across seeds


def test_freeform_deterministic_under_key():
    cfg = MaskConfig(kind="freeform")
    a = freeform_mask(jax.random.key(3), 64, 64, cfg)
    b = freeform_mask(jax.random.key(3), 64, 64, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mask_batch_and_mixed():
    cfg = MaskConfig(kind="mixed", freeform_prob=0.5)
    batch = random_mask_batch(jax.random.key(0), 16, 32, 32, cfg)
    assert batch.shape == (16, 32, 32, 1)
    center_area = (32 * 32) * 0.25
    areas = np.asarray(batch.sum(axis=(1, 2, 3)))
    # with 16 samples at p=0.5 we should see both families
    n_center = int((areas == center_area).sum())
    assert 0 < n_center < 16


def test_masks_traceable_under_jit():
    cfg = MaskConfig(kind="freeform")
    f = jax.jit(lambda k: freeform_mask(k, 32, 32, cfg))
    m = f(jax.random.key(0))
    assert m.shape == (32, 32, 1)


def test_curriculum_ramps_difficulty():
    cfg = MaskConfig(kind="mixed", freeform_prob=0.5, curriculum_steps=100,
                     curriculum_start_scale=0.4, center_frac=0.5)
    from gan_inpainting_tpu.data.masks import random_mask

    def area(progress, kind):
        c = MaskConfig(kind=kind, curriculum_steps=100,
                       curriculum_start_scale=0.4, center_frac=0.5)
        ms = [random_mask(jax.random.key(s), 64, 64, c, progress)
              for s in range(4)]
        return float(jnp.stack(ms).mean())

    for kind in ("center", "freeform"):
        early, late = area(0.0, kind), area(1.0, kind)
        assert early < late, (kind, early, late)

    # progress=1.0 must reproduce the non-curriculum mask exactly
    base = random_mask(jax.random.key(0), 64, 64,
                       MaskConfig(kind="freeform"))
    curr = random_mask(jax.random.key(0), 64, 64,
                       MaskConfig(kind="freeform"), 1.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(curr))


def test_curriculum_traceable_progress():
    cfg = MaskConfig(kind="mixed", curriculum_steps=10)
    f = jax.jit(lambda k, p: freeform_mask(k, 32, 32, cfg, p))
    m = f(jax.random.key(0), jnp.float32(0.3))
    assert m.shape == (32, 32, 1)
