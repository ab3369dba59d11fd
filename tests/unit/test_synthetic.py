"""Procedural synthetic families (data/synthetic.py).

The "textured" family exists so the contextual-attention quality ablation
(VERDICT r4 #3) runs on a distribution where patch-copying matters: these
tests pin that it is deterministic, traced/static-shaped like the blobs
family, and actually texture-rich (an order of magnitude more
high-frequency energy than blobs — blobs are nearly conv-interpolatable).
"""

import numpy as np
import pytest

import jax

from gan_inpainting_tpu.configs.base import DataConfig
from gan_inpainting_tpu.data.loader import make_dataset
from gan_inpainting_tpu.data.synthetic import (
    synthetic_batch,
    synthetic_batch_u8,
)

SIZE = 64


@pytest.mark.parametrize("family", ["blobs", "textured"])
def test_shapes_range_and_determinism(family):
    a = synthetic_batch(jax.random.key(5), 4, SIZE, family)
    b = synthetic_batch(jax.random.key(5), 4, SIZE, family)
    assert a.shape == (4, SIZE, SIZE, 3) and a.dtype == np.float32
    assert float(a.min()) >= -1.0 and float(a.max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    u8 = synthetic_batch_u8(jax.random.key(5), 4, SIZE, family)
    assert u8.dtype == np.uint8 and u8.shape == a.shape


def test_families_are_distinct_distributions():
    blobs = np.asarray(synthetic_batch(jax.random.key(1), 4, SIZE, "blobs"))
    tex = np.asarray(synthetic_batch(jax.random.key(1), 4, SIZE, "textured"))
    assert not np.array_equal(blobs, tex)


def _hf_energy(x: np.ndarray) -> float:
    """Mean |Laplacian| — high-frequency content per pixel."""
    return float(np.abs(4 * x[:, 1:-1, 1:-1] - x[:, :-2, 1:-1]
                        - x[:, 2:, 1:-1] - x[:, 1:-1, :-2]
                        - x[:, 1:-1, 2:]).mean())


def test_textured_family_is_texture_rich():
    # measured at 256²: ~20.5 vs ~1.35 (u8 scale); require a conservative
    # 5x margin at the small test size
    key = jax.random.key(2)
    blobs = np.asarray(synthetic_batch_u8(key, 8, SIZE, "blobs"), np.float32)
    tex = np.asarray(synthetic_batch_u8(key, 8, SIZE, "textured"), np.float32)
    assert _hf_energy(tex) > 5.0 * _hf_energy(blobs)


def test_unknown_family_raises():
    with pytest.raises(ValueError, match="unknown synthetic family"):
        synthetic_batch(jax.random.key(0), 2, SIZE, "noise")


def test_loader_routes_family_knob():
    base = dict(image_size=SIZE, batch_size=2, synthetic_size=8)
    it_blobs = make_dataset(DataConfig(**base), seed=0)
    it_tex = make_dataset(
        DataConfig(synthetic_family="textured", **base), seed=0)
    b, t = np.asarray(next(it_blobs)), np.asarray(next(it_tex))
    assert b.shape == t.shape and not np.array_equal(b, t)
    # same key derivation within a family: a fresh iterator reproduces it
    t2 = np.asarray(next(make_dataset(
        DataConfig(synthetic_family="textured", **base), seed=0)))
    np.testing.assert_array_equal(t, t2)
