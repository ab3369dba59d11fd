"""Decode-once uint8 cache tier of the folder loader (VERDICT r2 #6)."""

import numpy as np
import pytest
from PIL import Image

from gan_inpainting_tpu.configs.base import DataConfig
from gan_inpainting_tpu.data.loader import (
    _cache_wanted,
    _folder_iter,
    make_dataset,
)


@pytest.fixture()
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(40):
        arr = rng.integers(0, 255, (48, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"im_{i:03d}.png")
    return d


def _cfg(image_dir, tmp_path, cache):
    return DataConfig(dataset="folder", root=str(image_dir), image_size=32,
                      batch_size=8, loader_threads=1, loader_cache=cache,
                      loader_cache_dir=str(tmp_path / "cache"))


def test_cache_auto_thresholds():
    assert _cache_wanted(DataConfig(image_size=128))
    assert _cache_wanted(DataConfig(image_size=256))
    assert not _cache_wanted(DataConfig(image_size=512))
    assert _cache_wanted(DataConfig(image_size=512, loader_cache="on"))
    assert not _cache_wanted(DataConfig(image_size=128, loader_cache="off"))
    with pytest.raises(ValueError, match="loader_cache"):
        _cache_wanted(DataConfig(loader_cache="bogus"))


def test_cached_batches_match_decoded(image_dir, tmp_path):
    # same seed + 1 decoder thread → identical batch stream either way
    it_raw = _folder_iter(_cfg(image_dir, tmp_path, "off"), seed=3,
                          batch_size=8, split="train", size=32)
    it_cached = _folder_iter(_cfg(image_dir, tmp_path, "on"), seed=3,
                             batch_size=8, split="train", size=32)
    for _ in range(6):  # past one epoch (38 train files → 4 batches/epoch)
        a, b = next(it_raw), next(it_cached)
        np.testing.assert_array_equal(a, b)
        assert b.shape == (8, 32, 32, 3) and b.dtype == np.uint8


def test_cache_reused_and_rebuilt_on_change(image_dir, tmp_path):
    cfg = _cfg(image_dir, tmp_path, "on")
    next(_folder_iter(cfg, seed=0, batch_size=8, split="train", size=32))
    cache_dir = tmp_path / "cache"
    first = sorted(p.name for p in cache_dir.glob("*.u8"))
    assert len(first) == 1
    next(_folder_iter(cfg, seed=1, batch_size=8, split="train", size=32))
    assert sorted(p.name for p in cache_dir.glob("*.u8")) == first
    # mutate a TRAIN file (index 1; index-multiple-of-20 files are eval) →
    # new mtime in the manifest → different digest → second cache file
    arr = np.zeros((48, 40, 3), np.uint8)
    Image.fromarray(arr).save(image_dir / "im_001.png")
    next(_folder_iter(cfg, seed=0, batch_size=8, split="train", size=32))
    assert len(list(cache_dir.glob("*.u8"))) == 2


def test_eval_split_cached_is_disjoint(image_dir, tmp_path):
    cfg = _cfg(image_dir, tmp_path, "on")
    tr = next(make_dataset(cfg, seed=0, split="train", batch_size=8))
    ev = next(make_dataset(cfg, seed=0, split="eval", batch_size=2))
    assert tr.shape[0] == 8 and ev.shape[0] == 2
    # eval images (every 20th file) never appear in the train stream
    tr_set = {a.tobytes() for a in tr}
    assert all(e.tobytes() not in tr_set for e in ev)
