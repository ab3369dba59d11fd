"""Folder dataset iterator: split, threading, epoch coverage (SURVEY N2)."""

import numpy as np
import pytest

from gan_inpainting_tpu.configs.base import DataConfig
from gan_inpainting_tpu.data.loader import make_dataset

PIL = pytest.importorskip("PIL")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(40):
        arr = rng.integers(0, 255, (40, 52, 3), dtype=np.uint8)
        arr[0, 0] = (i, i, i)  # identifying pixel
        Image.fromarray(arr).save(root / f"im_{i:03d}.png")
    return root


@pytest.mark.parametrize("threads", [1, 3])
def test_folder_iter_shapes_and_epoch(image_dir, threads):
    cfg = DataConfig(dataset="folder", root=str(image_dir), image_size=32,
                     batch_size=4, loader_threads=threads)
    it = make_dataset(cfg, seed=0, split="train")
    batches = [next(it) for _ in range(9)]  # 38 train files → 9 batches/epoch
    for b in batches:
        assert b.shape == (4, 32, 32, 3) and b.dtype == np.uint8
    # iterator keeps producing across epochs
    assert next(it).shape == (4, 32, 32, 3)


def test_train_eval_split_disjoint(image_dir):
    cfg = DataConfig(dataset="folder", root=str(image_dir), image_size=32,
                     batch_size=2, loader_threads=1)
    # eval split takes every 20th file: 40 files → 2 eval, 38 train
    it_eval = make_dataset(cfg, seed=0, split="eval", batch_size=2)
    b = next(it_eval)
    assert b.shape == (2, 32, 32, 3)


def test_missing_dir_raises():
    cfg = DataConfig(dataset="folder", root="/nonexistent_xyz", image_size=32)
    with pytest.raises(FileNotFoundError):
        next(make_dataset(cfg, seed=0))
