"""Directory-batch inference (infer/batch_files.py; CLI infer on dirs)."""

import numpy as np
import pytest

import jax

from gan_inpainting_tpu.configs.base import apply_overrides
from gan_inpainting_tpu.infer.batch_files import inpaint_dir
from gan_inpainting_tpu.infer.inpaint import Inpainter
from gan_inpainting_tpu.train.state import create_state


@pytest.fixture()
def inpainter(tiny_config):
    cfg = apply_overrides(tiny_config, ["infer.batch_buckets=1,4",
                                        "infer.size_buckets=32,64"])
    state = create_state(cfg, jax.random.key(0))
    return Inpainter(cfg, state.g_params)


def _write_pair(img_dir, mask_dir, name, size, seed):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    q = size // 4
    mask = np.zeros((size, size), np.uint8)
    mask[q:-q, q:-q] = 255
    Image.fromarray(img).save(img_dir / f"{name}.png")
    Image.fromarray(mask).save(mask_dir / f"{name}.png")
    return img, mask > 127


def test_directory_batch_matches_composite(inpainter, tmp_path):
    img_dir = tmp_path / "img"
    mask_dir = tmp_path / "mask"
    out_dir = tmp_path / "out"
    img_dir.mkdir()
    mask_dir.mkdir()
    # 5 images at 32² (one dispatch bucket) + 1 at 48 (→ 64 bucket)
    pairs = {f"a{i}": _write_pair(img_dir, mask_dir, f"a{i}", 32, i)
             for i in range(5)}
    pairs["wide"] = _write_pair(img_dir, mask_dir, "wide", 48, 99)

    calls = []
    orig = inpainter.inpaint_batch

    def counting(images, masks):
        calls.append(images.shape)
        return orig(images, masks)

    inpainter.inpaint_batch = counting
    n = inpaint_dir(inpainter, img_dir, mask_dir, out_dir)
    assert n == 6
    # 5×32² at batch_size 4 → 2 dispatches; 48→64 bucket → 1 more
    assert len(calls) == 3

    from PIL import Image

    for name, (img, mask) in pairs.items():
        out = np.asarray(Image.open(out_dir / f"{name}.png"))
        assert out.shape == img.shape
        np.testing.assert_array_equal(out[~mask], img[~mask])
        assert (out[mask] != img[mask]).any()


def test_missing_mask_raises(inpainter, tmp_path):
    img_dir = tmp_path / "img"
    mask_dir = tmp_path / "mask"
    img_dir.mkdir()
    mask_dir.mkdir()
    _write_pair(img_dir, mask_dir, "ok", 32, 0)
    from PIL import Image

    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        img_dir / "orphan.png")
    with pytest.raises(FileNotFoundError, match="orphan"):
        inpaint_dir(inpainter, img_dir, mask_dir, tmp_path / "out")
