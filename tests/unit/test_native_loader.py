"""Native C++ JPEG loader vs the PIL path."""

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from gan_inpainting_tpu.data import native_loader
from gan_inpainting_tpu.data.loader import _load_batch, _load_image


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    for i, (h, w) in enumerate([(90, 120), (64, 64), (200, 150)]):
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img{i}.jpg", quality=95)
    return root


def test_native_loader_builds_and_decodes(jpeg_dir):
    if not native_loader.available():
        pytest.skip("native loader toolchain unavailable")
    paths = sorted(str(p) for p in jpeg_dir.glob("*.jpg"))
    batch, ok = native_loader.load_batch(paths, 48)
    assert batch.shape == (3, 48, 48, 3) and batch.dtype == np.uint8
    assert ok.all()
    # decoded something real, not zeros
    assert batch.std() > 10


def test_native_close_to_pil(jpeg_dir):
    if not native_loader.available():
        pytest.skip("native loader toolchain unavailable")
    paths = sorted(jpeg_dir.glob("*.jpg"))
    native, ok = native_loader.load_batch([str(p) for p in paths], 32)
    assert ok.all()
    pil = np.stack([_load_image(p, 32) for p in paths])
    # different resamplers (area vs bilinear) — require close agreement
    diff = np.abs(native.astype(int) - pil.astype(int)).mean()
    assert diff < 12.0, diff


def test_native_handles_corrupt_file(tmp_path, jpeg_dir):
    if not native_loader.available():
        pytest.skip("native loader toolchain unavailable")
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg at all")
    batch, ok = native_loader.load_batch(
        [str(next(jpeg_dir.glob('*.jpg'))), str(bad)], 32)
    assert ok[0] and not ok[1]
    assert batch[1].sum() == 0  # failed slot zeroed


def test_load_batch_falls_back_to_pil_for_png(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (50, 50, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(p)
    batch = _load_batch([p, p], 32)
    assert batch.shape == (2, 32, 32, 3)
