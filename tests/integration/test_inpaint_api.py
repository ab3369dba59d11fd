"""inpaint(image, mask) API-contract tests (SURVEY.md §4 "API contract")."""

import jax
import numpy as np
import pytest

from gan_inpainting_tpu.configs.base import apply_overrides
from gan_inpainting_tpu.infer.inpaint import Inpainter
from gan_inpainting_tpu.train.state import create_state


@pytest.fixture()
def inpainter(tiny_config):
    cfg = apply_overrides(tiny_config, ["infer.batch_buckets=1,4",
                                        "infer.size_buckets=32,64"])
    state = create_state(cfg, jax.random.key(0))
    return Inpainter(cfg, state.g_params)


def _image(seed, size=32):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (size, size, 3), dtype=np.uint8)


def test_known_pixels_preserved_exactly(inpainter):
    img = _image(0)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = inpainter(img, mask)
    assert out.shape == img.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out[mask == 0], img[mask == 0])


def test_hole_pixels_are_generated(inpainter):
    img = _image(1)
    mask = np.zeros((32, 32), np.float32)
    mask[4:28, 4:28] = 1.0
    out = inpainter(img, mask)
    # untrained network: practically impossible to reproduce the hole exactly
    assert (out[mask == 1] != img[mask == 1]).any()


def test_mask_channel_dim_optional(inpainter):
    img = _image(2)
    mask = np.zeros((32, 32, 1), np.float32)
    mask[10:20, 10:20] = 1.0
    out = inpainter(img, mask)
    assert out.shape == img.shape


def test_batched_api(inpainter):
    imgs = np.stack([_image(i) for i in range(3)])
    masks = np.zeros((3, 32, 32), np.float32)
    masks[:, 8:24, 8:24] = 1.0
    out = inpainter.inpaint_batch(imgs, masks)
    assert out.shape == imgs.shape
    np.testing.assert_array_equal(out[masks == 0], imgs[masks == 0])


def test_size_bucketing_pads_and_crops(inpainter):
    # 48 is between buckets 32 and 64 → padded to 64, cropped back
    img = _image(3, size=48)
    mask = np.zeros((48, 48), np.float32)
    mask[10:30, 10:30] = 1.0
    out = inpainter(img, mask)
    assert out.shape == (48, 48, 3)
    np.testing.assert_array_equal(out[mask == 0], img[mask == 0])


def test_oversize_raises(inpainter):
    img = _image(4, size=128)
    mask = np.zeros((128, 128), np.float32)
    with pytest.raises(ValueError, match="bucket"):
        inpainter(img, mask)


def test_non_square_inputs_pad_and_crop(inpainter):
    """Arbitrary photo aspect ratios: pad H/W independently to the square
    bucket, crop back; known pixels stay bit-exact (VERDICT r1 missing #6)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (24, 40, 3), dtype=np.uint8)  # landscape
    mask = np.zeros((24, 40), np.float32)
    mask[6:18, 10:30] = 1.0
    out = inpainter(img, mask)
    assert out.shape == img.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out[mask == 0], img[mask == 0])
    assert (out[mask == 1] != img[mask == 1]).any()

    img_p = rng.integers(0, 255, (40, 24, 3), dtype=np.uint8)  # portrait
    mask_p = np.zeros((40, 24), np.float32)
    mask_p[10:30, 6:18] = 1.0
    out_p = inpainter(img_p, mask_p)
    assert out_p.shape == img_p.shape
    np.testing.assert_array_equal(out_p[mask_p == 0], img_p[mask_p == 0])


def test_fuse_upsample_unfused_above_size_threshold(tiny_config):
    """Serving flips the fused-upsample decoder OFF per size bucket above
    infer.fuse_upsample_max_size (measured: fused wins at 256², loses at
    512² — SURVEY §8f / tools/sweep_serve512.py). The formulation is
    exact-math parameter-compatible, so outputs must agree between an
    always-unfused Inpainter and the size-dependent one at the big bucket."""
    cfg = apply_overrides(tiny_config, [
        "infer.batch_buckets=1,4", "infer.size_buckets=32,64",
        "model.fuse_upsample=true", "infer.fuse_upsample_max_size=32"])
    state = create_state(cfg, jax.random.key(0))
    inp = Inpainter(cfg, state.g_params)

    assert inp._cfg_for_size(32).model.fuse_upsample is True
    assert inp._cfg_for_size(64).model.fuse_upsample is False

    img = _image(11, size=64)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    out = inp(img, mask)

    cfg_unfused = apply_overrides(cfg, ["model.fuse_upsample=false"])
    ref = Inpainter(cfg_unfused, state.g_params)(img, mask)
    # identical formulation at this bucket → identical uint8 output
    np.testing.assert_array_equal(out, ref)
