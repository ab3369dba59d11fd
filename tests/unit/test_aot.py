"""AOT serving artifacts (io/aot.py): export → load → run parity.

The deserialized jax.export programs must reproduce the live Inpainter's
outputs on the same platform, honor the bucketing/padding semantics
(composite property included), and fail loudly on platform or bucket
mismatches.
"""

import json

import jax
import numpy as np
import pytest

from gan_inpainting_tpu.configs.base import apply_overrides
from gan_inpainting_tpu.infer.inpaint import Inpainter
from gan_inpainting_tpu.io.aot import AotInpainter, export_serving
from gan_inpainting_tpu.train.state import create_state


@pytest.fixture()
def exported(tiny_config, tmp_path):
    cfg = apply_overrides(tiny_config, ["infer.batch_buckets=1,4",
                                        "infer.size_buckets=32",
                                        "train.mesh.data=1"])
    state = create_state(cfg, jax.random.key(0))
    outdir = tmp_path / "aot"
    manifest = export_serving(cfg, state.g_params, str(outdir))
    return cfg, state, outdir, manifest


def test_manifest_and_files(exported):
    cfg, _, outdir, manifest = exported
    assert manifest["platform"] == jax.default_backend()
    assert sorted(map(tuple, manifest["buckets"])) == [(1, 32), (4, 32)]
    for b, s in manifest["buckets"]:
        assert (outdir / f"fwd_{b}x{s}.bin").stat().st_size > 0
    assert (outdir / "params.npz").exists()
    # manifest survives a JSON round-trip with the config embedded
    loaded = json.loads((outdir / "manifest.json").read_text())
    assert loaded["config"]["data"]["image_size"] == cfg.data.image_size


def test_aot_matches_live_inpainter(exported):
    cfg, state, outdir, _ = exported
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
    masks = np.zeros((4, 32, 32), np.float32)
    masks[:, 10:20, 6:28] = 1.0

    live = Inpainter(cfg, state.g_params).inpaint_batch(imgs, masks)
    aot = AotInpainter(str(outdir)).inpaint_batch(imgs, masks)
    np.testing.assert_array_equal(live, aot)


def test_aot_bucketing_and_composite(exported):
    _, _, outdir, _ = exported
    aot = AotInpainter(str(outdir))
    rng = np.random.default_rng(1)
    # batch 3 pads into the 4-bucket; non-square 24×32 pads to 32²
    imgs = rng.integers(0, 255, (3, 24, 32, 3), dtype=np.uint8)
    masks = np.zeros((3, 24, 32), np.float32)
    masks[:, 4:16, 8:24] = 1.0
    out = aot.inpaint_batch(imgs, masks)
    assert out.shape == imgs.shape
    keep = masks[0] == 0
    for i in range(3):
        np.testing.assert_array_equal(out[i][keep], imgs[i][keep])

    single = aot(imgs[0], masks[0])
    np.testing.assert_array_equal(single, out[0])


def test_aot_rejects_oversize_and_wrong_platform(exported, tmp_path):
    _, _, outdir, _ = exported
    aot = AotInpainter(str(outdir))
    with pytest.raises(ValueError, match="bucket"):
        aot.inpaint_batch(np.zeros((8, 32, 32, 3), np.uint8),
                          np.zeros((8, 32, 32), np.float32))
    with pytest.raises(ValueError, match="bucket"):
        aot.inpaint_batch(np.zeros((1, 64, 64, 3), np.uint8),
                          np.zeros((1, 64, 64), np.float32))

    # doctor the manifest to claim another platform
    manifest = json.loads((outdir / "manifest.json").read_text())
    manifest["platform"] = "tpu" if jax.default_backend() != "tpu" else "cpu"
    (outdir / "manifest.json").write_text(json.dumps(manifest))
    with pytest.raises(ValueError, match="platform|exported for"):
        AotInpainter(str(outdir))


def test_aot_cli_and_service(tiny_config, tmp_path):
    from gan_inpainting_tpu.cli import main
    from gan_inpainting_tpu.infer.service import InpaintService
    from gan_inpainting_tpu.train.loop import train

    cfg = apply_overrides(tiny_config, [
        f"train.workdir={tmp_path / 'run'}", "train.steps=2",
        "train.checkpoint_every=2", "train.mesh.data=1"])
    train(cfg, verbose=False)

    outdir = tmp_path / "aot"
    rc = main(["export", "--config", "celeba128_center",
               "--output", str(outdir), "--aot",
               "--aot-buckets", "1x32,2x32",
               f"train.workdir={tmp_path / 'run'}", "data.image_size=32",
               "model.base_features=8", "model.disc_features=8",
               "model.disc_layers=2", "model.dtype_policy=f32",
               "train.mesh.data=1"])
    assert rc == 0

    aot = AotInpainter(str(outdir))
    assert aot.cfg.infer.batch_buckets == (1, 2)
    assert aot.cfg.infer.size_buckets == (32,)
    # the micro-batching service accepts an AotInpainter directly
    service = InpaintService(aot, max_wait_ms=1.0)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = service.inpaint(img, mask)
    keep = mask == 0
    np.testing.assert_array_equal(out[keep], img[keep])
    service.close()

    # infer --aot: single-file CLI path over the same artifact
    from PIL import Image

    Image.fromarray(img).save(tmp_path / "in.png")
    Image.fromarray((mask * 255).astype(np.uint8)).save(tmp_path / "m.png")
    rc = main(["infer", "--aot", str(outdir),
               "--image", str(tmp_path / "in.png"),
               "--mask", str(tmp_path / "m.png"),
               "--output", str(tmp_path / "out.png")])
    assert rc == 0
    cli_out = np.asarray(Image.open(tmp_path / "out.png"))
    np.testing.assert_array_equal(cli_out[keep], img[keep])
