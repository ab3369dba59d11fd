"""Portable .npz generator export (io/export.py) + config_from_dict."""

import dataclasses
import json

import jax
import numpy as np
import pytest

from gan_inpainting_tpu.configs.base import (
    apply_overrides,
    config_from_dict,
    get_config,
    list_configs,
)
from gan_inpainting_tpu.io.export import (
    export_from_checkpoint,
    export_generator,
    load_generator,
)
from gan_inpainting_tpu.train.state import create_state


@pytest.mark.parametrize("name", list_configs())
def test_config_from_dict_round_trips(name):
    cfg = get_config(name)
    # via JSON like the artifact/checkpoint path (tuples become lists)
    d = json.loads(json.dumps(dataclasses.asdict(cfg)))
    assert config_from_dict(d) == cfg


def test_config_from_dict_ignores_unknown_fields(tiny_config):
    d = dataclasses.asdict(tiny_config)
    d["train"]["some_future_knob"] = 42
    d["another_section"] = {"x": 1}
    assert config_from_dict(d) == tiny_config


def test_export_round_trip(tiny_config, tmp_path):
    state = create_state(tiny_config, jax.random.key(0))
    path = tmp_path / "g.npz"
    export_generator(tiny_config, jax.device_get(state.g_params), str(path))

    cfg2, params2 = load_generator(str(path))
    assert cfg2 == tiny_config
    for a, b in zip(jax.tree.leaves(state.g_params),
                    jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_f16_storage_round_trip(tiny_config, tmp_path):
    # in-repo artifact tier (docs/artifacts): f32 leaves stored as f16,
    # widened back to f32 at load; ≤ f16 rounding error on every leaf
    state = create_state(tiny_config, jax.random.key(0))
    p32, p16 = tmp_path / "g32.npz", tmp_path / "g16.npz"
    params = jax.device_get(state.g_params)
    export_generator(tiny_config, params, str(p32))
    export_generator(tiny_config, params, str(p16), store_dtype="float16")
    assert p16.stat().st_size < 0.6 * p32.stat().st_size

    cfg2, params2 = load_generator(str(p16))
    assert cfg2 == tiny_config
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        b = np.asarray(b)
        assert b.dtype == np.asarray(a).dtype  # widened back
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-3, atol=1e-4)


def test_from_npz_matches_in_memory_inpainter(tiny_config, tmp_path):
    from gan_inpainting_tpu.infer.inpaint import Inpainter

    cfg = apply_overrides(tiny_config, ["infer.batch_buckets=2",
                                        "infer.size_buckets=32"])
    state = create_state(cfg, jax.random.key(0))
    path = tmp_path / "g.npz"
    export_generator(cfg, jax.device_get(state.g_params), str(path))

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    masks = np.zeros((2, 32, 32), np.float32)
    masks[:, 8:24, 8:24] = 1.0

    ref = Inpainter(cfg, state.g_params).inpaint_batch(imgs, masks)
    out = Inpainter.from_npz(str(path)).inpaint_batch(imgs, masks)
    np.testing.assert_array_equal(ref, out)


def test_export_from_checkpoint_and_cli(tiny_config, tmp_path):
    from gan_inpainting_tpu.cli import main
    from gan_inpainting_tpu.infer.inpaint import Inpainter
    from gan_inpainting_tpu.train.loop import train

    cfg = apply_overrides(tiny_config, [
        f"train.workdir={tmp_path / 'run'}", "train.steps=2",
        "train.checkpoint_every=2", "train.g_ema_decay=0.5",
        "train.mesh.data=1"])  # batch 4 < 8 virtual devices
    state, _ = train(cfg, verbose=False)

    path = tmp_path / "g.npz"
    export_from_checkpoint(cfg, str(path))
    cfg2, params = load_generator(str(path))
    # EMA tracked -> the artifact carries the EMA params
    for a, b in zip(jax.tree.leaves(state.g_ema), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # infer --weights round-trip through the CLI
    from PIL import Image

    img = tmp_path / "in.png"
    msk = tmp_path / "mask.png"
    out = tmp_path / "out.png"
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                    .astype(np.uint8)).save(img)
    m = np.zeros((32, 32), np.uint8)
    m[8:24, 8:24] = 255
    Image.fromarray(m).save(msk)
    rc = main(["infer", "--config", "celeba128_center",
               "--image", str(img), "--mask", str(msk),
               "--output", str(out), "--weights", str(path),
               "infer.size_buckets=32", "infer.batch_buckets=1"])
    assert rc == 0
    result = np.asarray(Image.open(out))
    # known pixels bit-exact (composite property)
    src = np.asarray(Image.open(img))
    keep = m == 0
    np.testing.assert_array_equal(result[keep], src[keep])


def test_load_generator_rejects_foreign_npz(tmp_path):
    path = tmp_path / "other.npz"
    np.savez(path, a=np.zeros(3))
    with pytest.raises(ValueError, match="export"):
        load_generator(str(path))


def test_eval_weights_cli(tiny_config, tmp_path):
    from gan_inpainting_tpu.cli import main
    from gan_inpainting_tpu.train.loop import train

    cfg = apply_overrides(tiny_config, [
        f"train.workdir={tmp_path / 'run'}", "train.steps=2",
        "train.checkpoint_every=2", "train.mesh.data=1"])
    train(cfg, verbose=False)
    path = tmp_path / "g.npz"
    export_from_checkpoint(cfg, str(path))
    rc = main(["eval", "--weights", str(path),
               "data.eval_batch_size=2", "data.num_eval_batches=1",
               "train.mesh.data=1"])
    assert rc == 0
