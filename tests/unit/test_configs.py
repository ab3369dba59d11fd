"""Config registry + override tests."""

import dataclasses

import pytest

from gan_inpainting_tpu.configs.base import (
    apply_overrides,
    get_config,
    list_configs,
)


def test_named_configs():
    """The five BASELINE.json:7-11 configs verbatim, plus the round-2
    partial-conv (Liu et al.) variant."""
    names = list_configs()
    assert names == sorted([
        "celeba128_center", "celebahq256_freeform", "places512_deepfill",
        "places512_sn_vgg", "serve_v4_8", "partialconv256"])
    pc = get_config("partialconv256")
    assert pc.model.conv_kind == "partial" and pc.loss.gan_weight == 0.0


def test_config_contents_match_baseline():
    c1 = get_config("celeba128_center")
    assert c1.data.image_size == 128 and c1.mask.kind == "center"
    c3 = get_config("places512_deepfill")
    assert (c3.data.image_size == 512 and c3.model.use_attention
            and c3.model.conv_kind == "gated")
    c4 = get_config("places512_sn_vgg")
    assert (c4.model.spectral_norm and c4.loss.perceptual_weight > 0
            and c4.mask.kind == "mixed")


def test_quality_recipes_baked():
    """The named configs must construct the training run the quoted quality
    evidence was produced with (VERDICT r3 missing #3): EMA 0.999 on the
    512² configs (SURVEY §8d) and EMA 0.999 + R1 0.1 on celebahq256_freeform
    (round-4 A/B, SURVEY §8e). A silent revert to 0 reproduces the measured
    mid-run collapse."""
    c2 = get_config("celebahq256_freeform")
    assert c2.train.g_ema_decay == 0.999
    assert c2.loss.r1_gamma == 0.1
    assert "swd" in c2.eval.metrics
    for name in ("places512_deepfill", "places512_sn_vgg"):
        c = get_config(name)
        assert c.train.g_ema_decay == 0.999
        # lazy R1: the r4 512² rerun turned the 33.25 dB plateau into a
        # monotone climb at zero throughput cost (SURVEY §8e)
        assert c.loss.r1_gamma == 0.1 and c.loss.r1_interval == 16


def test_overrides():
    cfg = get_config("celeba128_center")
    out = apply_overrides(cfg, ["data.batch_size=3", "loss.l1_weight=2.5",
                                "model.spectral_norm=true",
                                "train.mesh.model=2",
                                "infer.size_buckets=64,128"])
    assert out.data.batch_size == 3
    assert out.loss.l1_weight == 2.5
    assert out.model.spectral_norm is True
    assert out.train.mesh.model == 2
    assert out.infer.size_buckets == (64, 128)
    # original untouched (frozen dataclasses)
    assert cfg.data.batch_size == 16


def test_bad_override_raises():
    cfg = get_config("celeba128_center")
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["data.nope=1"])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["no_equals_sign"])


def test_configs_are_frozen():
    cfg = get_config("celeba128_center")
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.data.batch_size = 1  # type: ignore[misc]
