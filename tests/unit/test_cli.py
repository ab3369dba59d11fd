"""CLI surface tests (argument handling; heavy subcommands run on TPU in
the verify flow, not here)."""

import pytest

from gan_inpainting_tpu.cli import main


def test_configs_lists_all(capsys):
    assert main(["configs"]) == 0
    out = capsys.readouterr().out
    for name in ("celeba128_center", "celebahq256_freeform",
                 "places512_deepfill", "places512_sn_vgg", "serve_v4_8"):
        assert name in out


def test_unknown_config_rejected():
    with pytest.raises(SystemExit):
        main(["train", "--config", "nope"])


def test_bad_override_raises():
    with pytest.raises(KeyError):
        main(["train", "--config", "celeba128_center", "data.nope=1"])
