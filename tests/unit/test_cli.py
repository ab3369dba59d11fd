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


def test_mask_subcommand(tmp_path):
    from gan_inpainting_tpu.cli import main

    import numpy as np
    from PIL import Image

    out = tmp_path / "m.png"
    rc = main(["mask", "--config", "celeba128_center",
               "--output", str(out), "data.image_size=64"])
    assert rc == 0
    m = np.asarray(Image.open(out))
    assert m.shape == (64, 64) and set(np.unique(m)) <= {0, 255}
    assert (m == 255).any() and (m == 0).any()

    outdir = tmp_path / "masks"
    rc = main(["mask", "--config", "celebahq256_freeform", "--n", "3",
               "--seed", "7", "--output", str(outdir),
               "data.image_size=64"])
    assert rc == 0
    assert len(list(outdir.glob("mask_*.png"))) == 3
