"""Pinned-parity regression (VERDICT r1 next #8): the fixed-seed eval
fingerprint must match parity_pinned.json. Only the fast 128² config runs
in CI; the full five-config sweep is ``python -m gan_inpainting_tpu parity``.
"""

from gan_inpainting_tpu.train.parity import PINNED_PATH, check_parity, run_parity


def test_pinned_file_exists_and_covers_all_configs():
    import json

    from gan_inpainting_tpu.configs.base import list_configs

    pinned = json.loads(PINNED_PATH.read_text())["cpu"]
    for name in list_configs():
        assert name in pinned or any(k.startswith(f"{name}@")
                                     for k in pinned), name
        entry = next(v for k, v in pinned.items() if k.split("@")[0] == name)
        assert {"psnr", "ssim"} <= set(entry)


def test_celeba128_fingerprint_matches_pinned():
    results = run_parity(["celeba128_center"])
    problems = check_parity(results)
    assert not problems, problems
