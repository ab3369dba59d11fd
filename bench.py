"""Driver benchmark: prints ONE JSON line.

Headline metric: 256² masked-image inpainting throughput per chip on the
flagship (DeepFill-v2-style gated + contextual attention) generator —
BASELINE.json:2's first tracked metric. ``vs_baseline`` is relative to the
north-star target of 5,000 images/sec on a v4-8, i.e. 625 images/sec/chip
(BASELINE.json:5; the reference itself has no published numbers —
BASELINE.md).

BASELINE.json:2's second tracked metric — G+D train steps/sec — rides the
same JSON line under ``train_*`` keys (the reference default config:
128² center-mask, the shape BASELINE.json:7 describes).
"""

from __future__ import annotations

import json
import sys

BASELINE_PER_CHIP = 5000.0 / 8.0


def main() -> int:
    from gan_inpainting_tpu.bench import bench_infer, bench_train
    from gan_inpainting_tpu.configs.base import apply_overrides, get_config

    cfg = get_config("serve_v4_8")
    cfg = apply_overrides(cfg, ["train.mesh.data=-1", "train.mesh.model=1"])
    # batch 128 saturates a v5e chip (555 img/s vs 439 at b64, 551 at b256)
    result = bench_infer(cfg, batch=128, iters=10, warmup=2)
    out = {
        "metric": result["metric"],
        "value": round(result["value"], 2),
        "unit": result["unit"],
        "vs_baseline": round(result["value"] / BASELINE_PER_CHIP, 4),
    }

    # second tracked metric: G+D train steps/sec on the reference-default
    # 128² config (batch 32 — the round-1 measured operating point)
    tcfg = get_config("celeba128_center")
    tcfg = apply_overrides(tcfg, [
        "data.batch_size=32", "train.mesh.data=-1", "train.mesh.model=1"])
    try:
        tres = bench_train(tcfg, iters=10)
        out["train_metric"] = tres["metric"]
        out["train_value"] = round(tres["value"], 2)
        out["train_unit"] = tres["unit"]
        out["train_batch"] = tres["batch"]
    except Exception as exc:  # keep the headline metric even if train fails
        out["train_error"] = f"{type(exc).__name__}: {exc}"

    # third tracked metric (VERDICT r2 #3): the marquee 512² training
    # config (SN-PatchGAN + VGG perceptual/style + mixed-mask curriculum,
    # BASELINE.json:10), full G+D step at the config's batch size
    t512 = get_config("places512_sn_vgg")
    t512 = apply_overrides(t512, ["train.mesh.data=-1", "train.mesh.model=1"])
    try:
        tres = bench_train(t512, iters=5)
        out["train512_metric"] = "512² G+D train steps/sec (places512_sn_vgg)"
        out["train512_value"] = round(tres["value"], 2)
        out["train512_batch"] = tres["batch"]
    except Exception as exc:
        out["train512_error"] = f"{type(exc).__name__}: {exc}"

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
