"""Driver benchmark: prints ONE JSON line.

Headline metric: 256² masked-image inpainting throughput per chip on the
flagship (DeepFill-v2-style gated + contextual attention) generator —
BASELINE.json:2's first tracked metric. ``vs_baseline`` is relative to the
north-star target of 5,000 images/sec on a v4-8, i.e. 625 images/sec/chip
(BASELINE.json:5; the reference itself has no published numbers —
BASELINE.md).

BASELINE.json:2's second tracked metric — G+D train steps/sec — rides the
same JSON line under ``train_*`` keys (the reference default config:
128² center-mask, the shape BASELINE.json:7 describes). ``train512_*`` and
``serve512_*`` track the 512² marquee configs.

Regression guard (VERDICT r3 #6): every run compares its metrics against
the newest committed ``BENCH_r*.json``; a >3% drop in any tracked metric
prints a loud REGRESSION line to stderr and lands in the JSON under
``"regression"``. ``python bench.py --check`` additionally exits nonzero so
local/CI use fails hard; the bare driver invocation stays exit-0 so the
driver still records the artifact.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

BASELINE_PER_CHIP = 5000.0 / 8.0

# metrics the regression guard watches (all "higher is better")
GUARDED_KEYS = ("value", "train_value", "train512_value", "serve512_value")
REGRESSION_THRESHOLD = 0.03


def latest_committed_bench() -> tuple[str, dict] | None:
    """Newest BENCH_r*.json next to this file → (name, parsed metrics)."""
    root = os.path.dirname(os.path.abspath(__file__))
    paths = glob.glob(os.path.join(root, "BENCH_r*.json"))
    if not paths:
        return None
    def round_no(p):
        m = re.search(r"BENCH_r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1
    path = max(paths, key=round_no)
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    ref = data.get("parsed", data)
    return os.path.basename(path), (ref if isinstance(ref, dict) else {})


def check_regression(out: dict, ref: dict,
                     threshold: float = REGRESSION_THRESHOLD) -> list[str]:
    """Messages for every guarded metric that dropped >threshold vs ref."""
    msgs = []
    for key in GUARDED_KEYS:
        new, old = out.get(key), ref.get(key)
        if (isinstance(new, (int, float)) and isinstance(old, (int, float))
                and old > 0 and new < old * (1.0 - threshold)):
            msgs.append(f"REGRESSION {key}: {new:.2f} is "
                        f"{100 * (1 - new / old):.1f}% below the committed "
                        f"{old:.2f}")
    return msgs


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
        # one full lazy-R1 period per timed scan: the config fires R1 every
        # r1_interval-th step (starting at step 0), so a shorter window
        # would weight the grad-of-grad step at 1/iters instead of the
        # true amortized 1/interval
        t512_iters = max(5, t512.loss.r1_interval if t512.loss.r1_gamma > 0
                         else 0)
        tres = bench_train(t512, iters=t512_iters)
        out["train512_metric"] = "512² G+D train steps/sec (places512_sn_vgg)"
        out["train512_value"] = round(tres["value"], 2)
        out["train512_batch"] = tres["batch"]
    except Exception as exc:
        out["train512_error"] = f"{type(exc).__name__}: {exc}"

    # fourth tracked metric (VERDICT r3 #6): 512² serve throughput — r2's
    # 91.9 img/s headline previously had no guard at all
    s512 = get_config("serve_v4_8")
    s512 = apply_overrides(s512, [
        "data.image_size=512", "train.mesh.data=-1", "train.mesh.model=1"])
    try:
        sres = bench_infer(s512, batch=32, iters=5, warmup=2)
        out["serve512_metric"] = "512x512 inpaint images/sec/chip"
        out["serve512_value"] = round(sres["value"], 2)
        out["serve512_batch"] = 32
    except Exception as exc:
        out["serve512_error"] = f"{type(exc).__name__}: {exc}"

    ref = latest_committed_bench()
    regressions = check_regression(out, ref[1]) if ref else []
    if regressions:
        out["regression"] = regressions
        for msg in regressions:
            print(f"{msg} (vs {ref[0]})", file=sys.stderr)

    print(json.dumps(out))
    if "--check" in (sys.argv[1:]):
        return 1 if regressions else 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
