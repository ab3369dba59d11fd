"""Quality-parity harness (VERDICT r1 next #8; BASELINE.json:5 parity gate).

The north-star quality gate is "PSNR/SSIM within ±0.1 dB of the reference
CPU/GPU path" — unmeasurable until a reference checkout or its trained
checkpoints exist (BASELINE.md). This module stages everything needed for
that day, and gives rounds a regression fingerprint meanwhile:

* :func:`run_parity` evaluates every named config with fixed-seed params on
  the fixed-seed synthetic eval stream and returns pinned PSNR/SSIM numbers.
  Deterministic by construction (same seeds, same synthetic data), so any
  drift is a code-behavior change — the numbers are diffed against the
  checked-in ``parity_pinned.json`` by tests and the ``parity`` CLI.
* When reference checkpoints appear: convert weights, point the configs at
  them, re-run with ``--update`` and compare against the reference's
  published eval — same entry point, no new machinery.
"""

from __future__ import annotations

import json
import pathlib

import jax

PINNED_PATH = pathlib.Path(__file__).resolve().parents[2] / "parity_pinned.json"

# eval shrunk to keep the harness fast on CPU; fixed here so the pinned
# numbers are comparable across rounds
_EVAL_OVERRIDES = [
    "data.eval_batch_size=4",
    "data.num_eval_batches=2",
]


def run_parity(configs: list[str] | None = None,
               max_image_size: int | None = None) -> dict:
    """Pinned PSNR/SSIM per named config, fixed seeds end to end.

    ``max_image_size`` optionally caps image size (CPU runs of the 512²
    configs) — capped entries are recorded under a size-suffixed key so
    they never collide with full-size pins.
    """
    from gan_inpainting_tpu.configs.base import (
        apply_overrides,
        get_config,
        list_configs,
    )
    from gan_inpainting_tpu.train.evaluate import evaluate
    from gan_inpainting_tpu.train.state import create_state

    results: dict[str, dict] = {}
    for name in configs or list_configs():
        cfg = apply_overrides(get_config(name), _EVAL_OVERRIDES)
        key = name
        if max_image_size and cfg.data.image_size > max_image_size:
            cfg = apply_overrides(
                cfg, [f"data.image_size={max_image_size}"])
            key = f"{name}@{max_image_size}"
        state = create_state(cfg, jax.random.key(0))
        metrics = evaluate(cfg, state.g_params, seed=0)
        results[key] = {k: round(float(v), 4) for k, v in metrics.items()}
    return results


def check_parity(results: dict, pinned_path=PINNED_PATH,
                 tol_db: float = 0.1) -> list[str]:
    """Compare results against the pinned file; returns drift messages.

    Pins are namespaced by jax backend (bf16 numerics differ slightly
    between CPU emulation and real TPU — measured 0.005 SSIM at 128²).
    The same-platform tolerance is the BASELINE.json:5 gate (±0.1 dB on
    PSNR; SSIM gets a proportionate 0.005 absolute band).
    """
    pinned_all = json.loads(pathlib.Path(pinned_path).read_text())
    platform = jax.default_backend()
    pinned = pinned_all.get(platform)
    if pinned is None:
        return [f"no pins for platform {platform!r}; run "
                f"`gan_inpainting_tpu parity --update` on it once"]
    problems = []
    for name, metrics in results.items():
        if name not in pinned:
            problems.append(f"{name}: no pinned entry")
            continue
        for metric, value in metrics.items():
            want = pinned[name].get(metric)
            if want is None:
                problems.append(f"{name}.{metric}: not pinned")
                continue
            if metric == "psnr":
                tol = tol_db
            elif metric.startswith("swd"):
                # SWD values sit in the tens-to-hundreds ×1e3 range; a 2%
                # relative band is the proportionate analogue of ±0.1 dB
                tol = max(0.02 * abs(want), 0.1)
            else:
                tol = 0.005
            if abs(value - want) > tol:
                problems.append(
                    f"{name}.{metric}: {value} vs pinned {want} "
                    f"(tol {tol})")
    return problems
