"""Compare at-scale quality runs against VERDICT r3 #2's acceptance bar.

Reads each workdir's (or pinned artifact dir's) eval curve and reports,
per run: best/final PSNR + SSIM, the final-vs-best gap, the deepest
mid-run PSNR collapse (max drop from the running peak, the qual256 r3
pathology: 27.6 -> 23.1), and final SWD where the curve carries it.

    python tools/compare_runs.py /root/r4/qual256_stab /root/r4/qual256_base
"""

from __future__ import annotations

import json
import pathlib
import sys


def ssim_prefix_noise(path: pathlib.Path) -> float | None:
    """Pre-fix SSIM contamination band from the run's manifest, if any
    (curves written before the metrics/image.py Precision.HIGHEST fix —
    SURVEY §8e; VERDICT r4 #6)."""
    manifest = path / "manifest.json"
    if not manifest.exists():
        return None
    noise = json.loads(manifest.read_text()).get("ssim_prefix_noise")
    return float(noise) if noise is not None else None


def exact_ssim(path: pathlib.Path) -> float | None:
    """The manifest's TPU-reproduced exact-metric SSIM, if pinned."""
    manifest = path / "manifest.json"
    if not manifest.exists():
        return None
    repro = json.loads(manifest.read_text()).get("reproduced_from_npz", {})
    return repro.get("ssim")


def load_curve(path: pathlib.Path) -> list[dict]:
    """Eval points from a workdir's metrics.jsonl or a pinned
    eval_curve.jsonl (both use eval_-prefixed keys)."""
    src = path / "metrics.jsonl"
    if not src.exists():
        src = path / "eval_curve.jsonl"
    points = []
    with open(src) as f:
        for raw in f:
            row = json.loads(raw)
            if any(k.startswith("eval_") for k in row):
                points.append(row)
    return points


def summarize(points: list[dict], ssim_noise: float | None = None,
              ssim_exact: float | None = None) -> dict:
    best = max(points, key=lambda p: p["eval_psnr"])
    final = points[-1]
    peak, max_dip, dip_at = -1e9, 0.0, None
    for p in points:
        peak = max(peak, p["eval_psnr"])
        dip = peak - p["eval_psnr"]
        if dip > max_dip:
            max_dip, dip_at = dip, p["step"]
    out = {
        "evals": len(points),
        "best_psnr": round(best["eval_psnr"], 3),
        "best_ssim": round(best["eval_ssim"], 4),
        "best_step": best["step"],
        "final_psnr": round(final["eval_psnr"], 3),
        "final_ssim": round(final["eval_ssim"], 4),
        "final_step": final["step"],
        "final_vs_best_db": round(best["eval_psnr"] - final["eval_psnr"], 3),
        "max_mid_run_dip_db": round(max_dip, 3),
        "max_dip_at_step": dip_at,
    }
    if "eval_swd_avg" in final:
        out["final_swd_avg"] = round(final["eval_swd_avg"], 2)
        swd_best = min(p.get("eval_swd_avg", 1e9) for p in points)
        out["best_swd_avg"] = round(swd_best, 2)
    if ssim_noise is not None:
        # curve predates the SSIM precision fix: never table these columns
        # as exact (VERDICT r4 #6) — flag them and surface the pinned
        # exact-metric value when the manifest carries one
        out["best_ssim"] = f"{out['best_ssim']}±{ssim_noise:g} (pre-fix)"
        out["final_ssim"] = f"{out['final_ssim']}±{ssim_noise:g} (pre-fix)"
        if ssim_exact is not None:
            out["exact_ssim_reproduced"] = ssim_exact
    return out


def main() -> int:
    for arg in sys.argv[1:]:
        path = pathlib.Path(arg)
        s = summarize(load_curve(path), ssim_prefix_noise(path),
                      exact_ssim(path))
        print(f"{path.name}: {json.dumps(s)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
