"""Render eval-metric curve comparisons from pinned run artifacts.

Produces the docs PNG that accompanies the at-scale quality A/B tables
(SURVEY §8e): one panel per metric (PSNR, SWD_avg — different scales get
different panels, never a second y-axis), one line per run, shared x.

    python tools/plot_curves.py docs/artifacts/qual256_stab \
        docs/artifacts/qual256_base --out docs/curves_256_ab.png

Colors are the first two slots of the validated categorical palette the
dataviz guideline ships (blue #2a78d6, orange #eb6834 — fixed order,
CVD-checked as a pair by the guideline's own validator).
"""

from __future__ import annotations

import argparse
import json
import pathlib

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]  # fixed slot order
INK = "#3a3a38"
MUTED = "#8a8a86"
SURFACE = "#fcfcfb"


def load_curve(path: pathlib.Path) -> list[dict]:
    src = path / "eval_curve.jsonl"
    if not src.exists():
        src = path / "metrics.jsonl"
    points = []
    with open(src) as f:
        for raw in f:
            row = json.loads(raw)
            if any(k.startswith("eval_") for k in row):
                points.append(row)
    return points


def ssim_prefix_noise(path: pathlib.Path) -> float | None:
    """Pre-fix SSIM contamination band from the run's manifest, if any.

    Curves written before the metrics/image.py Precision.HIGHEST fix carry
    TPU conv-rounding noise in eval_ssim (up to ~0.06 at 512², ~0.005 at
    256² — SURVEY §8e); their manifests record it as ``ssim_prefix_noise``
    so no tool plots/tables those values as exact (VERDICT r4 #6).
    """
    manifest = path / "manifest.json"
    if not manifest.exists():
        return None
    noise = json.loads(manifest.read_text()).get("ssim_prefix_noise")
    return float(noise) if noise is not None else None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="workdirs or pinned artifact dirs")
    ap.add_argument("--out", default="docs/curves_256_ab.png")
    ap.add_argument("--title", default="256² quality A/B — eval curves")
    args = ap.parse_args()

    paths = {pathlib.Path(r).name: pathlib.Path(r) for r in args.runs}
    curves = {name: load_curve(p) for name, p in paths.items()}
    noise = {name: ssim_prefix_noise(p) for name, p in paths.items()}
    has_swd = any(any("eval_swd_avg" in p for p in pts) for pts in curves.values())
    has_ssim = any(any("eval_ssim" in p for p in pts) for pts in curves.values())

    panels = [("eval_psnr", "PSNR (dB)")]
    if has_ssim:
        panels.append(("eval_ssim", "SSIM"))
    if has_swd:
        panels.append(("eval_swd_avg", "SWD avg (lower is better)"))
    n_panels = len(panels)

    fig, axes = plt.subplots(n_panels, 1, figsize=(7.2, 3.0 * n_panels),
                             sharex=True, facecolor=SURFACE)
    axes = [axes] if n_panels == 1 else list(axes)

    for ax, (key, label) in zip(axes, panels):
        ax.set_facecolor(SURFACE)
        for i, (name, pts) in enumerate(curves.items()):
            xs = [p["step"] for p in pts if key in p]
            ys = [p[key] for p in pts if key in p]
            if not xs:
                continue
            color = SERIES[i % len(SERIES)]
            ax.plot(xs, ys, color=color, linewidth=2, label=name)
            end_label = f"{name}  {ys[-1]:.1f}"
            if key == "eval_ssim" and noise.get(name):
                # pre-fix curve: eval_ssim carries TPU conv-rounding noise
                # (SURVEY §8e) — shade the band, never show it as exact
                ax.fill_between(xs, [y - noise[name] for y in ys],
                                [y + noise[name] for y in ys],
                                color=color, alpha=0.18, linewidth=0)
                end_label = f"{name}  {ys[-1]:.2f} (pre-fix ±{noise[name]:g})"
            # selective direct label at the line end, in ink (not series color)
            ax.annotate(end_label, (xs[-1], ys[-1]),
                        textcoords="offset points", xytext=(6, 0),
                        fontsize=8, color=INK, va="center")
        if key == "eval_ssim" and any(noise.get(n) for n in curves):
            ax.set_title("SSIM — pre-fix TPU metric noise shaded "
                         "(exact values live in manifest.reproduced_from_npz)",
                         fontsize=8, color=MUTED, loc="left")
        ax.set_ylabel(label, fontsize=9, color=INK)
        ax.grid(True, color="#e8e8e6", linewidth=0.6)  # recessive grid
        for spine in ("top", "right"):
            ax.spines[spine].set_visible(False)
        for spine in ("left", "bottom"):
            ax.spines[spine].set_color(MUTED)
        ax.tick_params(colors=MUTED, labelsize=8)
        ax.margins(x=0.12)  # room for end labels

    axes[0].legend(frameon=False, fontsize=8, labelcolor=INK, loc="lower right")
    axes[-1].set_xlabel("train step", fontsize=9, color=INK)
    axes[0].set_title(args.title, fontsize=11, color=INK, loc="left")
    fig.tight_layout()
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=140, facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
