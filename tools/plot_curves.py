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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="workdirs or pinned artifact dirs")
    ap.add_argument("--out", default="docs/curves_256_ab.png")
    ap.add_argument("--title", default="256² quality A/B — eval curves")
    args = ap.parse_args()

    curves = {pathlib.Path(r).name: load_curve(pathlib.Path(r)) for r in args.runs}
    has_swd = any(any("eval_swd_avg" in p for p in pts) for pts in curves.values())
    n_panels = 2 if has_swd else 1

    fig, axes = plt.subplots(n_panels, 1, figsize=(7.2, 3.0 * n_panels),
                             sharex=True, facecolor=SURFACE)
    axes = [axes] if n_panels == 1 else list(axes)

    panels = [("eval_psnr", "PSNR (dB)")]
    if has_swd:
        panels.append(("eval_swd_avg", "SWD avg (lower is better)"))

    for ax, (key, label) in zip(axes, panels):
        ax.set_facecolor(SURFACE)
        for i, (name, pts) in enumerate(curves.items()):
            xs = [p["step"] for p in pts if key in p]
            ys = [p[key] for p in pts if key in p]
            if not xs:
                continue
            color = SERIES[i % len(SERIES)]
            ax.plot(xs, ys, color=color, linewidth=2, label=name)
            # selective direct label at the line end, in ink (not series color)
            ax.annotate(f"{name}  {ys[-1]:.1f}", (xs[-1], ys[-1]),
                        textcoords="offset points", xytext=(6, 0),
                        fontsize=8, color=INK, va="center")
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
