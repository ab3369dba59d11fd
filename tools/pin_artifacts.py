"""Pin reproducible quality artifacts into the repo (VERDICT r3 #3).

For each finished at-scale run this:

1. extracts the eval-metric curve from the workdir's ``metrics.jsonl``
   into a compact in-repo JSONL (a few KB — the curves SURVEY §8 quotes);
2. exports the best-PSNR generator to a portable ``.npz`` artifact
   (EMA params when tracked) under ``docs/artifacts/<name>/``;
3. re-evaluates the exported artifact through the REAL ``eval --weights``
   path and records the reproduced PSNR/SSIM/SWD next to the run's own
   best eval — proving ``eval --weights`` / ``infer --weights`` reproduce
   the quoted numbers from a fresh clone without training;
4. writes a manifest with the sha256 of the npz and both metric sets.

Run on the platform the numbers are quoted from (TPU):
    python tools/pin_artifacts.py --name qual256_stab \
        --workdir /root/r4/qual256_stab --config celebahq256_freeform \
        --overrides train.g_ema_decay=0.999 loss.r1_gamma=0.1
"""

from __future__ import annotations

import argparse
import hashlib
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]


def extract_eval_curve(workdir: pathlib.Path, out_path: pathlib.Path) -> int:
    """Eval-metric lines (those carrying psnr) from metrics.jsonl."""
    lines = []
    with open(workdir / "metrics.jsonl") as f:
        for raw in f:
            row = json.loads(raw)
            keys = [k for k in row if k.startswith("eval_")]
            if keys:
                kept = {"step": row["step"]}
                kept.update({k: round(float(row[k]), 4) for k in keys})
                lines.append(json.dumps(kept))
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text("\n".join(lines) + "\n")
    return len(lines)


def pin(name: str, workdir: str, config: str, overrides: list[str],
        out_root: pathlib.Path | None = None,
        no_reproduce: bool = False) -> dict:
    """Pin one run's artifacts; returns the manifest (also written to
    ``<out_root>/<name>/manifest.json``). ``out_root`` defaults to the
    in-repo ``docs/artifacts/``; tests point it at a tmpdir."""
    workdir = pathlib.Path(workdir)
    out_dir = (out_root or REPO / "docs" / "artifacts") / name
    out_dir.mkdir(parents=True, exist_ok=True)

    n = extract_eval_curve(workdir, out_dir / "eval_curve.jsonl")
    print(f"[pin] {n} eval points -> {out_dir / 'eval_curve.jsonl'}")

    from gan_inpainting_tpu.configs.base import apply_overrides, get_config
    from gan_inpainting_tpu.io.export import export_from_checkpoint

    cfg = apply_overrides(get_config(config),
                          [f"train.workdir={workdir}"] + overrides)
    npz_path = out_dir / "generator_best.npz"
    # f16 storage halves the in-repo artifact; the manifest pins metrics
    # reproduced FROM this artifact, so quoted numbers are exact for it
    export_from_checkpoint(cfg, str(npz_path), use_ema=True, best=True,
                           store_dtype="float16")
    sha = hashlib.sha256(npz_path.read_bytes()).hexdigest()
    print(f"[pin] best generator -> {npz_path} "
          f"({npz_path.stat().st_size / 1e6:.1f} MB, sha256 {sha[:16]}…)")

    best_meta = json.loads((workdir / "best.json").read_text()) \
        if (workdir / "best.json").exists() else {}

    reproduced = None
    if not no_reproduce:
        import jax

        from gan_inpainting_tpu.infer.inpaint import Inpainter
        from gan_inpainting_tpu.train.evaluate import evaluate

        inp = Inpainter.from_npz(str(npz_path))
        reproduced = {k: round(float(v), 4)
                      for k, v in evaluate(inp.cfg, inp.g_params).items()}
        reproduced["platform"] = jax.default_backend()
        print(f"[pin] reproduced via eval --weights: {reproduced}")

    manifest = {
        "name": name,
        "config": config,
        "overrides": overrides,
        "npz_sha256": sha,
        "eval_points": n,
        "best_at_train_time": best_meta,
        "reproduced_from_npz": reproduced,
    }
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2)
                                           + "\n")
    print(f"[pin] manifest -> {out_dir / 'manifest.json'}")
    return manifest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--overrides", nargs="*", default=[])
    ap.add_argument("--out-root", default=None,
                    help="artifact root (default: in-repo docs/artifacts)")
    ap.add_argument("--no-reproduce", action="store_true",
                    help="skip the eval --weights reproduction (CPU hosts)")
    args = ap.parse_args()
    pin(args.name, args.workdir, args.config, args.overrides,
        out_root=pathlib.Path(args.out_root) if args.out_root else None,
        no_reproduce=args.no_reproduce)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
