"""CLI (reference R17): ``python -m gan_inpainting_tpu <cmd> [--config NAME]
[section.key=value ...]``.

Subcommands: train | eval | infer | serve | bench | profile | parity |
configs.
"""

from __future__ import annotations

import argparse
import json
import sys

from gan_inpainting_tpu.configs.base import (
    apply_overrides,
    get_config,
    list_configs,
)


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--config", default="celeba128_center",
                   choices=list_configs())
    p.add_argument("overrides", nargs="*",
                   help="config overrides, e.g. train.steps=100")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="gan_inpainting_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    _add_common(sub.add_parser("train", help="run GAN training"))
    p_eval = sub.add_parser("eval", help="PSNR/SSIM on held-out data")
    _add_common(p_eval)
    p_eval.add_argument("--best", action="store_true",
                        help="evaluate the best-PSNR retention checkpoint")
    p_eval.add_argument("--weights", default=None,
                        help="evaluate an exported .npz artifact instead")

    p_inf = sub.add_parser(
        "infer", help="inpaint one image file, or a directory of "
        "filename-paired images and masks")
    _add_common(p_inf)
    p_inf.add_argument("--image", required=True,
                       help="image file, or directory of images")
    p_inf.add_argument("--mask", required=True,
                       help="mask file/directory; nonzero pixels = hole; "
                       "directory masks pair with images by filename")
    p_inf.add_argument("--output", required=True,
                       help="output file (single) or directory (batch)")
    p_inf.add_argument("--best", action="store_true",
                       help="use the best-PSNR retention checkpoint")
    p_inf.add_argument("--weights", default=None,
                       help="exported .npz artifact instead of a checkpoint "
                       "(its embedded config wins; overrides still apply)")
    p_inf.add_argument("--aot", default=None, metavar="DIR",
                       help="AOT artifact directory (export --aot): "
                       "pre-compiled programs, no model code or tracing")

    p_exp = sub.add_parser(
        "export", help="write the generator to a portable .npz artifact, "
        "or (--aot) an AOT-compiled serving artifact directory")
    _add_common(p_exp)
    p_exp.add_argument("--output", required=True,
                       help="output .npz path (or directory with --aot)")
    p_exp.add_argument("--best", action="store_true",
                       help="export the best-PSNR retention checkpoint")
    p_exp.add_argument("--raw", action="store_true",
                       help="export raw params even when EMA is tracked")
    p_exp.add_argument("--aot", action="store_true",
                       help="AOT artifact: serialized jax.export programs "
                       "per serve bucket + params (io/aot.py)")
    p_exp.add_argument("--aot-buckets", default=None,
                       help="comma-separated BxS bucket list, e.g. "
                       "1x256,8x256 (default: infer.batch_buckets at the "
                       "config's image size)")

    p_msk = sub.add_parser(
        "mask", help="write random mask PNGs (the config's mask.* family) "
        "for use with infer --mask")
    _add_common(p_msk)
    p_msk.add_argument("--output", required=True,
                       help="output PNG; with --n > 1, a directory")
    p_msk.add_argument("--n", type=int, default=1)
    p_msk.add_argument("--seed", type=int, default=0)

    p_srv = sub.add_parser(
        "serve", help="batched HTTP inpainting service (infer/service.py)")
    _add_common(p_srv)
    p_srv.add_argument("--host", default="127.0.0.1")
    p_srv.add_argument("--port", type=int, default=8763)
    p_srv.add_argument("--max-wait-ms", type=float, default=5.0,
                       help="micro-batcher straggler window")
    p_srv.add_argument("--max-queue", type=int, default=None,
                       help="in-flight request bound before 429s "
                       "(default: 8 device batches)")
    p_srv.add_argument("--best", action="store_true",
                       help="serve the best-PSNR retention checkpoint")
    p_srv.add_argument("--weights", default=None,
                       help="serve an exported .npz artifact instead of a "
                       "checkpoint (its embedded config wins; overrides "
                       "still apply)")
    p_srv.add_argument("--aot", default=None, metavar="DIR",
                       help="serve an AOT artifact directory (export --aot):"
                       " pre-compiled programs, no model code or tracing")

    p_bench = sub.add_parser("bench", help="throughput benchmarks")
    _add_common(p_bench)
    p_bench.add_argument("--mode", default="infer",
                         choices=["infer", "train"])

    p_prof = sub.add_parser("profile",
                            help="jax.profiler trace around N train steps")
    _add_common(p_prof)
    p_prof.add_argument("--steps", type=int, default=5)

    p_par = sub.add_parser(
        "parity", help="pinned PSNR/SSIM fingerprint across named configs "
        "(the BASELINE.json:5 quality-parity harness)")
    p_par.add_argument("--configs", nargs="*", default=None)
    p_par.add_argument("--max-image-size", type=int, default=None,
                       help="cap image size (CPU runs of 512² configs)")
    p_par.add_argument("--update", action="store_true",
                       help="rewrite the pinned file with these results")
    p_par.add_argument("--pinned", default=None,
                       help="pinned-metrics file (default: repo root)")

    sub.add_parser("configs", help="list named configs")

    args = parser.parse_args(argv)

    if args.cmd == "configs":
        print("\n".join(list_configs()))
        return 0

    if args.cmd == "parity":
        import pathlib

        from gan_inpainting_tpu.train.parity import (
            PINNED_PATH,
            check_parity,
            run_parity,
        )

        pinned = pathlib.Path(args.pinned) if args.pinned else PINNED_PATH
        results = run_parity(args.configs, args.max_image_size)
        print(json.dumps(results, indent=2))
        if args.update:
            import jax

            existing = (json.loads(pinned.read_text())
                        if pinned.exists() else {})
            platform = jax.default_backend()
            existing.setdefault(platform, {}).update(results)
            pinned.write_text(json.dumps(existing, indent=2) + "\n")
            print(f"pinned[{platform}] -> {pinned}")
            return 0
        problems = check_parity(results, pinned)
        for p in problems:
            print(f"DRIFT: {p}", file=sys.stderr)
        return 1 if problems else 0

    cfg = apply_overrides(get_config(args.config), args.overrides)

    if args.cmd == "train":
        from gan_inpainting_tpu.train.loop import train

        train(cfg)
        return 0

    if args.cmd == "eval":
        from gan_inpainting_tpu.infer.inpaint import Inpainter
        from gan_inpainting_tpu.train.evaluate import evaluate

        if args.weights:
            inp = Inpainter.from_npz(args.weights, overrides=args.overrides)
            cfg = inp.cfg
        else:
            inp = Inpainter.from_checkpoint(cfg, best=args.best)
        print(json.dumps(evaluate(cfg, inp.g_params)))
        return 0

    if args.cmd == "infer":
        import pathlib

        import numpy as np
        from PIL import Image

        from gan_inpainting_tpu.infer.inpaint import Inpainter

        image_path = pathlib.Path(args.image)
        if args.aot:
            from gan_inpainting_tpu.io.aot import AotInpainter

            inpainter = AotInpainter(args.aot)
        elif args.weights:
            inpainter = Inpainter.from_npz(args.weights,
                                           overrides=args.overrides)
        else:
            inpainter = Inpainter.from_checkpoint(cfg, best=args.best)

        if image_path.is_dir():
            from gan_inpainting_tpu.infer.batch_files import inpaint_dir

            n = inpaint_dir(inpainter, image_path, pathlib.Path(args.mask),
                            pathlib.Path(args.output))
            print(f"wrote {n} images to {args.output}")
            return 0

        image = np.asarray(Image.open(args.image).convert("RGB"))
        # >127: same threshold as the directory and HTTP paths, so an
        # anti-aliased grayscale mask yields one hole everywhere
        mask = (np.asarray(Image.open(args.mask).convert("L")) > 127)
        out = inpainter(image, mask.astype(np.float32))
        Image.fromarray(out).save(args.output)
        print(f"wrote {args.output}")
        return 0

    if args.cmd == "mask":
        import pathlib

        import jax
        import numpy as np
        from PIL import Image

        from gan_inpainting_tpu.data.masks import random_mask_batch

        size = cfg.data.image_size
        masks = random_mask_batch(jax.random.key(args.seed), args.n,
                                  size, size, cfg.mask)
        masks = (np.asarray(masks)[..., 0] > 0.5).astype(np.uint8) * 255
        out = pathlib.Path(args.output)
        if args.n == 1:
            Image.fromarray(masks[0]).save(out)
            print(f"wrote {out}")
        else:
            out.mkdir(parents=True, exist_ok=True)
            for i in range(args.n):
                Image.fromarray(masks[i]).save(out / f"mask_{i:04d}.png")
            print(f"wrote {args.n} masks to {out}")
        return 0

    if args.cmd == "export":
        if args.aot:
            from gan_inpainting_tpu.infer.inpaint import Inpainter
            from gan_inpainting_tpu.io.aot import export_serving

            inp = Inpainter.from_checkpoint(cfg, use_ema=not args.raw,
                                            best=args.best)
            buckets = None
            if args.aot_buckets:
                buckets = [tuple(int(v) for v in spec.split("x"))
                           for spec in args.aot_buckets.split(",")]
            manifest = export_serving(inp.cfg, inp.g_params, args.output,
                                      buckets=buckets)
            print(f"wrote AOT artifact ({len(manifest['buckets'])} buckets, "
                  f"platform {manifest['platform']}) to {args.output}")
            return 0
        from gan_inpainting_tpu.io.export import export_from_checkpoint

        export_from_checkpoint(cfg, args.output, use_ema=not args.raw,
                               best=args.best)
        print(f"wrote {args.output}")
        return 0

    if args.cmd == "serve":
        from gan_inpainting_tpu.infer.inpaint import Inpainter
        from gan_inpainting_tpu.infer.service import serve

        if args.aot:
            from gan_inpainting_tpu.io.aot import AotInpainter

            inpainter = AotInpainter(args.aot)
        elif args.weights:
            inpainter = Inpainter.from_npz(args.weights,
                                           overrides=args.overrides)
        else:
            inpainter = Inpainter.from_checkpoint(cfg, best=args.best)
        serve(inpainter, host=args.host, port=args.port,
              max_wait_ms=args.max_wait_ms, max_queue=args.max_queue)
        return 0

    if args.cmd == "bench":
        from gan_inpainting_tpu.bench import run_bench

        print(json.dumps(run_bench(cfg, mode=args.mode)))
        return 0

    if args.cmd == "profile":
        import dataclasses

        from gan_inpainting_tpu.train.loop import train
        from gan_inpainting_tpu.utils.debug import trace

        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, steps=args.steps, eval_every=10 ** 9,
                checkpoint_every=10 ** 9))
        with trace(cfg.train.workdir):
            train(cfg, resume=False)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
