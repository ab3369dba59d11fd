"""Render a (masked | coarse/fine output | composite | target) sample grid
PNG from a trained checkpoint — the reference's periodic sample dump as a
standalone tool (SURVEY.md R13 "sample dumps"; train/loop.py writes the
same grid to TensorBoard during training).

Usage:
  python tools/sample_grid.py --config places512_deepfill \
      train.workdir=/root/qual512 --best --rows 4 --out grid.png
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--rows", type=int, default=4)
    p.add_argument("--out", required=True)
    p.add_argument("--best", action="store_true")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from PIL import Image

    from gan_inpainting_tpu.configs.base import apply_overrides, get_config
    from gan_inpainting_tpu.data.loader import make_dataset
    from gan_inpainting_tpu.data.pipeline import (
        denormalize,
        make_train_batch,
    )
    from gan_inpainting_tpu.models.generator import build_generator
    from gan_inpainting_tpu.train.state import (
        ema_generator_params,
        restore_state,
    )
    from gan_inpainting_tpu.train.step import composite

    cfg = apply_overrides(get_config(args.config), args.overrides)
    import jax

    state = restore_state(cfg, best=args.best)
    print(f"[grid] checkpoint step {int(state.step)} from "
          f"{cfg.train.workdir}", file=sys.stderr)
    params = ema_generator_params(state)

    it = make_dataset(cfg.data, seed=args.seed, split="eval",
                      batch_size=args.rows)
    batch = make_train_batch(next(it), jax.random.key(args.seed), cfg.mask)
    generator = build_generator(cfg.model)
    out = generator.apply({"params": params}, batch.masked, batch.mask)
    comp = composite(out.fine, batch.image, batch.mask)

    row = np.concatenate([
        np.asarray(denormalize(batch.masked)),
        np.asarray(denormalize(out.fine)),
        np.asarray(denormalize(comp)),
        np.asarray(denormalize(batch.image)),
    ], axis=2)  # (rows, H, 4W, 3)
    grid = row.reshape(-1, row.shape[2], 3)
    Image.fromarray(grid).save(args.out)
    print(f"wrote {args.out} ({grid.shape[1]}x{grid.shape[0]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
