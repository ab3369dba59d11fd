"""AOT-compiled serving artifacts via ``jax.export``.

The ``.npz`` export (io/export.py) is the *weights* hand-off; this module
is the *program* hand-off: each (batch, size) serve bucket's forward is
lowered to StableHLO ahead of time and serialized, so a serving host can
run inpainting with the artifact alone — no flax model code, no tracing,
no warm-up recompiles, and a frozen program that cannot drift when the
model code changes. This is the TPU-native analogue of the reference
ecosystem's TorchScript/ONNX deployment artifact (SURVEY.md R15/R16 —
the reference itself hands around a pickled state_dict; an AOT program
is what a production serving fleet actually wants).

Artifact layout (a directory)::

    manifest.json        format/platform/bucket metadata + embedded config
    params.npz           generator params (io/export.py flattening)
    fwd_<B>x<S>.bin      serialized jax.export module per bucket

Programs are lowered for the platform doing the export (record kept in
the manifest; loading on a different platform raises a clear error).
Params stay an *argument* of the exported function rather than baked-in
constants so the same weights file feeds every bucket and weight updates
don't invalidate the programs (shape-compatible re-exports of the npz
drop in).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from jax import export as jax_export

from gan_inpainting_tpu.configs.base import Config, config_from_dict
from gan_inpainting_tpu.io.export import _CONFIG_KEY, _flatten, _unflatten

_MANIFEST = "manifest.json"
_PARAMS = "params.npz"
_FORMAT = 1


def _bucket_file(batch: int, size: int) -> str:
    return f"fwd_{batch}x{size}.bin"


def export_serving(cfg: Config, g_params, outdir: str, *,
                   buckets: list[tuple[int, int]] | None = None) -> dict:
    """Write an AOT serving artifact to ``outdir``.

    ``buckets``: explicit ``(batch, size)`` list; defaults to the config's
    ``infer.batch_buckets`` × the training image size (exporting every
    configured size bucket multiplies compile time — opt in explicitly).
    Returns the manifest dict.
    """
    from gan_inpainting_tpu.infer.inpaint import make_forward_fn

    if buckets is None:
        buckets = [(b, cfg.data.image_size) for b in cfg.infer.batch_buckets]
    os.makedirs(outdir, exist_ok=True)

    g_params = jax.device_get(g_params)
    fwd = jax.jit(make_forward_fn(cfg))
    param_sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        g_params)
    platform = jax.default_backend()
    for batch, size in buckets:
        img = jax.ShapeDtypeStruct((batch, size, size, 3), np.uint8)
        msk = jax.ShapeDtypeStruct((batch, size, size, 1), np.float32)
        exp = jax_export.export(fwd, platforms=(platform,))(
            param_sds, img, msk)
        with open(os.path.join(outdir, _bucket_file(batch, size)), "wb") as f:
            f.write(bytes(exp.serialize()))

    flat = _flatten(g_params)
    with open(os.path.join(outdir, _PARAMS), "wb") as f:
        np.savez(f, **flat)

    import dataclasses

    manifest = {
        "format": _FORMAT,
        "platform": platform,
        "jax_version": jax.__version__,
        "buckets": [[int(b), int(s)] for b, s in buckets],
        "config": dataclasses.asdict(cfg),
    }
    with open(os.path.join(outdir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    return manifest


class AotInpainter:
    """Serve from an AOT artifact: same bucketing/padding semantics as the
    live :class:`~gan_inpainting_tpu.infer.inpaint.Inpainter`, but every
    program was compiled at export time — no model code, no retracing."""

    def __init__(self, path: str):
        with open(os.path.join(path, _MANIFEST)) as f:
            manifest = json.load(f)
        if manifest.get("format") != _FORMAT:
            raise ValueError(f"{path}: unsupported artifact format "
                             f"{manifest.get('format')!r}")
        platform = jax.default_backend()
        if manifest["platform"] != platform:
            raise ValueError(
                f"{path} was exported for {manifest['platform']!r} but this "
                f"process runs {platform!r}; re-export on the target "
                f"platform")
        import dataclasses

        self.path = path
        self.buckets = [tuple(b) for b in manifest["buckets"]]
        # present an infer config matching the exported buckets, so the
        # HTTP service's micro-batcher (infer/service.py) groups requests
        # into combos this artifact actually has programs for
        cfg = config_from_dict(manifest["config"])
        self.cfg = dataclasses.replace(cfg, infer=dataclasses.replace(
            cfg.infer,
            batch_buckets=tuple(sorted({b for b, _ in self.buckets})),
            size_buckets=tuple(sorted({s for _, s in self.buckets}))))
        with np.load(os.path.join(path, _PARAMS)) as data:
            self.g_params = _unflatten(
                {k: data[k] for k in data.files if k != _CONFIG_KEY})
        self._fns: dict[tuple[int, int], object] = {}

    def _load(self, batch: int, size: int):
        key = (batch, size)
        if key not in self._fns:
            fname = os.path.join(self.path, _bucket_file(batch, size))
            with open(fname, "rb") as f:
                self._fns[key] = jax_export.deserialize(bytearray(f.read()))
        return self._fns[key]

    def _pick_bucket(self, b: int, s: int) -> tuple[int, int]:
        fits = [(bb, bs) for bb, bs in self.buckets if bb >= b and bs >= s]
        if not fits:
            raise ValueError(
                f"no exported bucket fits batch={b} size={s}; have "
                f"{sorted(self.buckets)}")
        return min(fits)

    def inpaint_batch(self, images_u8, masks) -> np.ndarray:
        """Batched API: (B,H,W,3) uint8 + (B,H,W[,1]) masks, 1 = hole."""
        images_u8 = np.asarray(images_u8, np.uint8)
        masks = np.asarray(masks, np.float32)
        if masks.ndim == 3:
            masks = masks[..., None]
        b, h, w, _ = images_u8.shape
        if masks.shape[:3] != (b, h, w):
            raise ValueError(f"mask shape {masks.shape[:3]} does not match "
                             f"images {(b, h, w)}")
        bb, sb = self._pick_bucket(b, max(h, w))
        if sb != h or sb != w:
            widths = ((0, 0), (0, sb - h), (0, sb - w), (0, 0))
            images_u8 = np.pad(images_u8, widths)
            masks = np.pad(masks, widths)
        if bb != b:
            reps = ((0, bb - b),) + ((0, 0),) * 3
            images_u8 = np.pad(images_u8, reps)
            masks = np.pad(masks, reps)
        out = self._load(bb, sb).call(self.g_params, images_u8, masks)
        return np.asarray(out)[:b, :h, :w, :]

    def __call__(self, image, mask) -> np.ndarray:
        """Single-image API, mirroring ``Inpainter.__call__``."""
        out = self.inpaint_batch(np.asarray(image)[None],
                                 np.asarray(mask)[None])
        return out[0]

    def warmup(self):
        """Deserialize (and first-run) every exported bucket."""
        for bb, sb in self.buckets:
            img = np.zeros((bb, sb, sb, 3), np.uint8)
            msk = np.zeros((bb, sb, sb, 1), np.float32)
            self.inpaint_batch(img, msk)
