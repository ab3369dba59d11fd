"""Portable generator artifact: one ``.npz`` file.

The reference hands a trained model around as a single ``torch.save`` file
of G's state_dict (SURVEY.md R15/R16); the Orbax checkpoints here are
directory trees tied to a training run. This module is the deployment
hand-off equivalent: generator params (EMA when tracked) flattened to
``path/to/leaf -> array`` entries plus the embedded config JSON, loadable
with numpy alone — no Orbax, no training state.

CLI: ``python -m gan_inpainting_tpu export --output g.npz`` and
``infer --weights g.npz``.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

from gan_inpainting_tpu.configs.base import Config, config_from_dict

_CONFIG_KEY = "__config_json__"
_SEP = "/"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    tree: dict = {}
    for path, value in flat.items():
        node = tree
        parts = path.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def export_generator(cfg: Config, g_params, path: str,
                     store_dtype: str | None = None) -> None:
    """Write generator params + config to ``path`` (.npz).

    ``store_dtype="float16"`` halves the artifact for in-repo pinning
    (docs/artifacts/): f32 leaves are stored as f16 and cast back to f32 at
    load, so downstream code sees the usual f32 param tree. The ~5e-4
    relative weight rounding is below the uint8 output quantization in
    practice; pinned manifests quote metrics reproduced FROM the artifact,
    so the stored-precision question never reaches a quoted number.
    """
    flat = _flatten(g_params)
    bad = [k for k in flat if k == _CONFIG_KEY]
    if bad:
        raise ValueError(f"param path collides with reserved key {bad}")
    if store_dtype is not None:
        dt = np.dtype(store_dtype)
        flat = {k: (v.astype(dt) if v.dtype == np.float32 else v)
                for k, v in flat.items()}
    payload = {_CONFIG_KEY: np.frombuffer(
        json.dumps(dataclasses.asdict(cfg), default=str).encode(), np.uint8)}
    payload.update(flat)
    with open(path, "wb") as f:
        np.savez(f, **payload)


def load_generator(path: str):
    """Read an exported artifact → ``(cfg, g_params)``. Reduced-precision
    storage (float16) is widened back to the f32 the models expect."""
    with np.load(path) as data:
        if _CONFIG_KEY not in data:
            raise ValueError(
                f"{path} is not a gan_inpainting_tpu export (missing config)")
        cfg = config_from_dict(json.loads(bytes(data[_CONFIG_KEY]).decode()))
        params = _unflatten(
            {k: (data[k].astype(np.float32)
                 if data[k].dtype == np.float16 else data[k])
             for k in data.files if k != _CONFIG_KEY})
    return cfg, params


def export_from_checkpoint(cfg: Config, path: str,
                           workdir: str | None = None,
                           use_ema: bool = True, best: bool = False,
                           store_dtype: str | None = None) -> None:
    """Export the latest (or best) checkpoint's generator to ``path``.

    Raw (template-free) restore: the artifact embeds the checkpoint's OWN
    config, so the caller's ``cfg`` only locates the workdir — no need to
    repeat the training run's optimizer/EMA knobs, and layout changes in
    the non-generator state can't break the export.
    """
    import jax

    from gan_inpainting_tpu.io.checkpoint import CheckpointManager

    subdir = "checkpoints_best" if best else "checkpoints"
    ckpt = CheckpointManager(workdir or cfg.train.workdir, subdir=subdir)
    saved_cfg = config_from_dict(ckpt.restore_config())
    raw = ckpt.restore_raw()
    params = raw["g_params"]
    if use_ema:
        ema = raw.get("g_ema")
        if ema is not None and jax.tree_util.tree_leaves(ema):
            params = ema
    export_generator(saved_cfg, jax.device_get(params), path,
                     store_dtype=store_dtype)
