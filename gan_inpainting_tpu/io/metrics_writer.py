"""Metrics/observability (SURVEY.md §5): JSONL + console + optional TB.

Scalars stream to ``<workdir>/metrics.jsonl`` (one JSON object per log
event — trivially machine-readable for the bench/driver) and to the console.
If TensorBoard's writer is importable (tf is baked into this image), scalar
and image summaries also go to ``<workdir>/tb``; its absence degrades
silently — observability never takes down training.
"""

from __future__ import annotations

import json
import pathlib
import time
from typing import Mapping

import numpy as np


class MetricsWriter:
    def __init__(self, workdir: str, use_tensorboard: bool = True):
        self.dir = pathlib.Path(workdir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "metrics.jsonl", "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # noqa: PLC0415

                self._tb = tf.summary.create_file_writer(
                    str(self.dir / "tb"))
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Mapping[str, float]):
        record = {"step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default(step=int(step)):
                for k, v in values.items():
                    tf.summary.scalar(k, float(v))

    def images(self, step: int, name: str, images_u8: np.ndarray):
        """images_u8: (N, H, W, 3) uint8 sample grid."""
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default(step=int(step)):
                tf.summary.image(name, images_u8,
                                 max_outputs=images_u8.shape[0])

    def close(self):
        self._jsonl.close()
