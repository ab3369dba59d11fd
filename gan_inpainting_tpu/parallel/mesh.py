"""Device-mesh construction.

The framework always runs over a 3-D logical mesh ``(data, model, spatial)``:

* ``data`` — data parallelism: the batch dimension of every array is sharded
  over it; XLA emits the gradient all-reduce over ICI inside the jitted train
  step (SURVEY.md §2b; BASELINE.json:5 "data-parallel allreduce over ICI").
* ``model`` — tensor parallelism seam: conv channel dimensions carry sharding
  constraints over it (see :mod:`gan_inpainting_tpu.parallel.sharding`).
  Defaults to size 1; SURVEY.md §2b documents that model scale does not need
  TP, but the axis exists so enabling it is a config change, not an API
  change.
* ``spatial`` — spatial partitioning: image/activation ROWS (the NHWC H dim)
  are sharded over it and GSPMD inserts the halo exchanges every conv window
  needs at shard boundaries. This is the scale-out story for a SINGLE large
  request: data parallelism cannot split a batch-1 2048² image, row sharding
  can — each chip holds 1/spatial of every activation, which is also what
  bounds the largest servable image (the dense attention score matrix at
  2048² is ~17 GB — over a single chip's HBM, 1/8th of it per chip on a
  spatial=8 mesh). Defaults to size 1 (a no-op: the sharding specs name the
  axis but shard nothing over a size-1 axis).

Single-device runs use the same code path with a 1×1×1 mesh — there is no
separate "local" implementation, which keeps the distributed path permanently
exercised by every unit test.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
SPATIAL_AXIS = "spatial"
AXIS_NAMES = (DATA_AXIS, MODEL_AXIS, SPATIAL_AXIS)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. `data=-1` means "all remaining devices"."""

    data: int = -1
    model: int = 1
    spatial: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        model = self.model
        spatial = self.spatial
        data = self.data
        if data == -1:
            if n_devices % (model * spatial):
                raise ValueError(
                    f"n_devices={n_devices} not divisible by "
                    f"model*spatial={model * spatial}")
            data = n_devices // (model * spatial)
        if data * model * spatial > n_devices:
            raise ValueError(
                f"mesh {data}x{model}x{spatial} needs more than the "
                f"{n_devices} available devices")
        return data, model, spatial


def build_mesh(config: MeshConfig = MeshConfig(),
               devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build the (data, model, spatial) mesh over the given (default: all)
    devices."""
    if devices is None:
        devices = jax.devices()
    data, model, spatial = config.resolve(len(devices))
    # an explicit smaller mesh uses a prefix of the devices
    dev_array = np.asarray(devices[:data * model * spatial]).reshape(
        data, model, spatial)
    return Mesh(dev_array, AXIS_NAMES)


def local_mesh() -> Mesh:
    """A 1x1 mesh on the first local device (tests, single-chip debug)."""
    return build_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
