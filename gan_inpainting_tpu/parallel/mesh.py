"""Device-mesh construction.

The framework always runs over a 2-D logical mesh ``(data, model)``:

* ``data`` — data parallelism: the batch dimension of every array is sharded
  over it; XLA emits the gradient all-reduce over ICI inside the jitted train
  step (SURVEY.md §2b; BASELINE.json:5 "data-parallel allreduce over ICI").
* ``model`` — tensor parallelism seam: conv channel dimensions carry sharding
  constraints over it (see :mod:`gan_inpainting_tpu.parallel.sharding`).
  Defaults to size 1; SURVEY.md §2b documents that model scale does not need
  TP, but the axis exists so enabling it is a config change, not an API
  change.

Single-device runs use the same code path with a 1×1 mesh — there is no
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
AXIS_NAMES = (DATA_AXIS, MODEL_AXIS)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. `data=-1` means "all remaining devices"."""

    data: int = -1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = self.model
        data = self.data
        if data == -1:
            if n_devices % model:
                raise ValueError(
                    f"n_devices={n_devices} not divisible by model={model}")
            data = n_devices // model
        if data * model > n_devices:
            raise ValueError(
                f"mesh {data}x{model} needs more than the {n_devices} "
                f"available devices")
        return data, model


def build_mesh(config: MeshConfig = MeshConfig(),
               devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build the (data, model) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    data, model = config.resolve(len(devices))
    # an explicit smaller mesh uses a prefix of the devices
    dev_array = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(dev_array, AXIS_NAMES)


def local_mesh() -> Mesh:
    """A 1x1 mesh on the first local device (tests, single-chip debug)."""
    return build_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
