"""Orbax checkpointing (reference R16 → SURVEY.md §5 checkpoint/resume).

Composite checkpoint of the full :class:`GANTrainState` (G/D params, both
optimizer states, spectral stats, step) plus the serialized config, with
``max_to_keep`` retention and auto-resume from the latest step. Saves are
async (orbax default) so checkpointing overlaps training.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import TYPE_CHECKING

import orbax.checkpoint as ocp

from gan_inpainting_tpu.configs.base import Config

if TYPE_CHECKING:  # import cycle: train.state -> ... -> io.checkpoint
    from gan_inpainting_tpu.train.state import GANTrainState


class CheckpointManager:
    def __init__(self, workdir: str, max_to_keep: int = 3,
                 subdir: str = "checkpoints"):
        self.path = pathlib.Path(workdir) / subdir
        self.path.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.path.resolve(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: "GANTrainState", cfg: Config):
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                config=ocp.args.JsonSave(dataclasses.asdict(cfg)),
            ),
        )

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_template: "GANTrainState",
                step: int | None = None) -> "GANTrainState":
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.path}")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template)),
        )
        return restored["state"]

    def restore_raw(self, step: int | None = None):
        """Restore the saved state as plain nested dicts/arrays, no template.

        Warm-start path (train.init_from): the source run's optimizer or
        EMA layout may differ from this run's, so the full-state
        :meth:`restore` template would mismatch; callers graft the param
        subtrees they need.
        """
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.path}")
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore()))
        return restored["state"]

    def restore_config(self, step: int | None = None) -> dict:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.path}")
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(config=ocp.args.JsonRestore()))
        return restored["config"]

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
