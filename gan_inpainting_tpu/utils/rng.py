"""PRNG-key plumbing.

One root key per run; every consumer (mask synthesis, data augmentation,
model init, latent noise) gets keys by folding in a stable stream id and a
step counter. This keeps the whole pipeline reproducible under a single seed
— and, unlike stateful RNG, is safe inside ``jit`` and across a device mesh.
"""

from __future__ import annotations

import dataclasses

import jax


# Stable stream ids. Never renumber — checkpoints fold these into keys.
STREAM_PARAMS = 0
STREAM_MASKS = 1
STREAM_DATA = 2
STREAM_TRAIN = 3
STREAM_EVAL = 4


@dataclasses.dataclass(frozen=True)
class RngStream:
    """A deterministic stream of PRNG keys derived from (root, stream_id)."""

    root: jax.Array
    stream_id: int

    def at_step(self, step) -> jax.Array:
        """Key for a given step. `step` may be a traced int inside jit."""
        return jax.random.fold_in(
            jax.random.fold_in(self.root, self.stream_id), step
        )

    def split(self, step, n: int):
        return jax.random.split(self.at_step(step), n)


def make_streams(seed: int):
    root = jax.random.key(seed)
    return {
        "params": RngStream(root, STREAM_PARAMS),
        "masks": RngStream(root, STREAM_MASKS),
        "data": RngStream(root, STREAM_DATA),
        "train": RngStream(root, STREAM_TRAIN),
        "eval": RngStream(root, STREAM_EVAL),
    }
