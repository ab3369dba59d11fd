"""Sharding rules and helpers.

All arrays in this framework are NHWC. The standard layouts:

* batches / activations: ``P('data', 'spatial', None, 'model')`` — batch over
  the data axis, rows (H) over the spatial axis (halo-exchange convs via
  GSPMD; no-op when spatial=1), channels over the model axis (TP seam;
  no-op when model=1).
* conv kernels ``(kh, kw, cin, cout)``: ``P(None, None, None, 'model')`` —
  output channels sharded over the model axis so each model shard owns a
  channel slice; XLA/GSPMD inserts the all-gathers/reduce-scatters the conv
  graph needs.
* scalars / small state: fully replicated.

The trainer never calls collectives by hand: it annotates inputs with
:func:`shard_batch` and intermediate activations with
``jax.lax.with_sharding_constraint`` via :func:`constrain`, and lets GSPMD
emit the ICI collectives (SURVEY.md §2b "communication backend").
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gan_inpainting_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    SPATIAL_AXIS,
)


@dataclasses.dataclass(frozen=True)
class ShardingRules:
    """Named PartitionSpecs for the framework's array roles."""

    batch: P = P(DATA_AXIS, None, None, None)
    # NHWC images/activations under spatial partitioning: rows over the
    # spatial axis. Identical to `batch` on a spatial=1 mesh.
    spatial_batch: P = P(DATA_AXIS, SPATIAL_AXIS, None, None)
    activation: P = P(DATA_AXIS, SPATIAL_AXIS, None, MODEL_AXIS)
    conv_kernel: P = P(None, None, None, MODEL_AXIS)
    replicated: P = P()


DEFAULT_RULES = ShardingRules()


def batch_sharding(mesh: Mesh, spec: P | None = None) -> NamedSharding:
    return NamedSharding(mesh, DEFAULT_RULES.batch if spec is None else spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of host arrays onto the mesh, batch-sharded over data.

    Arrays with >=1 dim get their leading dim sharded over 'data'; scalars
    are replicated. On a mesh with a spatial axis >1, NHWC arrays whose H
    divides it additionally get their rows sharded over 'spatial' (spatial
    partitioning — GSPMD threads the row sharding through the model and
    inserts conv halo exchanges).
    """
    n_spatial = dict(mesh.shape).get(SPATIAL_AXIS, 1)

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated(mesh))
        if x.ndim == 4 and n_spatial > 1 and x.shape[1] % n_spatial == 0:
            spec = P(DATA_AXIS, SPATIAL_AXIS, None, None)
        else:
            spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def shard_channels(x, mesh: Mesh | None = None):
    """Constrain an NHWC activation to (data, -, -, model) inside jit.

    No-ops when no mesh is in context (e.g. flax init outside
    ``jax.set_mesh``) — the constraint is a performance annotation, never a
    correctness requirement.
    """
    spec = DEFAULT_RULES.activation
    if mesh is not None:
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except (RuntimeError, ValueError):
        return x


def constrain(x, spec: P):
    """Thin wrapper so model code never imports jax.lax directly for this."""
    return jax.lax.with_sharding_constraint(x, spec)
