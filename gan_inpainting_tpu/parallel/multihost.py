"""Multi-host (DCN) support: the v4-8+ pod story (SURVEY.md §2b, §3.5).

Single-host multi-chip needs nothing from this module — the mesh covers the
local devices and GSPMD emits ICI collectives. Across hosts, three things
change, all centralized here:

* :func:`ensure_initialized` — ``jax.distributed.initialize`` from the
  standard coordinator env vars (each process then sees the GLOBAL device
  set through ``jax.devices()``, so ``build_mesh`` needs no changes; the
  data axis spans hosts and gradient all-reduce segments ride ICI within a
  host and DCN across).
* :func:`process_batch_slice` — each process feeds only its slice of the
  global batch; the per-process loader seed must differ (fold in the
  process index) so hosts draw disjoint data.
* :func:`shard_host_batch` — assembling a GLOBAL jax.Array from
  process-local host data (``jax.make_array_from_process_local_data``);
  plain ``device_put`` of a full batch only works single-process.

The 1-process path through every function is the identity and is what unit
tests exercise; true multi-process runs need a pod (unavailable on this
box — BASELINE.md dev-environment note).
"""

from __future__ import annotations

import os

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from gan_inpainting_tpu.parallel.mesh import DATA_AXIS


def ensure_initialized(verbose: bool = True) -> int:
    """Initialize jax.distributed when launched as one process of a pod.

    Triggers only when a coordinator address is configured (standard jax
    env: JAX_COORDINATOR_ADDRESS [+ JAX_NUM_PROCESSES, JAX_PROCESS_ID], or
    an auto-detecting TPU-pod runtime where initialize() needs no args).
    Safe to call unconditionally; single-process runs return 1 untouched.
    """
    # NOTE: must not touch the backend (jax.process_count(), jax.devices(),
    # …) before deciding — those calls initialize XLA, after which
    # jax.distributed.initialize() refuses to run. Found the hard way by
    # the first real 2-process run (tools/run_multihost_cpu.py): the old
    # `if jax.process_count() > 1` pre-check broke every manual-env launch.
    if jax.distributed.is_initialized():
        return jax.process_count()  # already initialized by the launcher
    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if addr:
        kwargs = {"coordinator_address": addr}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kwargs)
        if verbose:
            print(f"[multihost] initialized: process "
                  f"{jax.process_index()}/{jax.process_count()}, "
                  f"{jax.local_device_count()} local of "
                  f"{jax.device_count()} global devices")
    return jax.process_count()


def process_batch_slice(global_batch: int) -> tuple[int, int]:
    """(per-process batch size, per-process seed offset).

    The seed offset is folded into the data iterator seed so processes draw
    disjoint streams; a large odd multiplier keeps the per-step fold_in
    streams disjoint too.
    """
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"process_count {n}")
    return global_batch // n, jax.process_index() * 1_000_003


def shard_host_batch(mesh, tree):
    """Multi-host-aware batch placement.

    Each process passes its LOCAL slice of the batch; the result is a
    global jax.Array batch-sharded over the mesh's data axis. With one
    process this is exactly parallel.sharding.shard_batch.
    """
    from gan_inpainting_tpu.parallel.sharding import shard_batch

    if jax.process_count() == 1:
        return shard_batch(mesh, tree)

    import numpy as np

    def put(x):
        # keep host data as numpy: under an ambient `jax.set_mesh`,
        # jnp.asarray builds a mesh-GLOBAL replicated array whose shards
        # span non-addressable devices, and the per-shard callback inside
        # make_array_from_process_local_data then fails device_put
        x = np.asarray(x)
        if x.ndim == 0:
            # replicated scalars: every process must pass the same value.
            # Assembled from per-LOCAL-device copies —
            # make_array_from_process_local_data with P() device_puts to
            # non-addressable devices and throws (first real 2-process run,
            # tools/run_multihost_cpu.py).
            sharding = NamedSharding(mesh, P())
            local = [jax.device_put(x, d) for d in
                     sharding.addressable_devices]
            return jax.make_array_from_single_device_arrays(
                x.shape, sharding, local)
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree.map(put, tree)
