"""Kernel backend dispatch.

Every hot op has (at least) two implementations:

* ``xla``    — pure jax.numpy / lax composition. Always correct, runs on any
  backend; the Pallas kernels are equivalence-tested against it
  (SURVEY.md §4 "kernel equivalence").
* ``pallas`` — hand-written Pallas TPU kernel.

``auto`` resolves to pallas on TPU and xla elsewhere. Tests pin backends via
:func:`override_backend`.
"""

from __future__ import annotations

import contextlib
import threading

import jax

_local = threading.local()

VALID = ("auto", "xla", "pallas")


def _default_device_kind() -> str:
    try:
        return jax.devices()[0].platform
    except Exception:  # pragma: no cover - no devices at all
        return "cpu"


def resolve_backend(backend: str = "auto") -> str:
    forced = getattr(_local, "forced", None)
    if forced is not None:
        backend = forced
    if backend not in VALID:
        raise ValueError(f"backend must be one of {VALID}, got {backend!r}")
    if backend == "auto":
        return "pallas" if _default_device_kind() == "tpu" else "xla"
    return backend


@contextlib.contextmanager
def override_backend(backend: str):
    """Force a backend for all ops inside the context (tests/benchmarks)."""
    prev = getattr(_local, "forced", None)
    _local.forced = backend
    try:
        yield
    finally:
        _local.forced = prev
