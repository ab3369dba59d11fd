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

# What "auto" means per op on TPU, set by measurement (ops/pallas/*.py):
# * contextual_attention: the blockwise Pallas kernel wins — the XLA path
#   materializes the (Lq, Lk) score matrix.
# * gated conv: XLA's native conv wins — CLOSED OUT (round 2) after two
#   Pallas formulations lost at every flagship shape on v5e:
#   - im2col (ops/pallas/fused_matmul.py): k²x HBM activation blow-up
#     (observed 6.75 GB temp at 256²/batch 64 → compile OOM);
#   - implicit-GEMM (ops/pallas/direct_conv.py): rows resident in VMEM, k²
#     in-kernel tap matmuls, fused gate epilogue — still 0.57-0.78x XLA at
#     the 64²/128² generator shapes and 0.1-0.3x at 256² low-channel
#     shapes (tools/bench_conv.py r2: XLA 52-70 TF/s vs direct 38-45;
#     Mosaic's generated matmul pipeline does not reach XLA's conv
#     codegen, and the epilogue-fusion saving does not cover the gap).
#   Both kernels stay available behind backend="pallas" (equivalence-
#   tested) for experimentation; auto stays xla deliberately.
# * partial conv: XLA fuses the epilogue into the conv already.
AUTO_TPU = {
    "contextual_attention": "pallas",
    "gated_conv": "xla",
    "partial_conv": "xla",
}


def _default_device_kind() -> str:
    try:
        return jax.devices()[0].platform
    except Exception:  # pragma: no cover - no devices at all
        return "cpu"


def resolve_backend(backend: str = "auto", op: str | None = None) -> str:
    forced = getattr(_local, "forced", None)
    if forced is not None:
        backend = forced
    if backend not in VALID:
        raise ValueError(f"backend must be one of {VALID}, got {backend!r}")
    if backend == "auto":
        if _default_device_kind() != "tpu":
            return "xla"
        return AUTO_TPU.get(op, "pallas") if op else "pallas"
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
