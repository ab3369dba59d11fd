"""Debug / sanitizer switches (SURVEY.md §5 "race detection / sanitizers").

The TPU-native equivalents of the reference stack's (nonexistent) sanitizer
tier:

* ``debug_mode()`` — turns on jax_debug_nans + jax_enable_checks for the
  scope: any NaN produced inside a jitted train step re-runs op-by-op and
  raises at the producing op.
* ``interpret_kernels()`` — runs every Pallas kernel in interpreter mode
  (pure Python semantics, full bounds checking) — the kernel "sanitizer".
* ``trace(workdir)`` — jax.profiler trace around a block; view in
  TensorBoard's profile plugin.
"""

from __future__ import annotations

import contextlib
import pathlib

import jax
from jax.experimental.pallas import tpu as pltpu


@contextlib.contextmanager
def debug_mode(nans: bool = True, checks: bool = True):
    prev_nans = jax.config.jax_debug_nans
    prev_checks = jax.config.jax_enable_checks
    try:
        jax.config.update("jax_debug_nans", nans)
        jax.config.update("jax_enable_checks", checks)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
        jax.config.update("jax_enable_checks", prev_checks)


@contextlib.contextmanager
def interpret_kernels():
    with pltpu.force_tpu_interpret_mode():
        yield


@contextlib.contextmanager
def trace(workdir: str):
    out = pathlib.Path(workdir) / "profile"
    out.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(out)):
        yield
    print(f"[profile] wrote trace to {out} (view: tensorboard --logdir {out})")
