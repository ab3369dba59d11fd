"""Sanitizer/profiling utility tests (SURVEY.md §5)."""

import pathlib

import jax
import jax.numpy as jnp

from gan_inpainting_tpu.utils.debug import debug_mode, trace


def test_debug_mode_toggles_and_restores():
    before = jax.config.jax_debug_nans
    with debug_mode():
        assert jax.config.jax_debug_nans is True
        assert jax.config.jax_enable_checks is True
    assert jax.config.jax_debug_nans == before


def test_debug_mode_catches_nan():
    import pytest

    with debug_mode():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0)).block_until_ready()


def test_trace_writes_profile(tmp_path):
    with trace(str(tmp_path)):
        jax.jit(lambda x: x * 2)(jnp.ones((8, 8))).block_until_ready()
    files = list(pathlib.Path(tmp_path, "profile").rglob("*"))
    assert files, "no profile artifacts written"
