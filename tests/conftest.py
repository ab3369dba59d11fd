"""Test harness config.

The whole suite runs on CPU with 8 virtual devices — the JAX idiom for
testing multi-chip sharding without a cluster (SURVEY.md §4
"distributed-without-a-cluster"). Pallas kernels run in interpreter mode on
CPU; compiled-kernel runs happen on real TPU via the benchmark entry points.

Env vars must be set before jax initializes, hence the top-of-conftest
placement.
"""

import os

# NOTE: this box's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon (remote TPU tunnel), so plain env mutation here is too
# late — jax.config has already cached the platform. jax.config.update is
# the reliable override; XLA_FLAGS still works because backends initialize
# lazily (on first device use, after conftest runs).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return devices[:8]


@pytest.fixture()
def tiny_config():
    from gan_inpainting_tpu.configs.base import apply_overrides, get_config

    cfg = get_config("celeba128_center")
    return apply_overrides(cfg, [
        "data.image_size=32",
        "data.batch_size=4",
        "data.eval_batch_size=4",
        "data.num_eval_batches=1",
        "model.base_features=8",
        "model.disc_features=8",
        "model.disc_layers=2",
        "model.dtype_policy=f32",
        "train.steps=2",
        "train.log_every=1",
        "train.eval_every=1000",
        "train.checkpoint_every=1000",
    ])
