"""Multi-host seam (SURVEY.md §2b DCN tier; VERDICT r1 missing #5).

True multi-process runs need a pod; these tests pin the single-process
identity path and the process-slicing contracts that a pod run relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_inpainting_tpu.parallel.mesh import MeshConfig, build_mesh
from gan_inpainting_tpu.parallel.multihost import (
    ensure_initialized,
    process_batch_slice,
    shard_host_batch,
)
from gan_inpainting_tpu.parallel.sharding import shard_batch


def test_ensure_initialized_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert ensure_initialized(verbose=False) == 1
    assert jax.process_count() == 1


def test_process_batch_slice_identity():
    bs, offset = process_batch_slice(32)
    assert bs == 32 and offset == 0


def test_process_batch_slice_divisibility():
    # indivisible global batch must fail loudly (not silently truncate)
    if jax.process_count() == 1:
        assert process_batch_slice(7) == (7, 0)  # 7 % 1 == 0


def test_shard_host_batch_matches_shard_batch():
    mesh = build_mesh(MeshConfig(data=4, model=2))
    tree = {"x": np.arange(32, dtype=np.float32).reshape(8, 4),
            "s": np.float32(3.0)}
    a = shard_host_batch(mesh, tree)
    b = shard_batch(mesh, tree)
    np.testing.assert_array_equal(np.asarray(a["x"]), np.asarray(b["x"]))
    assert a["x"].sharding == b["x"].sharding
    assert float(a["s"]) == 3.0


def test_train_loop_multihost_seams_run():
    """The n_proc>1 branches can't execute here, but the loop must still run
    end to end through the multihost-wired path with one process."""
    from gan_inpainting_tpu.configs.base import apply_overrides, get_config
    from gan_inpainting_tpu.train.loop import train

    cfg = apply_overrides(get_config("celeba128_center"), [
        "data.image_size=16", "data.batch_size=4", "data.eval_batch_size=4",
        "data.num_eval_batches=1", "model.base_features=8",
        "model.disc_features=8", "model.disc_layers=2",
        "train.steps=2", "train.log_every=1", "train.eval_every=2",
        "train.checkpoint_every=1000", "train.workdir=/tmp/mh_seam_test",
        "train.mesh.data=2", "train.mesh.model=1",
    ])
    state, metrics = train(cfg, resume=False, verbose=False)
    assert int(state.step) == 2
    assert all(np.isfinite(float(v)) for v in metrics.values())
