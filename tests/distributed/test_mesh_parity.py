"""Sharded-vs-single-device parity on the virtual 8-CPU mesh
(SURVEY.md §4 "distributed-without-a-cluster")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_inpainting_tpu.configs.base import apply_overrides
from gan_inpainting_tpu.data.pipeline import make_train_batch
from gan_inpainting_tpu.data.synthetic import synthetic_batch_u8
from gan_inpainting_tpu.parallel.mesh import MeshConfig, build_mesh
from gan_inpainting_tpu.parallel.sharding import replicated, shard_batch
from gan_inpainting_tpu.train.state import create_state
from gan_inpainting_tpu.train.step import make_train_step


def _batch(cfg, seed):
    imgs = synthetic_batch_u8(jax.random.key(seed), cfg.data.batch_size,
                              cfg.data.image_size)
    return make_train_batch(imgs, jax.random.key(seed + 100), cfg.mask)


def _run_steps(cfg, mesh, n=2):
    state = create_state(cfg, jax.random.key(0))
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(cfg, donate=False)
    with jax.set_mesh(mesh):
        for i in range(n):
            batch = shard_batch(mesh, _batch(cfg, i))
            state, metrics = step(state, batch, jax.random.key(i))
    return jax.device_get(state), jax.device_get(metrics)


def test_mesh_construction(eight_devices):
    mesh = build_mesh(MeshConfig(data=-1, model=2), devices=eight_devices)
    assert mesh.devices.shape == (4, 2, 1)
    assert mesh.axis_names == ("data", "model", "spatial")
    # smaller-than-available explicit mesh takes a device prefix
    small = build_mesh(MeshConfig(data=3, model=2), devices=eight_devices)
    assert small.devices.shape == (3, 2, 1)
    # the spatial axis participates in the device-count budget
    sp = build_mesh(MeshConfig(data=-1, model=2, spatial=2),
                    devices=eight_devices)
    assert sp.devices.shape == (2, 2, 2)
    with pytest.raises(ValueError):
        build_mesh(MeshConfig(data=5, model=2), devices=eight_devices)
    with pytest.raises(ValueError):  # -1 with non-dividing model
        build_mesh(MeshConfig(data=-1, model=3), devices=eight_devices)
    with pytest.raises(ValueError):  # -1 with non-dividing model*spatial
        build_mesh(MeshConfig(data=-1, model=2, spatial=3),
                   devices=eight_devices)


def test_data_parallel_matches_single_device(tiny_config, eight_devices):
    cfg = apply_overrides(tiny_config, ["data.batch_size=8"])
    mesh1 = build_mesh(MeshConfig(data=1, model=1),
                       devices=eight_devices[:1])
    mesh8 = build_mesh(MeshConfig(data=8, model=1), devices=eight_devices)

    s1, m1 = _run_steps(cfg, mesh1)
    s8, m8 = _run_steps(cfg, mesh8)

    np.testing.assert_allclose(m1["g_loss"], m8["g_loss"], rtol=2e-4)
    np.testing.assert_allclose(m1["d_loss"], m8["d_loss"], rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s1.g_params),
                    jax.tree.leaves(s8.g_params)):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_model_axis_train_step_runs(tiny_config, eight_devices):
    """TP seam: the step compiles and runs on a (4, 2) mesh."""
    cfg = apply_overrides(tiny_config, ["data.batch_size=8"])
    mesh = build_mesh(MeshConfig(data=4, model=2), devices=eight_devices)
    state, metrics = _run_steps(cfg, mesh, n=1)
    for v in metrics.values():
        assert np.isfinite(v)


def test_sharded_inference_parity(tiny_config, eight_devices):
    from gan_inpainting_tpu.infer.inpaint import Inpainter

    cfg = apply_overrides(tiny_config, ["infer.batch_buckets=8",
                                        "infer.size_buckets=32"])
    state = create_state(cfg, jax.random.key(0))
    mesh1 = build_mesh(MeshConfig(data=1, model=1),
                       devices=eight_devices[:1])
    mesh8 = build_mesh(MeshConfig(data=8, model=1), devices=eight_devices)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    masks = np.zeros((8, 32, 32), np.float32)
    masks[:, 8:24, 8:24] = 1.0

    out1 = Inpainter(cfg, state.g_params, mesh=mesh1).inpaint_batch(
        imgs, masks)
    out8 = Inpainter(cfg, state.g_params, mesh=mesh8).inpaint_batch(
        imgs, masks)
    # uint8 outputs: allow off-by-one from reduction-order differences
    assert np.abs(out1.astype(int) - out8.astype(int)).max() <= 1


def test_tensor_parallel_channel_sharding_parity(tiny_config, eight_devices):
    """Real TP: channel shardings over the model axis preserve the math."""
    cfg = apply_overrides(tiny_config, ["data.batch_size=8",
                                        "model.tp_shard=true"])
    mesh1 = build_mesh(MeshConfig(data=1, model=1),
                       devices=eight_devices[:1])
    mesh42 = build_mesh(MeshConfig(data=4, model=2), devices=eight_devices)

    s1, m1 = _run_steps(cfg, mesh1, n=2)
    s42, m42 = _run_steps(cfg, mesh42, n=2)

    np.testing.assert_allclose(m1["g_loss"], m42["g_loss"], rtol=5e-4)
    np.testing.assert_allclose(m1["d_loss"], m42["d_loss"], rtol=5e-4)
    for a, b in zip(jax.tree.leaves(s1.g_params),
                    jax.tree.leaves(s42.g_params)):
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_grad_accum_sharded_matches_full_batch(tiny_config, eight_devices):
    """grad_accum under SPMD: the (accum, batch/accum) reshape keeps the
    micro-batch dim sharded over the data axis and still reproduces the
    full-batch step."""
    cfg = apply_overrides(tiny_config, ["data.batch_size=16"])
    cfg_acc = apply_overrides(cfg, ["train.grad_accum=2"])
    mesh8 = build_mesh(MeshConfig(data=8, model=1), devices=eight_devices)

    s_full, m_full = _run_steps(cfg, mesh8, n=2)
    s_acc, m_acc = _run_steps(cfg_acc, mesh8, n=2)

    np.testing.assert_allclose(m_full["g_loss"], m_acc["g_loss"], rtol=2e-4)
    np.testing.assert_allclose(m_full["d_loss"], m_acc["d_loss"], rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s_full.g_params),
                    jax.tree.leaves(s_acc.g_params)):
        np.testing.assert_allclose(a, b, atol=2e-4)
