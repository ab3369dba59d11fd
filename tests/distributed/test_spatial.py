"""Spatial partitioning (the mesh's third axis): image/activation rows
sharded over devices, conv halos exchanged by GSPMD.

Data parallelism cannot split a single large request — a batch-1 2048²
inpaint is one shard no matter how many chips the mesh has. Row sharding
splits *within* the image: every activation (and the dense attention score
matrix, the single biggest allocation at high resolution) lives 1/spatial
per device. These tests pin the property that makes that safe to deploy:
the row-sharded program computes the SAME math as one device — bit-exact
for f32 serving, within reduction-order tolerance for training.

Sibling of tests/distributed/test_mesh_parity.py (data/model axes).
"""

import jax
import numpy as np

from gan_inpainting_tpu.configs.base import apply_overrides
from gan_inpainting_tpu.data.pipeline import make_train_batch
from gan_inpainting_tpu.data.synthetic import synthetic_batch_u8
from gan_inpainting_tpu.infer.inpaint import Inpainter
from gan_inpainting_tpu.parallel.mesh import MeshConfig, build_mesh
from gan_inpainting_tpu.parallel.sharding import replicated, shard_batch
from gan_inpainting_tpu.train.state import create_state
from gan_inpainting_tpu.train.step import make_train_step


def _serve(cfg, mesh, state, imgs, masks):
    inp = Inpainter(cfg, state.g_params, mesh=mesh)
    with jax.set_mesh(mesh):
        return inp.inpaint_batch(imgs, masks)


def _request(batch, size, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    masks = np.zeros((batch, size, size), np.float32)
    q = size // 4
    masks[:, q:3 * q, q:3 * q] = 1.0
    return imgs, masks


def test_spatial_serve_parity_dilated(tiny_config, eight_devices):
    """Pure spatial mesh (1,1,8), dilated generator: f32 uint8 output is
    bit-exact vs 1 device — halo-exchange convs (dilations 2..16 included)
    change nothing."""
    cfg = apply_overrides(tiny_config, ["infer.batch_buckets=2",
                                        "infer.size_buckets=32"])
    state = create_state(cfg, jax.random.key(0))
    imgs, masks = _request(2, 32)

    mesh1 = build_mesh(MeshConfig(data=1, model=1),
                       devices=eight_devices[:1])
    sp8 = build_mesh(MeshConfig(data=1, model=1, spatial=8),
                     devices=eight_devices)
    out1 = _serve(cfg, mesh1, state, imgs, masks)
    out8 = _serve(cfg, sp8, state, imgs, masks)
    assert np.array_equal(out1, out8)
    # composite property survives the resharding
    assert np.array_equal(out8[masks == 0], imgs[masks == 0])


def test_spatial_serve_parity_attention(tiny_config, eight_devices):
    """Mixed (data=2, spatial=4) mesh on the coarse-to-fine generator:
    contextual attention is a GLOBAL op — every query row attends to key
    patches from every shard — and the row-sharded program must still
    reproduce one device bit-exactly in f32."""
    cfg = apply_overrides(tiny_config, [
        "model.generator=coarse_to_fine",
        "model.conv_kind=gated",
        "model.use_attention=true",
        "infer.batch_buckets=2",
        "infer.size_buckets=32",
    ])
    state = create_state(cfg, jax.random.key(0))
    imgs, masks = _request(2, 32)

    mesh1 = build_mesh(MeshConfig(data=1, model=1),
                       devices=eight_devices[:1])
    mixed = build_mesh(MeshConfig(data=2, model=1, spatial=4),
                       devices=eight_devices)
    out1 = _serve(cfg, mesh1, state, imgs, masks)
    outm = _serve(cfg, mixed, state, imgs, masks)
    assert np.array_equal(out1, outm)


def test_spatial_serve_nonsquare(tiny_config, eight_devices):
    """Non-square request through bucketing+padding on a spatial mesh."""
    cfg = apply_overrides(tiny_config, ["infer.batch_buckets=2",
                                        "infer.size_buckets=32"])
    state = create_state(cfg, jax.random.key(0))
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (2, 24, 32, 3), dtype=np.uint8)
    masks = np.zeros((2, 24, 32), np.float32)
    masks[:, 6:18, 8:24] = 1.0

    mesh1 = build_mesh(MeshConfig(data=1, model=1),
                       devices=eight_devices[:1])
    sp8 = build_mesh(MeshConfig(data=1, model=1, spatial=8),
                     devices=eight_devices)
    out1 = _serve(cfg, mesh1, state, imgs, masks)
    out8 = _serve(cfg, sp8, state, imgs, masks)
    assert out8.shape == (2, 24, 32, 3)
    assert np.array_equal(out1, out8)


def test_spatial_train_step_parity(tiny_config, eight_devices):
    """The FULL train step (G+D, SN, adversarial + reconstruction losses)
    under a (data=2, spatial=4) mesh reproduces the 1-device math: batch
    rows are sharded over 'spatial' by shard_batch, gradients reduce over
    both axes."""
    cfg = apply_overrides(tiny_config, ["data.batch_size=4"])
    state = create_state(cfg, jax.random.key(0))
    imgs = synthetic_batch_u8(jax.random.key(1), 4, 32)
    batch = make_train_batch(imgs, jax.random.key(2), cfg.mask)

    def run_on(mesh, n=2):
        st = jax.device_put(state, replicated(mesh))
        step = make_train_step(cfg, donate=False)
        with jax.set_mesh(mesh):
            for i in range(n):
                st, metrics = step(st, shard_batch(mesh, batch),
                                   jax.random.key(3 + i))
        return jax.device_get(st), jax.device_get(metrics)

    mesh1 = build_mesh(MeshConfig(data=1, model=1),
                       devices=eight_devices[:1])
    sp = build_mesh(MeshConfig(data=2, model=1, spatial=4),
                    devices=eight_devices)
    s1, m1 = run_on(mesh1)
    ssp, msp = run_on(sp)

    np.testing.assert_allclose(m1["g_loss"], msp["g_loss"], rtol=5e-4)
    np.testing.assert_allclose(m1["d_loss"], msp["d_loss"], rtol=5e-4)
    for a, b in zip(jax.tree.leaves(s1.g_params),
                    jax.tree.leaves(ssp.g_params)):
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_spatial_shard_batch_specs(tiny_config, eight_devices):
    """shard_batch row-shards only NHWC arrays whose H divides the spatial
    axis; everything else keeps the plain data-sharded layout."""
    sp = build_mesh(MeshConfig(data=2, model=1, spatial=4),
                    devices=eight_devices)
    tree = {
        "img": np.zeros((4, 32, 32, 3), np.float32),
        "odd_h": np.zeros((4, 30, 32, 3), np.float32),  # 30 % 4 != 0
        "vec": np.zeros((4, 7), np.float32),
        "scalar": np.float32(1.0),
    }
    out = shard_batch(sp, tree)
    spec = out["img"].sharding.spec
    assert tuple(spec) == ("data", "spatial", None, None)
    assert tuple(out["odd_h"].sharding.spec) == ("data", None, None, None)
    assert tuple(out["vec"].sharding.spec) == ("data", None)
    assert out["scalar"].sharding.spec == ()
