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


# ---------------------------------------------------------------------------
# shard_map'd Pallas attention path (spatial>1 + backend=pallas).
#
# GSPMD cannot auto-partition a Pallas call over a row-sharded operand, so
# on spatial meshes the kernel path goes through an explicit fully-manual
# shard_map (gathered keys, local query rows, row reduce-scatter —
# ops/contextual_attention.py _spatial_attention). The Pallas kernel itself
# cannot execute on CPU (TPU-interpret mode's io_callback deadlocks under
# manual shard_map), so these tests validate the shard_map MACHINERY with
# the XLA inner kernel — the Pallas/XLA inner equivalence is already pinned
# in tests/kernels/test_patch_attention.py, and the compiled shard_map+
# Mosaic lowering is exercised on real TPU by tools/probe_spatial_pallas.py.
# ---------------------------------------------------------------------------

import importlib

import jax.numpy as jnp
import pytest

# the ops package re-exports the contextual_attention FUNCTION under the
# submodule's name, so attribute-style module import resolves to it —
# importlib gets the module itself
_ca_mod = importlib.import_module(
    "gan_inpainting_tpu.ops.contextual_attention")
_pa_mod = importlib.import_module(
    "gan_inpainting_tpu.ops.pallas.patch_attention")


def _attn_case(seed=0, shape=(2, 32, 24, 8)):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    mask = jnp.asarray(
        (rng.random(shape[:3] + (1,)) < 0.3).astype(np.float32))
    return f, mask


@pytest.mark.parametrize("axes", [(1, 1, 8), (2, 1, 4), (2, 2, 2)])
def test_spatial_shardmap_attention_parity(eight_devices, axes):
    """_spatial_attention (XLA inner) is bit-exact vs the 1-device dense
    path on pure-spatial, mixed data, and mixed data+model meshes — the
    gather/local-Q/fold/reduce-scatter structure changes nothing."""
    f, mask = _attn_case()
    ref = _ca_mod.contextual_attention(f, f, mask, ksize=3, rate=2,
                                       backend="xla")
    mesh = build_mesh(MeshConfig(data=axes[0], model=axes[1],
                                 spatial=axes[2]), devices=eight_devices)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda f, m: _ca_mod._spatial_attention(
            f, f, m, ksize=3, rate=2, softmax_scale=10.0,
            backend="xla", n_sp=axes[2]))(f, mask)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_spatial_dispatch_engages_shardmap(eight_devices, monkeypatch):
    """contextual_attention(backend='pallas') on a spatial mesh routes
    through the shard_map path and calls the kernel with LOCAL query rows
    and GLOBAL keys (kernel stood in by the XLA reference on CPU)."""
    f, mask = _attn_case()
    calls = []

    def standin(q, k, key_valid, v, *, softmax_scale, **kw):
        calls.append((q.shape, k.shape))
        return _ca_mod._patch_attention_xla(q, k, key_valid, v,
                                            softmax_scale)

    monkeypatch.setattr(_pa_mod, "patch_attention_pallas", standin)
    ref = _ca_mod.contextual_attention(f, f, mask, ksize=3, rate=2,
                                       backend="xla")
    mesh = build_mesh(MeshConfig(data=1, model=1, spatial=8),
                      devices=eight_devices)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda f, m: _ca_mod.contextual_attention(
            f, f, m, ksize=3, rate=2, backend="pallas"))(f, mask)
    assert np.array_equal(np.asarray(out), np.asarray(ref))
    assert calls, "shard_map path did not engage the kernel"
    (qs, ks) = calls[0]
    lk = (32 // 2) * (24 // 2)
    assert ks[1] == lk               # keys are global
    assert qs[1] == lk // 8          # queries are the local row block


def test_spatial_dispatch_fallback_indivisible(eight_devices, monkeypatch):
    """Shapes whose query-row grid does not divide the spatial axis fall
    back to the GSPMD XLA dense path (still correct, never the kernel)."""
    f, mask = _attn_case(shape=(2, 36, 24, 8))  # hs=18, 18 % 8 != 0
    called = []
    monkeypatch.setattr(
        _pa_mod, "patch_attention_pallas",
        lambda *a, **k: called.append(1) or (_ for _ in ()).throw(
            AssertionError("kernel must not be called")))
    ref = _ca_mod.contextual_attention(f, f, mask, ksize=3, rate=2,
                                       backend="xla")
    mesh = build_mesh(MeshConfig(data=1, model=1, spatial=8),
                      devices=eight_devices)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda f, m: _ca_mod.contextual_attention(
            f, f, m, ksize=3, rate=2, backend="pallas"))(f, mask)
    assert not called
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_spatial_shardmap_attention_grad(eight_devices):
    """Gradients flow through the shard_map path (all_gather/psum_scatter
    transposes) and match the 1-device dense path — the property the train
    step relies on when spatial>1 meshes train with the kernel backend."""
    f, mask = _attn_case(shape=(1, 16, 16, 4))

    def loss_ref(x):
        y = _ca_mod.contextual_attention(x, x, mask, ksize=3, rate=2,
                                         backend="xla")
        return jnp.sum(y * y)

    g_ref = jax.grad(loss_ref)(f)

    mesh = build_mesh(MeshConfig(data=1, model=1, spatial=8),
                      devices=eight_devices)

    def loss_sp(x):
        y = _ca_mod._spatial_attention(x, x, mask, ksize=3, rate=2,
                                       softmax_scale=10.0, backend="xla",
                                       n_sp=8)
        return jnp.sum(y * y)

    with jax.set_mesh(mesh):
        g_sp = jax.jit(jax.grad(loss_sp))(f)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-6)


def test_spatial_serve_shardmap_generator(tiny_config, eight_devices,
                                          monkeypatch):
    """Full Inpainter serve on a spatial mesh with the TPU dispatch table
    (attention→pallas via monkeypatched device kind, convs stay XLA): the
    shard_map attention embeds in the whole bucketed serve program and
    reproduces the 1-device output. Known pixels stay bit-exact."""
    from gan_inpainting_tpu.ops import dispatch as _dispatch

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
    out1 = _serve(cfg, mesh1, state, imgs, masks)

    monkeypatch.setattr(_dispatch, "_default_device_kind", lambda: "tpu")
    monkeypatch.setattr(
        _pa_mod, "patch_attention_pallas",
        lambda q, k, key_valid, v, *, softmax_scale, **kw:
        _ca_mod._patch_attention_xla(q, k, key_valid, v, softmax_scale))
    sp8 = build_mesh(MeshConfig(data=1, model=1, spatial=8),
                     devices=eight_devices)
    out8 = _serve(cfg, sp8, state, imgs, masks)
    # f32 end to end; the only reassociation is the boundary-row
    # reduce-scatter, which cannot move a uint8 by more than 1
    diff = np.abs(out1.astype(np.int16) - out8.astype(np.int16))
    assert diff.max() <= 1
    assert np.array_equal(out8[masks == 0], imgs[masks == 0])
