"""Probe: compiled shard_map + Mosaic attention on real TPU.

The spatial>1 + backend=pallas path (ops/contextual_attention.py
_spatial_attention) wraps the flash patch-attention kernel in a fully
manual shard_map. Its cross-device structure (gathered keys, local query
rows, row reduce-scatter) is pinned bit-exact on the 8-virtual-device CPU
harness with the XLA inner kernel (tests/distributed/test_spatial.py) —
but CPU cannot execute the Pallas kernel inside a manual shard_map
(TPU-interpret mode's io_callback deadlocks there), and this box has ONE
real chip, so an n>1 spatial mesh cannot run on silicon.

This probe closes the remaining seam on real hardware: a (1,1,1) fully
manual mesh compiles and runs the EXACT program structure — shard_map →
all_gather → Mosaic kernel → psum_scatter (collectives degenerate to
copies) — and must match both the non-spatial Pallas path and the XLA
dense path. If Mosaic-under-manual-shard_map ever regresses in a
toolchain bump, this catches it in seconds.

Run on the TPU (foreground, nothing else touching the chip):
    python tools/probe_spatial_pallas.py
"""

from __future__ import annotations

import importlib

import jax
import jax.numpy as jnp
import numpy as np

ca = importlib.import_module("gan_inpainting_tpu.ops.contextual_attention")


def main() -> None:
    from gan_inpainting_tpu.parallel.mesh import MeshConfig, build_mesh

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}")

    rng = np.random.default_rng(0)
    shape = (2, 64, 64, 32)
    f = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    mask = jnp.asarray(
        (rng.random(shape[:3] + (1,)) < 0.3).astype(np.float32))

    ref_xla = ca.contextual_attention(f, f, mask, ksize=3, rate=2,
                                      backend="xla")

    # the split (non-fused) kernel pipeline the shard_map path uses,
    # without shard_map — the bit-exactness reference
    pa = importlib.import_module(
        "gan_inpainting_tpu.ops.pallas.patch_attention")

    @jax.jit
    def split_pallas(f, mask):
        q, k, key_valid, v, (hs, ws) = ca._attention_inputs(
            f, f, mask, 3, 2)
        yp = pa.patch_attention_pallas(q, k, key_valid, v,
                                       softmax_scale=10.0)
        yp = yp.reshape(f.shape[0], hs, ws, 4, 4, f.shape[-1])
        from gan_inpainting_tpu.ops.patches import fold_patches
        y, cnt = fold_patches(yp, 2, f.shape[1:3], "same")
        return (y / jnp.maximum(cnt, 1.0)).astype(f.dtype)

    ref_pal = split_pallas(f, mask)

    mesh = build_mesh(MeshConfig(data=1, model=1, spatial=1),
                      devices=[dev])
    with jax.set_mesh(mesh):
        out = jax.jit(lambda f, m: ca._spatial_attention(
            f, f, m, ksize=3, rate=2, softmax_scale=10.0,
            backend="pallas", n_sp=1))(f, mask)
        out.block_until_ready()

    d_pal = float(jnp.max(jnp.abs(out - ref_pal)))
    d_xla = float(jnp.max(jnp.abs(out - ref_xla)))
    print(f"max|shard_map - pallas| = {d_pal:.3e}")
    print(f"max|shard_map - xla|    = {d_xla:.3e}")
    assert d_pal == 0.0, "shard_map'd kernel must equal the plain kernel"
    assert d_xla < 1e-4, "kernel vs dense beyond kernel tolerance"
    print("OK: Mosaic kernel inside fully-manual shard_map compiles and "
          "matches on this chip")


if __name__ == "__main__":
    main()
