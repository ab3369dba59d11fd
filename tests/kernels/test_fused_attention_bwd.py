"""In-kernel fused-attention backward vs the XLA oracle (interpreter mode).

The oracle is the full differentiable XLA composition in
ops/contextual_attention.py (patch front-end + dense attention + fold) —
the same oracle the forward kernels are gated against (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import gan_inpainting_tpu.ops.pallas.fused_attention as fa
import gan_inpainting_tpu.ops.pallas.fused_attention_bwd as fab
from gan_inpainting_tpu.ops.contextual_attention import contextual_attention


def _case(seed, b, h, w, c):
    f = jax.random.normal(jax.random.key(seed), (b, h, w, c), jnp.float32)
    hole = (jax.random.uniform(jax.random.key(seed + 1), (b, h, w, 1))
            > 0.6).astype(jnp.float32)
    return f, hole


def _grads(f, hole, backend):
    def loss(f_):
        return jnp.sum(jnp.sin(contextual_attention(f_, f_, hole,
                                                    backend=backend)))
    return jax.grad(loss)(f)


def test_inkernel_bwd_is_active():
    # the shape every bwd test uses must actually take the in-kernel path
    assert fab.fused_bwd_enabled()
    assert fab.bwd_plan(32, 32, 8, 2) is not None
    # …and so must the 512² flagship train shape (128² feats, c = 4f = 192)
    assert fab.bwd_plan(64, 64, 192, 2) is not None
    # and the 256² train shape (64² feats)
    assert fab.bwd_plan(32, 32, 192, 2) is not None


def test_bwd_matches_oracle():
    f, hole = _case(0, 2, 64, 64, 8)
    g_ref = _grads(f, hole, "xla")
    with pltpu.force_tpu_interpret_mode():
        g_fused = _grads(f, hole, "pallas")
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-4)


def test_bwd_all_hole_rows():
    # house pattern: every key invalid → output and gradient exactly zero
    f, _ = _case(2, 1, 64, 64, 8)
    hole = jnp.ones((1, 64, 64, 1), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        g_fused = _grads(f, hole, "pallas")
    np.testing.assert_allclose(np.asarray(g_fused), 0.0, atol=1e-6)


def test_bwd_flash_regime_matches_oracle():
    # c=128 at 32² cells: bwd_plan picks kr < hs (nk > 1), exercising the
    # flash-style accumulation and the delta output→input chain
    f, hole = _case(4, 1, 64, 64, 128)
    qr, kr = fab.bwd_plan(32, 32, 128, 2)
    assert kr < 32, "expected the multi-key-step regime for this shape"
    g_ref = _grads(f, hole, "xla")
    with pltpu.force_tpu_interpret_mode():
        g_fused = _grads(f, hole, "pallas")
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_bwd_env_disable_falls_back(monkeypatch):
    # kill-switch: materialized backward still matches the oracle
    f, hole = _case(6, 1, 64, 64, 8)
    monkeypatch.setenv("INPAINT_FUSED_BWD", "0")
    assert not fab.fused_bwd_enabled()
    g_ref = _grads(f, hole, "xla")
    with pltpu.force_tpu_interpret_mode():
        g_fused = _grads(f, hole, "pallas")
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-4)


def test_merge_row_blocks_roundtrip():
    # overlap-add of halo row blocks == scatter-add reference
    rng = np.random.default_rng(0)
    n, step, w2, c = 4, 3, 6, 2
    blocks = rng.normal(size=(1, n, step + 2, w2, c)).astype(np.float32)
    want = np.zeros((1, n * step + 2, w2, c), np.float32)
    for i in range(n):
        want[:, i * step:i * step + step + 2] += blocks[:, i]
    got = fab._merge_row_blocks(jnp.asarray(blocks))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_bwd_plan_rejects_oversize(monkeypatch):
    monkeypatch.setattr(fa, "_VMEM_BUDGET_BYTES", 1024)
    assert fab.bwd_plan(32, 32, 8, 2) is None
