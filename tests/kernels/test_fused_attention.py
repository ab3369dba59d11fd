"""Fully-fused contextual attention kernel vs the materialized XLA oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gan_inpainting_tpu.ops.contextual_attention import (
    contextual_attention,
    _attention_inputs,
    _patch_attention_xla,
)
from gan_inpainting_tpu.ops.pallas.fused_attention import (
    fused_patch_attention,
    fused_supported,
)


def _case(seed, b, h, w, c, rate=2):
    f = jax.random.normal(jax.random.key(seed), (b, h, w, c), jnp.float32)
    hole = (jax.random.uniform(jax.random.key(seed + 1), (b, h, w, 1))
            > 0.6).astype(jnp.float32)
    return f, hole


def test_fused_supported_logic():
    assert fused_supported((1, 64, 64, 8), 3, 2)      # ws=32, qr=4, hs=32
    assert not fused_supported((1, 16, 16, 8), 3, 2)  # qr=16 > hs=8
    assert not fused_supported((1, 63, 64, 8), 3, 2)  # not divisible
    assert not fused_supported((1, 64, 64, 8), 5, 2)  # ksize != 3


def test_fused_patch_output_matches_oracle():
    f, hole = _case(0, 1, 64, 64, 8)
    q, k, valid, v, _ = _attention_inputs(f, f, hole, 3, 2)
    expected = _patch_attention_xla(q, k, valid, v, 10.0)
    with pltpu.force_tpu_interpret_mode():
        got = fused_patch_attention(f, hole, ksize=3, rate=2,
                                    softmax_scale=10.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_fused_end_to_end_matches_xla_backend():
    f, hole = _case(2, 2, 64, 64, 8)
    expected = contextual_attention(f, f, hole, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        got = contextual_attention(f, f, hole, backend="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_fused_gradients_match_xla():
    f, hole = _case(4, 1, 64, 64, 8)

    def loss_xla(f_):
        return jnp.sum(jnp.sin(contextual_attention(f_, f_, hole,
                                                    backend="xla")))

    def loss_fused(f_):
        return jnp.sum(jnp.sin(contextual_attention(f_, f_, hole,
                                                    backend="pallas")))

    g_ref = jax.grad(loss_xla)(f)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused)(f)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-4)


def test_fused_all_hole_gives_zeros():
    f, _ = _case(6, 1, 64, 64, 8)
    hole = jnp.ones((1, 64, 64, 1), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = fused_patch_attention(f, hole)
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)


def test_resident1_matches_oracle(monkeypatch):
    """Force the single-buffered residency path (maps exceed the
    double-buffered VMEM budget)."""
    import gan_inpainting_tpu.ops.pallas.fused_attention as fa

    f, hole = _case(8, 1, 64, 64, 8)
    q, k, valid, v, _ = _attention_inputs(f, f, hole, 3, 2)
    expected = _patch_attention_xla(q, k, valid, v, 10.0)

    # shrink the budget so double-buffered residency (541 KB at this
    # shape) doesn't fit but single-buffered kr=4 (467 KB) does
    monkeypatch.setattr(fa, "_VMEM_BUDGET_BYTES", 512 * 1024)
    monkeypatch.setattr(fa, "_RESIDENT1_ENABLED", True)
    assert fa.fused_supported(f.shape, 3, 2)
    assert fa._plan(32, 32, 8, 2)[0] == "resident1"
    with pltpu.force_tpu_interpret_mode():
        got = fa.fused_patch_attention(f, hole, ksize=3, rate=2,
                                       softmax_scale=10.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_resident1_all_hole(monkeypatch):
    import gan_inpainting_tpu.ops.pallas.fused_attention as fa

    f, _ = _case(9, 1, 64, 64, 8)
    hole = jnp.ones((1, 64, 64, 1), jnp.float32)
    monkeypatch.setattr(fa, "_VMEM_BUDGET_BYTES", 512 * 1024)
    monkeypatch.setattr(fa, "_RESIDENT1_ENABLED", True)
    assert fa._plan(32, 32, 8, 2)[0] == "resident1"
    with pltpu.force_tpu_interpret_mode():
        got = fa.fused_patch_attention(f, hole)
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)


def test_plan_raises_when_resident1_unavailable(monkeypatch):
    """_plan must fail loudly (not hand _fused_call a None kr or a disabled
    strategy) when the shape needs resident1 but it can't be used."""
    import gan_inpainting_tpu.ops.pallas.fused_attention as fa

    monkeypatch.setattr(fa, "_VMEM_BUDGET_BYTES", 512 * 1024)
    monkeypatch.setattr(fa, "_RESIDENT1_ENABLED", False)
    assert not fa.fused_supported((1, 64, 64, 8), 3, 2)
    with pytest.raises(ValueError, match="INPAINT_RESIDENT1"):
        fa._plan(32, 32, 8, 2)
    # blocks override takes the same gate
    with pytest.raises(ValueError, match="INPAINT_RESIDENT1"):
        fa._plan(32, 32, 8, 2, blocks=(4, 4))
    # enabled but nothing fits at an absurdly small budget
    monkeypatch.setattr(fa, "_RESIDENT1_ENABLED", True)
    monkeypatch.setattr(fa, "_VMEM_BUDGET_BYTES", 1024)
    with pytest.raises(ValueError, match="no key row-group"):
        fa._plan(32, 32, 8, 2)


def test_vmem_model_counts_singlek_scratch():
    """kr == hs routes to the single-K-pass kernel whose kp_scr scratch
    (ksize²·Lk·C·2B) must be in the budget model (ADVICE r2 #1)."""
    import gan_inpainting_tpu.ops.pallas.fused_attention as fa

    hs = ws = 32
    c = 128
    full = fa._fused_vmem_bytes(hs, ws, c, 2, 4, kr=hs)
    kp_scr = 9 * (hs * ws) * c * 2
    # removing the kp_scr term must drop the estimate by exactly its size
    # relative to a flash-regime estimate at the same blocks
    flash = fa._fused_vmem_bytes(hs, ws, c, 2, 4, kr=hs // 2)
    assert full - (fa._fused_vmem_bytes(hs, ws, c, 2, 4, kr=hs) - kp_scr) \
        == kp_scr
    assert full > 0 and flash > 0
