"""Layer-level semantics: spectral norm formulation (ADVICE.md r1)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_inpainting_tpu.models.layers import SNConv


def _setup():
    module = SNConv(features=8, kernel_size=3, stride=1, use_sn=True,
                    compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 4), jnp.float32)
    variables = module.init(jax.random.key(1), x)
    return module, variables, x


def test_sn_scale_invariance_gradient():
    """With differentiable sigma (Miyato), W/sigma(W) is exactly invariant to
    kernel rescaling, so the directional derivative of any loss along the
    kernel itself must be 0. stop_gradient(sigma) (the r1 bug) breaks this."""
    module, variables, x = _setup()
    cotangent = jax.random.normal(jax.random.key(2), (1, 8, 8, 8))

    def loss(params):
        # zero the bias contribution so the loss sees only W/sigma
        params = jax.tree.map(lambda p: p, params)
        y = module.apply({"params": params,
                          "spectral": variables["spectral"]}, x)
        b = params["bias"]
        y = y - b  # remove additive bias term
        return jnp.sum(y * cotangent)

    params = variables["params"]
    g = jax.grad(loss)(params)
    # <dL/dW, W> == t * dL/dt of L(t*W) at t=1 == 0 by scale invariance
    inner = float(jnp.sum(g["kernel"] * params["kernel"]))
    scale = float(jnp.sum(jnp.abs(g["kernel"])
                          * jnp.abs(params["kernel"]))) + 1e-12
    assert abs(inner) / scale < 1e-5, (
        f"SN gradient not scale-invariant: <g,W>/|g||W| = {inner/scale}")


def test_sn_normalized_kernel_unit_sigma():
    """After division the power-iteration sigma estimate of W/sigma is ~1."""
    module, variables, x = _setup()
    params = variables["params"]
    w = np.asarray(params["kernel"], np.float64).reshape(-1, 8)
    # converge power iteration on the raw kernel
    u = np.ones(8)
    for _ in range(50):
        v = w @ u
        v /= np.linalg.norm(v)
        u = w.T @ v
        u /= np.linalg.norm(u)
    sigma = float(v @ w @ u)
    top_sv = np.linalg.svd(w, compute_uv=False)[0]
    np.testing.assert_allclose(sigma, top_sv, rtol=1e-6)
